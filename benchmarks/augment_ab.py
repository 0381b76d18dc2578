"""A/B: device-side D4+intensity augmentation on vs off (VERDICT r2 item
10 — the feature ships with a measured benefit or a recorded negative).

Trains the weak-supervision config twice on the synthetic vessel phantoms
(identical seeds/schedules, only `data.augment` differs) and reports
dataset-level eval Dice/AUC for each. Appends one JSON line to
benchmarks/augment_ab.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(augment: bool, steps: int, hw: int, intensity: float):
    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.config import Config

    cfg = Config.from_dict({
        "model": {"discriminator_depth": 0},
        "data": {"dataset": "synthetic", "image_size": (hw, hw),
                 "batch_size": 16, "synthetic_n": 64,
                 "augment": augment, "augment_intensity": intensity},
        "train": {"steps": steps, "eval_every": 0, "log_every": 100,
                  "compute_dtype": "bfloat16"},
        "optim": {"decay_steps": steps},
    })
    t = Trainer(cfg)
    t0 = time.perf_counter()
    state = t.fit()
    dt = time.perf_counter() - t0
    m = t.evaluate(state)
    return {k: round(float(v), 4) for k, v in m.items()} | {
        "train_s": round(dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--hw", type=int, default=304)
    ap.add_argument("--intensity", type=float, default=0.1)
    args = ap.parse_args()

    rec = {
        "steps": args.steps, "hw": args.hw, "intensity": args.intensity,
        "augment_off": run(False, args.steps, args.hw, args.intensity),
        "augment_on": run(True, args.steps, args.hw, args.intensity),
    }
    rec["dice_delta"] = round(
        rec["augment_on"]["dice"] - rec["augment_off"]["dice"], 4
    )
    print(json.dumps(rec))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "augment_ab.json"), "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
