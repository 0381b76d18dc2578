"""Trainer.fit loop host/device overlap A/B on the attached chip.

train_scaling.py measures the bare jitted step (device + dispatch);
Trainer.fit additionally pays the host data path per step (synthetic
generation / decode, augmentation keys, preprocess upload, logging). Before
round 4 the loop read `int(state.step)` every iteration — a full device
sync that serialized all of that host work behind the device step. With
`train.dispatch_ahead` (default 2) the host runs ahead of the device and
the batch prep rides under the running step.

This measures end-to-end fit() throughput at dispatch_ahead 0 (the old
synchronous loop) vs 2, same config otherwise: adversarial step, B=64,
304^2 synthetic phantoms, remat='block:012', bf16 compute. Per setting it
takes the median img_per_s_wall of the post-compile log windows (the first
window contains the XLA compile and is dropped). Appends JSON lines to
benchmarks/fit_overlap.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(ahead: int, steps: int = 48, batch: int = 64) -> dict:
    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.config import Config

    cfg = Config()
    cfg.model.num_classes = 2
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_n = 256
    cfg.data.batch_size = batch
    cfg.data.image_size = [304, 304]
    cfg.data.augment = True
    cfg.train.steps = steps
    cfg.train.log_every = 12
    cfg.train.eval_every = 0
    cfg.train.remat = "block:012"
    cfg.train.compute_dtype = "bfloat16"
    cfg.train.dispatch_ahead = ahead
    with tempfile.TemporaryDirectory() as td:
        cfg.train.log_dir = td
        Trainer(cfg).fit()
        rows = []
        with open(os.path.join(td, "metrics.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                if "train/img_per_s_wall" in r:
                    rows.append(r["train/img_per_s_wall"])
    if len(rows) < 2:
        raise RuntimeError(f"expected >=2 log windows, got {len(rows)}")
    steady = rows[1:]  # window 1 contains the compile
    return {
        "dispatch_ahead": ahead, "batch": batch, "steps": steps,
        "img_per_s_windows": [round(v, 1) for v in rows],
        "img_per_s": round(statistics.median(steady), 1),
    }


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    # FO_AHEAD="2" reruns a single setting (each setting pays its own cold
    # relay compile, ~10-30 min; an outer timeout that SIGTERMs mid-setting
    # produces a graceful-preemption stop and a useless 0-window row)
    settings = tuple(int(a) for a in
                     os.environ.get("FO_AHEAD", "0,2").split(","))
    with open(os.path.join(here, "fit_overlap.json"), "a") as f:
        for ahead in settings:
            try:
                r = run(ahead)
            except Exception as e:
                r = {"dispatch_ahead": ahead, "error": type(e).__name__,
                     "detail": str(e)[:200]}
            print(json.dumps(r))
            f.write(json.dumps(r) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
