"""Train the flagship adversarial 304² checkpoint AND commit-grade evidence.

Produces, in one run on the attached TPU:
  * benchmarks/ckpt304            — orbax TrainState (local only, gitignored)
  * benchmarks/weights304-shard{i}-of-{n}.npz — compact bf16 serving weights, COMMITTED (sharded < 100 MB/file),
                                    so bench.py and any clean checkout serve
                                    the same trained configuration the
                                    accuracy artifacts validate (VERDICT r3
                                    item 1)
  * benchmarks/eval_curve.json    — dataset-level eval every 50 steps (the
                                    AUC-regression study, VERDICT r3 item 8)
                                    + the npz round-trip parity check

Config mirrors benchmarks/run_all.py phase 0 (304², batch 16, synthetic
phantoms, full adversarial pipeline, bf16 compute) with a longer horizon and
a denser eval cadence.
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(message)s")

HERE = os.path.dirname(os.path.abspath(__file__))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=50)
    args = ap.parse_args(argv)

    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.checkpoint import export_weights_npz, load_weights_npz
    from octave_tpu.utils.config import Config

    curve = []

    class RecordingTrainer(Trainer):
        def evaluate(self, state):
            m = super().evaluate(state)
            curve.append({"step": int(state.step),
                          **{k: round(float(v), 4) for k, v in m.items()}})
            return m

    cfg = Config.from_dict({
        "model": {"discriminator_depth": 4},
        "data": {"dataset": "synthetic", "image_size": (304, 304),
                 "batch_size": 16, "synthetic_n": 64},
        "train": {"steps": args.steps, "eval_every": args.eval_every,
                  "log_every": 50, "checkpoint_every": 200,
                  "checkpoint_dir": os.path.join(HERE, "ckpt304"),
                  "compute_dtype": "bfloat16"},
        "optim": {"decay_steps": args.steps},
    })
    trainer = RecordingTrainer(cfg)
    t0 = time.perf_counter()
    state = trainer.fit()
    train_s = time.perf_counter() - t0
    final = trainer.evaluate(state)
    if not curve or curve[-1]["step"] != int(state.step):
        curve.append({"step": int(state.step),
                      **{k: round(float(v), 4) for k, v in final.items()}})

    # ---- committed compact serving weights + round-trip parity ----------
    variables = {"params": state.seg_params, "batch_stats": state.batch_stats}
    npz = os.path.join(HERE, "weights304.npz")
    # sharded: each committed blob must stay under GitHub's 100 MB hard
    # per-file limit (the single-file export was 112 MB)
    export_weights_npz(npz, variables, max_bytes=90 * 10**6)
    m_npz = trainer.evaluate(state.replace(
        seg_params=load_weights_npz(npz)["params"],
        batch_stats=load_weights_npz(npz)["batch_stats"],
    ))

    out = {
        "config": "304x304 batch 16 adversarial (WPCE+ILD+LSGAN), bf16, "
                  "synthetic phantoms, scribble-only supervision",
        "steps": int(state.step),
        "train_wall_s": round(train_s, 1),
        "eval_curve": curve,
        "npz_export": {
            "path": "benchmarks/weights304-shard*-of-*.npz",
            "size_mb": round(sum(
                os.path.getsize(p)
                for p in glob.glob(os.path.join(HERE, "weights304*.npz"))
            ) / 1e6, 1),
            "fp32_eval": {k: round(float(v), 4) for k, v in final.items()},
            "bf16_npz_eval": {k: round(float(v), 4) for k, v in m_npz.items()},
            "dice_delta": round(float(m_npz["dice"]) - float(final["dice"]), 5),
        },
    }
    with open(os.path.join(HERE, "eval_curve.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
