"""Dice/AUC of the int8-decoder serving path vs the bf16 path, using the
trained 304² checkpoint (benchmarks/ckpt304, written by run_all.py).

This is the accuracy half of the int8 PTQ decision (VERDICT r1 item 9 /
ROADMAP item 2): the throughput A/B lives in benchmarks/int8_ab.py; this
script verifies quantization does not move dataset-level Dice more than
noise. Appends a JSON line to benchmarks/int8_accuracy.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from octave_tpu.data.datasets import SyntheticOcta
    from octave_tpu.serve import Predictor
    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.checkpoint import CheckpointManager
    from octave_tpu.utils.config import Config
    from octave_tpu.utils.metrics import auc_exact

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt_dir = os.path.join(here, "ckpt304")
    cfg = Config.from_dict({
        "model": {"discriminator_depth": 4},
        "data": {"dataset": "synthetic", "image_size": (304, 304),
                 "batch_size": 16, "synthetic_n": 64},
        "train": {"steps": 0, "checkpoint_dir": ckpt_dir},
    })
    trainer = Trainer(cfg)
    state = CheckpointManager(ckpt_dir).restore_latest(trainer.init_state())
    if state is None:
        raise SystemExit("no checkpoint in benchmarks/ckpt304 — run run_all.py first")
    variables = {"params": state.seg_params, "batch_stats": state.batch_stats}

    ds = SyntheticOcta(size=(304, 304), n=64, seed=cfg.train.seed + 1)
    imgs = np.stack([np.repeat((ds[i].image.astype(np.float32) / 255.0)[..., None], 3, -1)
                     for i in range(len(ds))])
    gts = np.stack([ds[i].mask for i in range(len(ds))]).astype(bool)

    calib = [imgs[:16]]
    scope = os.environ.get("AB_SCOPE", "decoder")
    results = {"int8_scope": scope}
    for label, kw in (
        ("bf16", dict()),
        ("int8", dict(int8_decoder=True, calibration_batches=calib,
                      int8_scope=scope,
                      dense_groups=os.environ.get("AB_DENSE") or None)),
    ):
        p = Predictor(variables, **kw)
        probs = np.concatenate([p(imgs[i : i + 16])[..., 1] for i in range(0, len(imgs), 16)])
        pred = probs >= 0.5
        tp = float(np.sum(pred & gts)); fp = float(np.sum(pred & ~gts))
        fn = float(np.sum(~pred & gts))
        results[f"{label}_dice"] = round(2 * tp / (2 * tp + fp + fn), 5)
        results[f"{label}_auc"] = round(float(auc_exact(
            probs.reshape(-1)[::37], gts.reshape(-1)[::37])), 5)
        del p

    results["dice_delta"] = round(results["int8_dice"] - results["bf16_dice"], 5)
    print(json.dumps(results, indent=2))
    with open(os.path.join(here, "int8_accuracy.json"), "a") as f:
        f.write(json.dumps(results) + "\n")


if __name__ == "__main__":
    main()
