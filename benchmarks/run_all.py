"""Measure all five BASELINE.json configs on the attached TPU and write a
JSON report (benchmarks/report.json).

Configs (BASELINE.json:6-12):
  1. single 304² forward (latency)
  2. batch-8 inference with Dice/AUC eval vs dense GT
  3. 400² inference + ILD attention heads
  4. weak-supervision train step (WPCE + ILD)
  5. full adversarial train step (segmentor + LS-GAN critic)

Accuracy columns are REAL (VERDICT r1 item 3): the script first trains the
full adversarial pipeline (or resumes from benchmarks/ckpt304) and evaluates
configs #2/#3 with the trained weights at dataset level — not random-init
placeholders. The model is fully convolutional, so the 304²-trained weights
evaluate at 400² for config #3 as-is.

Real data: pass --dataset rose|octa500 --root <dir> (layouts per
octave_tpu/data/datasets.py) and optionally --pth resnest50-528c19ca.pth to
start from the reference's pretrained encoder; everything else is identical.
Default is the synthetic phantom set (no gated downloads required).

Each measurement forces a host transfer inside the timed region (relay-safe,
see docs/architecture.md) and reports median steady-state wall time.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_time(fn, reps: int = 5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _train_or_resume(args):
    """Train the full adversarial pipeline (config #5 machinery) at 304²,
    resuming from benchmarks/ckpt304 when present. Returns (trainer, state,
    eval metrics dict at 304², eval metrics dict at 400²)."""
    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.config import Config

    ckpt_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ckpt304")
    base = {
        "model": {"discriminator_depth": 4,
                  "pretrain": bool(args.pth), "weight_path": args.pth or ""},
        "data": {"dataset": args.dataset, "image_size": (304, 304),
                 "batch_size": 16, "synthetic_n": 64, "root": args.root or "",
                 "subset": args.subset},
        "train": {"steps": args.train_steps, "eval_every": 0, "log_every": 50,
                  "checkpoint_every": 200, "checkpoint_dir": ckpt_dir,
                  "compute_dtype": "bfloat16"},
        "optim": {"decay_steps": max(args.train_steps, 1)},
    }
    cfg = Config.from_dict(base)
    trainer = Trainer(cfg)
    state = trainer.fit()  # restores from ckpt304 and fast-exits when done
    m304 = trainer.evaluate(state)

    cfg400 = Config.from_dict({**base, "data": {**base["data"],
                                                "image_size": (400, 400)}})
    trainer400 = Trainer(cfg400)
    m400 = trainer400.evaluate(state)  # same weights, fully convolutional
    return trainer, state, m304, m400


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--dataset", default="synthetic",
                    choices=("synthetic", "rose", "octa500"))
    ap.add_argument("--root", default=None, help="real dataset root dir")
    ap.add_argument("--subset", default="ROSE-1/SVC")
    ap.add_argument("--pth", default=None,
                    help="path to resnest50-528c19ca.pth (pretrained encoder)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.data.preprocess import mask_pyramid, mask_to_onehot, scribble_to_onehot
    from octave_tpu.models.discriminator import DiscriminatorBlock
    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.train.schedule import make_optimizer
    from octave_tpu.train.state import TrainState
    from octave_tpu.train.steps import StepConfig, make_eval_step, make_train_step

    report = {}
    rng = np.random.default_rng(0)
    model = ResnestUNet(num_classes=2)

    # ---- phase 0: trained weights for the accuracy halves ----------------
    t0 = time.perf_counter()
    trainer, state, m304, m400 = _train_or_resume(args)
    report["train_phase_s"] = round(time.perf_counter() - t0, 1)
    report["train_steps"] = int(state.step)
    report["config2_metrics"] = {k: round(float(v), 4) for k, v in m304.items()}
    report["config3_metrics_400"] = {k: round(float(v), 4) for k, v in m400.items()}
    v304 = {"params": state.seg_params, "batch_stats": state.batch_stats}

    def bf16(tree):
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, tree
        )

    # ---- config 1: single 304² forward latency --------------------------
    fwd = jax.jit(lambda p, x: model.apply(p, x, "softmax", False,
                                           method=ResnestUNet.predict)[1])
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 304, 304, 3)), jnp.bfloat16)
    p16 = bf16(v304)
    np.asarray(fwd(p16, x1)[0, 0, 0, :])  # compile
    dt = _median_time(lambda: np.asarray(fwd(p16, x1)[0, 0, 0, :]))
    report["config1_single_304_forward_ms"] = round(dt * 1e3, 2)

    # ---- config 2: batch-8 inference + Dice/AUC timing ------------------
    ev = jax.jit(make_eval_step(model, 2))
    img8 = jnp.asarray(rng.uniform(0, 1, (8, 304, 304, 3)), jnp.float32)
    mask8 = jnp.asarray((rng.uniform(0, 1, (8, 304, 304)) > 0.6).astype(np.int32))
    batch2 = {"image": img8, "mask_onehot": mask_to_onehot(mask8, 2)}
    _, m = ev(v304["params"], v304["batch_stats"], batch2)
    float(m["dice"])  # compile + transfer
    dt = _median_time(lambda: float(ev(v304["params"], v304["batch_stats"], batch2)[1]["dice"]))
    report["config2_eval_batch8_ms"] = round(dt * 1e3, 2)

    # ---- config 3: 400² inference (OCTA-500 class) ----------------------
    x400 = jnp.asarray(rng.uniform(0, 1, (8, 400, 400, 3)), jnp.bfloat16)
    p400 = p16
    fwd400 = jax.jit(lambda p, x: model.apply(p, x, False))
    atts, agg, _ = fwd400(p400, x400)
    np.asarray(agg[0, 0, 0, :])
    dt = _median_time(lambda: np.asarray(fwd400(p400, x400)[1][0, 0, 0, :]))
    report["config3_400_batch8_ms"] = round(dt * 1e3, 2)
    report["config3_attention_scales"] = [int(a.shape[1]) for a in atts]

    # ---- configs 4-5: train steps ---------------------------------------
    B = 8
    scrib = jnp.asarray(
        np.where(rng.uniform(0, 1, (B, 304, 304)) < 0.3, np.asarray(mask8) + 1, 0)
    )
    batch45 = {
        "image": img8,
        "scribble_onehot": scribble_to_onehot(scrib, 2),
        "mask_pyramid": mask_pyramid(mask_to_onehot(mask8, 2), 4),
    }
    disc = DiscriminatorBlock(input_hw=(304, 304), depth=4, num_filters=64)
    dv = disc.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(0)},
                   [p[:1] for p in batch45["mask_pyramid"]], False)

    for name, use_d in (("config4_weak_train", False), ("config5_adversarial_train", True)):
        st = TrainState.create(
            seg_params=v304["params"],
            disc_params=dv["params"] if use_d else None,
            batch_stats=v304["batch_stats"],
            spectral=dv["spectral"] if use_d else None,
            seg_tx=make_optimizer(1e-4),
            disc_tx=make_optimizer(1e-4) if use_d else None,
            rng=jax.random.PRNGKey(3),
        )
        step = jax.jit(
            make_train_step(
                model, disc if use_d else None,
                StepConfig(num_classes=2, use_discriminator=use_d,
                           discriminator_depth=4, compute_dtype="bfloat16"),
            )
        )
        st, losses = step(st, batch45)
        float(losses["loss_seg_total"])
        holder = {"state": st}

        def one():
            holder["state"], l = step(holder["state"], batch45)
            float(l["loss_seg_total"])

        dt = _median_time(one, reps=3)
        report[f"{name}_step_ms"] = round(dt * 1e3, 2)
        report[f"{name}_img_per_s"] = round(B / dt, 1)

    out = os.path.join(os.path.dirname(__file__), "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
