"""Measure all five BASELINE.json configs on the attached TPU and write a
JSON report (benchmarks/report.json).

Configs (BASELINE.json:6-12):
  1. single 304² forward (latency)
  2. batch-8 inference with Dice/AUC eval vs dense GT (synthetic phantoms)
  3. 400² inference + ILD attention heads
  4. weak-supervision train step (WPCE + ILD)
  5. full adversarial train step (segmentor + LS-GAN critic)

Each measurement forces a host transfer inside the timed region (relay-safe,
see docs/architecture.md) and reports median steady-state wall time.
"""
from __future__ import annotations

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


def main() -> None:
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

    def init_vars(hw):
        return jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), False
        )

    def bf16(tree):
        return jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, tree
        )

    # ---- config 1: single 304² forward latency --------------------------
    v304 = init_vars(304)
    fwd = jax.jit(lambda p, x: model.apply(p, x, "softmax", False,
                                           method=ResnestUNet.predict)[1])
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 304, 304, 3)), jnp.bfloat16)
    p16 = bf16(v304)
    np.asarray(fwd(p16, x1)[0, 0, 0, :])  # compile
    dt = _median_time(lambda: np.asarray(fwd(p16, x1)[0, 0, 0, :]))
    report["config1_single_304_forward_ms"] = round(dt * 1e3, 2)

    # ---- config 2: batch-8 inference + Dice/AUC -------------------------
    ev = jax.jit(make_eval_step(model, 2))
    img8 = jnp.asarray(rng.uniform(0, 1, (8, 304, 304, 3)), jnp.float32)
    mask8 = jnp.asarray((rng.uniform(0, 1, (8, 304, 304)) > 0.6).astype(np.int32))
    batch2 = {"image": img8, "mask_onehot": mask_to_onehot(mask8, 2)}
    _, m = ev(v304["params"], v304["batch_stats"], batch2)
    float(m["dice"])  # compile + transfer
    dt = _median_time(lambda: float(ev(v304["params"], v304["batch_stats"], batch2)[1]["dice"]))
    report["config2_eval_batch8_ms"] = round(dt * 1e3, 2)
    report["config2_metrics"] = {k: round(float(x), 4) for k, x in m.items()}

    # ---- config 3: 400² inference (OCTA-500 class) ----------------------
    v400 = init_vars(400)
    x400 = jnp.asarray(rng.uniform(0, 1, (8, 400, 400, 3)), jnp.bfloat16)
    p400 = bf16(v400)
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
        state = TrainState.create(
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
        state, losses = step(state, batch45)
        float(losses["loss_seg_total"])
        holder = {"state": state}

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
