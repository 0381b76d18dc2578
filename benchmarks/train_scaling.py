"""Adversarial-train-step batch scaling on the attached TPU (BASELINE
configs #4/#5 throughput). Measures the full GAN step (both phases, two
optimizers, donated state) at several batch sizes, with and without
segmentor rematerialization. Appends JSON lines to
benchmarks/train_scaling.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch: int, remat: bool, hw: int = 304, reps: int = 5,
            use_disc: bool = True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.data.preprocess import mask_pyramid, mask_to_onehot, scribble_to_onehot
    from octave_tpu.models.discriminator import DiscriminatorBlock
    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.train.schedule import make_optimizer
    from octave_tpu.train.state import TrainState
    from octave_tpu.train.steps import StepConfig, make_train_step

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 3)), jnp.bfloat16)
    mask = jnp.asarray((rng.uniform(0, 1, (batch, hw, hw)) > 0.6).astype(np.int32))
    scrib = jnp.asarray(
        np.where(rng.uniform(0, 1, (batch, hw, hw)) < 0.3, np.asarray(mask) + 1, 0)
    )
    batch_d = {
        "image": img,
        "scribble_onehot": scribble_to_onehot(scrib, 2),
        "mask_pyramid": mask_pyramid(mask_to_onehot(mask, 2), 4),
    }

    from octave_tpu.train.trainer import (_parse_remat_blocks,
                                          _parse_remat_enc_layers,
                                          _remat_saves_convs)

    seg = ResnestUNet(num_classes=2, remat_blocks=_parse_remat_blocks(remat),
                      remat_save_convs=_remat_saves_convs(remat),
                      remat_enc_layers=_parse_remat_enc_layers(remat))
    disc = DiscriminatorBlock(input_hw=(hw, hw), depth=4)
    key = jax.random.PRNGKey(0)
    seg_vars = seg.init(key, batch_d["image"][:1].astype(jnp.float32), False)
    disc_vars = disc.init(
        {"params": key, "noise": key},
        [p[:1].astype(jnp.float32) for p in batch_d["mask_pyramid"]], False,
    )
    mu = os.environ.get("TS_MU") or None  # 'bfloat16': Adam mu in bf16
    state = TrainState.create(
        seg_params=seg_vars["params"], disc_params=disc_vars["params"],
        batch_stats=seg_vars["batch_stats"], spectral=disc_vars["spectral"],
        seg_tx=make_optimizer(1e-3, moment_dtype=mu),
        disc_tx=make_optimizer(1e-4, moment_dtype=mu),
        rng=jax.random.PRNGKey(3),
    )
    cfg = StepConfig(num_classes=2, use_discriminator=use_disc,
                     discriminator_depth=4, compute_dtype="bfloat16", remat=remat)
    step = make_train_step(seg, disc, cfg)
    k = int(os.environ.get("TS_K", "1"))
    if k > 1:
        from octave_tpu.train.steps import make_multi_step

        step = make_multi_step(step, k)
        batch_d = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch_d
        )
    step = jax.jit(step, donate_argnums=(0,))

    import contextlib
    ctx = contextlib.ExitStack()
    dense_spec = os.environ.get("TS_DENSE")
    if dense_spec:
        from octave_tpu.models.resnest import dense_groups_include, groups_as_dense

        # TS_DENSE=1 keeps the old all-decoder behavior; a spec value
        # ('decoder:01', 'all', ...) scopes it (dense_groups_include)
        if dense_spec == "1":
            dense_spec = "decoder"
        ctx.enter_context(groups_as_dense(dense_groups_include(dense_spec)))
    einsum_spec = os.environ.get("TS_EINSUM")
    if einsum_spec:
        from octave_tpu.models.resnest import (dense_groups_include,
                                               groups_as_einsum)

        ctx.enter_context(groups_as_einsum(dense_groups_include(einsum_spec)))
    try:
        if os.environ.get("TS_MEM"):
            # HBM budget diagnosis (VERDICT r2 item 2): compile only and
            # report the executable's memory analysis — no execution
            ca = step.lower(state, batch_d).compile().memory_analysis()
            mem = {
                k: int(getattr(ca, k))
                for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                          "output_size_in_bytes", "alias_size_in_bytes",
                          "generated_code_size_in_bytes")
                if hasattr(ca, k) and getattr(ca, k) is not None
            }
            return {"batch": batch, "remat": remat, "adversarial": use_disc,
                    "memory_analysis": mem}
        state, losses = step(state, batch_d)  # compile
        jax.block_until_ready(losses)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, losses = step(state, batch_d)
            _ = float(losses["loss_seg_total"])  # forces completion
            ts.append(time.perf_counter() - t0)
        dt = statistics.median(ts) / max(k, 1)  # per train step
        r = {"batch": batch, "remat": remat, "adversarial": use_disc,
             "step_ms": round(dt * 1e3, 2), "img_per_s": round(batch / dt, 2)}
        if os.environ.get("TS_SUSTAIN"):
            # SUSTAINED throughput: N chained dispatches, ONE final sync.
            # The per-call loop above pays a full relay dispatch latency
            # every call (the host sync un-pipelines the stream); the
            # production fit loop explicitly does NOT (train.dispatch_ahead
            # keeps 2 steps in flight, trainer.py). Chaining donated steps
            # back-to-back measures what a fit loop with prefetched data
            # sustains — both numbers are recorded.
            n = int(os.environ.get("TS_SUSTAIN"))
            t0 = time.perf_counter()
            for _ in range(n):
                state, losses = step(state, batch_d)
            _ = float(losses["loss_seg_total"])
            dt_s = (time.perf_counter() - t0) / (n * max(k, 1))
            r["sustained_steps"] = n * max(k, 1)
            r["step_ms_sustained"] = round(dt_s * 1e3, 2)
            r["img_per_s_sustained"] = round(batch / dt_s, 2)
        if k > 1:
            r["steps_per_call"] = k
        if mu:
            r["moment_dtype"] = mu
        if dense_spec:
            r["dense_groups"] = dense_spec
        if einsum_spec:
            r["einsum_groups"] = einsum_spec
        return r
    except Exception as e:  # OOM etc. — record, don't crash the sweep
        return {"batch": batch, "remat": remat, "error": type(e).__name__,
                "detail": str(e)[:200]}
    finally:
        ctx.close()


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sweep = [(32, False), (48, False), (64, False), (64, True), (96, True)]
    if os.environ.get("TS_SWEEP"):
        sweep = [tuple(json.loads(s)) for s in os.environ["TS_SWEEP"].split(";")]
    with open(os.path.join(here, "train_scaling.json"), "a") as f:
        use_disc = not os.environ.get("TS_WEAK")
        for batch, remat in sweep:
            r = measure(batch, remat, use_disc=use_disc)
            print(json.dumps(r))
            f.write(json.dumps(r) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
