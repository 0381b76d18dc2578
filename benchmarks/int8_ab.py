"""A/B on the attached TPU: bf16 vs int8-decoder serving throughput, and
per-call vs aggregated (multi-batch single-dispatch) serving.

Measures the same honest way as bench.py (forced host transfer inside the
timed region, median of steady-state calls). Writes results to stdout and
appends a JSON line to benchmarks/int8_ab.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.serve import Predictor

    batch = int(os.environ.get("AB_BATCH", "256"))
    hw = 304
    k = int(os.environ.get("AB_SCAN_K", "4"))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (batch, hw, hw, 3)).astype(np.float32)
    calib = [x[: min(batch, 64)]]

    base = Predictor.initialize(image_hw=(hw, hw), fold_bn=False, dtype=jnp.float32)
    raw_vars = base.variables

    results = {"batch": batch, "scan_k": k,
               "date": time.strftime("%Y-%m-%d"), "int8_prepack": True}

    scope = os.environ.get("AB_SCOPE", "decoder")
    results["int8_scope"] = scope
    dense = os.environ.get("AB_DENSE") or None
    if dense:
        results["dense_groups"] = dense
    einsum = os.environ.get("AB_EINSUM") or None
    if einsum:
        results["einsum_groups"] = einsum
    if os.environ.get("AB_CONVT"):
        from octave_tpu.ops.common import set_conv_transpose_impl

        set_conv_transpose_impl(os.environ["AB_CONVT"])
        results["convt_impl"] = os.environ["AB_CONVT"]
    arms = [
        ("bf16", dict(fold_bn=True, dense_groups=dense, einsum_groups=einsum)),
        ("int8", dict(fold_bn=True, int8_decoder=True, calibration_batches=calib,
                      int8_scope=scope, dense_groups=dense,
                      einsum_groups=einsum)),
    ]
    if os.environ.get("AB_SKIP_BF16"):
        # compile-budget mode: only the int8 arm (compare against an
        # existing bf16 row at the same settings); accuracy-vs-bf16 fields
        # are skipped
        arms = arms[1:]
    y_ref = None
    for label, kw in arms:
        p = Predictor(raw_vars, **kw)
        xs = p._put(x)
        y = None

        def call():
            nonlocal y
            y = p._fn(p.variables, xs)
            np.asarray(y[0, 0, 0, :])

        call(); call()  # compile + warmup
        dt = timed(call)
        results[f"{label}_per_call_img_s"] = round(batch / dt, 2)
        print(json.dumps({f"{label}_per_call_img_s": results[f"{label}_per_call_img_s"]}), flush=True)
        # accuracy proxy: compare outputs
        if label == "bf16":
            y_ref = np.asarray(y)
        elif y_ref is not None:
            y_q = np.asarray(y)
            results["int8_mad_vs_bf16"] = round(float(np.mean(np.abs(y_q - y_ref))), 5)
            results["int8_mask_agreement"] = round(
                float(np.mean(y_q.argmax(-1) == y_ref.argmax(-1))), 5
            )

        # aggregated dispatch: k batches in ONE dispatch (predict_many,
        # unrolled + barrier-chained). Pre-upload the stack so the timed
        # region is dispatch+compute, matching the per-call measurement
        # (the relay uplink moves ~20 MB/s; 1 GB inside the timed region
        # would swamp everything).
        x_k = jnp.asarray(np.broadcast_to(x[None], (k, *x.shape)), p.dtype)
        x_k.block_until_ready()

        def call_k():
            out = p.predict_many_device(x_k)
            np.asarray(out[0, 0, 0, 0, :])  # force completion, tiny transfer

        call_k(); call_k()
        dt_k = timed(call_k, reps=3)
        results[f"{label}_agg{k}_img_s"] = round(batch * k / dt_k, 2)
        del p

    print(json.dumps(results, indent=2))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "int8_ab.json"), "a") as f:
        f.write(json.dumps(results) + "\n")


if __name__ == "__main__":
    main()
