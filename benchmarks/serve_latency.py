"""Small-batch serving LATENCY on the attached TPU chip.

The throughput artifacts (bench.py, int8_ab.json) measure B=256 aggregated
dispatch — the batch regime where per-call costs amortize away. Production
serving also has a low-latency regime (single scan, interactive viewers)
where fixed per-call work dominates; VERDICT r2 flagged the int8 per-call
weight-quantize pass as unmeasured there. This benchmark records, per batch
size in {1, 4, 16, 64}:

  * bf16 folded-BN predict latency,
  * int8 (decoder scope x dense-lowered groups) WITHOUT weight pre-packing
    (the per-call weight-quantize pass in the graph, ops/quant.py), and
  * int8 WITH offline pre-packing (prepack_weights: int8 kernels live in
    the params tree).

Measurement rules (relay): inputs pre-uploaded; timed region blocks on the
DEVICE output (no downlink in the loop); median of steady-state calls.
Appends JSON lines to benchmarks/serve_latency.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_trained_variables, phantom_batch  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from octave_tpu.serve import Predictor

    hw = 304
    try:
        variables, weights_label = load_trained_variables()
    except Exception:
        variables, weights_label = None, None

    def make(**kw):
        if variables is not None:
            return Predictor(variables, **kw)
        return Predictor.initialize(image_hw=(hw, hw), **kw)

    calib = [phantom_batch(16, hw)]
    configs = {
        "bf16": dict(),
        "int8": dict(int8_decoder=True, calibration_batches=calib,
                     dense_groups="decoder", int8_prepack=False),
        "int8_prepack": dict(int8_decoder=True, calibration_batches=calib,
                             dense_groups="decoder", int8_prepack=True),
    }
    preds = {name: make(**kw) for name, kw in configs.items()}

    here = os.path.dirname(os.path.abspath(__file__))
    out = open(os.path.join(here, "serve_latency.json"), "a")
    for batch in (1, 4, 16, 64):
        x_host = phantom_batch(batch, hw)
        row = {"batch": batch,
               "weights": weights_label if variables is not None else "random"}
        for name, pred in preds.items():
            x = pred._put(jnp.asarray(x_host, jnp.float32))  # pre-upload
            call = pred._fn
            y = call(pred.variables, x)
            jax.block_until_ready(y)  # compile + warm
            ts = []
            for _ in range(20):
                t0 = time.perf_counter()
                jax.block_until_ready(call(pred.variables, x))
                ts.append(time.perf_counter() - t0)
            ms = statistics.median(ts) * 1e3
            row[f"{name}_ms"] = round(ms, 3)
            row[f"{name}_img_s"] = round(batch / (ms / 1e3), 1)
        print(json.dumps(row))
        out.write(json.dumps(row) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
