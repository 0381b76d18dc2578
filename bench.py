"""Benchmark: 304×304 en-face inference throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): ≥5,000 images/sec on a v5e-8 → 625 images/sec/chip.

Measurement design (production serving path, VERDICT r1 item 10):
  * the jitted forward is the folded-BN bf16 predict graph, params passed
    as jit ARGUMENTS (small HLO, relay-friendly);
  * throughput is measured PIPELINED, exactly like serve.Predictor
    .predict_stream: up to 2 dispatches in flight, so the host's ~30-40 ms
    per-call relay dispatch overhead overlaps device compute instead of
    serializing with it. Every popped result forces a host transfer of
    real output bytes (np.asarray) — `block_until_ready` alone can lie on
    the relay backend;
  * total wall time over a stream of batches after warmup — steady-state
    serving throughput, not a single-call latency inverse. Per-call
    (unpipelined) time is reported alongside for comparison.
Batch 256 amortizes fixed per-dispatch cost (measured r2: B=128 → 745,
B=256 → 800, B=384 → 816 img/s; B=512 OOMs the compile). On this relay
container dispatches execute synchronously (pipelining ≈ per-call; kept
because it IS the production path and overlaps on real TPU hosts).
"""
from __future__ import annotations

import json
import statistics
import time
from collections import deque


PER_CHIP_BASELINE = 5000.0 / 8.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.ops.norm import fold_batch_stats, folded_inference

    batch = 256
    hw = 304
    n_stream = 6
    depth = 2

    model = ResnestUNet(num_classes=2)
    x0 = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(jax.random.PRNGKey(0), x0, False)
    variables = fold_batch_stats(variables)

    # bf16 weights/activations: MXU-native, fp32 accumulation. Params are jit
    # ARGUMENTS (not closure constants) so the traced HLO stays small.
    bf16_vars = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables
    )

    def forward(params, image):
        _, pred = model.apply(params, image, "softmax", False,
                              method=ResnestUNet.predict)
        return pred

    jitted = jax.jit(forward)

    def fn(params, image):
        with folded_inference():  # affects tracing only; cached execs free
            return jitted(params, image)

    xs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, hw, hw, 3))
    ).astype(jnp.bfloat16)

    # compile + warmup (2 runs: the first post-compile exec can be slow)
    for _ in range(2):
        np.asarray(fn(bf16_vars, xs)[0, 0, 0, :])

    # --- unpipelined per-call (latency-style) reference ------------------
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(bf16_vars, xs)
        tap = np.asarray(out[0, 0, 0, :])  # force real completion + transfer
        times.append(time.perf_counter() - t0)
    per_call = statistics.median(times)
    assert np.all(np.isfinite(tap)) and abs(float(tap.sum()) - 1.0) < 1e-2, tap

    # --- pipelined steady-state (the serving path) ------------------------
    def stream_once() -> float:
        inflight: deque = deque()
        t0 = time.perf_counter()
        for _ in range(n_stream):
            if len(inflight) >= depth:
                np.asarray(inflight.popleft()[0, 0, 0, :])
            inflight.append(fn(bf16_vars, xs))
        while inflight:
            np.asarray(inflight.popleft()[0, 0, 0, :])
        return time.perf_counter() - t0

    stream_once()  # pipeline warmup
    dt = min(stream_once() for _ in range(3))
    ips = batch * n_stream / dt

    print(json.dumps({
        "metric": "304x304 en-face inference images/sec/chip "
                  "(ResnestUNet bf16, pipelined serving path)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / PER_CHIP_BASELINE, 3),
        "per_call_img_s": round(batch / per_call, 2),
    }))


if __name__ == "__main__":
    main()
