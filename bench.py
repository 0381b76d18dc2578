"""Benchmark: 304×304 en-face inference throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): ≥5,000 images/sec on a v5e-8 → 625 images/sec/chip.

Measurement design: K forwards are chained INSIDE one device program with
`lax.scan`, each iteration's input perturbed by the previous prediction so
XLA cannot hoist the forward out of the loop; one program execution is timed
end-to-end. This measures pure device throughput, independent of host/tunnel
dispatch latency, and cannot over-count unserialised async dispatches.
"""
from __future__ import annotations

import json
import time


PER_CHIP_BASELINE = 5000.0 / 8.0
K_INNER = 16


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from octave_tpu.models.segmentor import ResnestUNet

    batch = 32
    hw = 304
    model = ResnestUNet(num_classes=2)
    x0 = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(jax.random.PRNGKey(0), x0, False)

    # bf16 weights/activations: MXU-native, fp32 accumulation. Params are jit
    # ARGUMENTS (not closure constants) so the traced HLO stays small.
    bf16_vars = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables
    )

    def forward(params, image):
        _, pred = model.apply(params, image, "softmax", False,
                              method=ResnestUNet.predict)
        return pred

    def chained(params, image):
        def body(carry, _):
            pred = forward(params, carry)
            # feed a prediction-dependent perturbation forward: defeats
            # loop-invariant code motion at negligible cost
            nxt = carry + (pred[..., :1] * jnp.bfloat16(1e-6))
            return nxt, pred[0, 0, 0, 0]

        final, taps = lax.scan(body, image, None, length=K_INNER)
        return final, taps

    fn = jax.jit(chained)
    xs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, hw, hw, 3))
    ).astype(jnp.bfloat16)

    # compile + warmup
    out = fn(bf16_vars, xs)
    jax.block_until_ready(out)

    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(bf16_vars, xs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    ips = batch * K_INNER / best

    # sanity: outputs finite and probability-like
    taps = np.asarray(out[1], np.float32)
    assert np.all(np.isfinite(taps)) and np.all((taps >= 0) & (taps <= 1)), taps

    print(json.dumps({
        "metric": "304x304 en-face inference images/sec/chip (ResnestUNet bf16)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / PER_CHIP_BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
