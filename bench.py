"""Benchmark: 304×304 en-face inference throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): ≥5,000 images/sec on a v5e-8 → 625 images/sec/chip.
The flagship inference path is ResnestUNet.predict('softmax') in bfloat16
activations (fp32 params; BN folded at trace time by XLA).
"""
from __future__ import annotations

import json
import time


PER_CHIP_BASELINE = 5000.0 / 8.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.models.segmentor import ResnestUNet

    batch = 32
    hw = 304
    model = ResnestUNet(num_classes=2)
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(jax.random.PRNGKey(0), x, False)

    def predict(image):
        # bf16 compute: cast activations; params stay fp32 (XLA keeps matmuls
        # in bf16 via the input dtype, accumulating fp32 on the MXU)
        img = image.astype(jnp.bfloat16)
        cast_vars = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables
        )
        atts, pred = model.apply(cast_vars, img, "softmax", False,
                                 method=ResnestUNet.predict)
        return pred.astype(jnp.float32)

    fn = jax.jit(predict)
    xs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, hw, hw, 3)),
                     jnp.float32)

    # warmup / compile
    fn(xs).block_until_ready()
    fn(xs).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(xs)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    print(json.dumps({
        "metric": "304x304 en-face inference images/sec/chip (ResnestUNet bf16)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / PER_CHIP_BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
