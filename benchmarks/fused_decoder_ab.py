"""A/B: fused decoder-epilogue Pallas path vs plain XLA eval path, on the
real TPU chip (production inference config: 304x304, bf16, folded BN,
batch 128). Honest timing per the repo measurement rules: forced host
transfer of real output data inside the timed region, median of
steady-state reps, fresh function objects per variant.

Usage: python benchmarks/fused_decoder_ab.py [batch] [reps]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(model, variables, xs, label, reps):
    import jax
    import numpy as np

    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.ops.norm import folded_inference

    def forward(params, image):
        _, pred = model.apply(params, image, "softmax", False,
                              method=ResnestUNet.predict)
        return pred

    fn = jax.jit(forward)

    def call():
        with folded_inference():
            return fn(variables, xs)

    for _ in range(2):
        np.asarray(call()[0, 0, 0, :])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = call()
        np.asarray(out[0, 0, 0, :])
        np.asarray(out[-1, -1, -1, :])
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    ips = xs.shape[0] / med
    print(f"{label}: median {med*1e3:.1f} ms  {ips:.1f} img/s/chip  "
          f"(all: {[f'{t*1e3:.0f}' for t in times]})")
    return ips


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.ops.norm import fold_batch_stats

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    hw = 304

    m0 = ResnestUNet(num_classes=2)
    m1 = ResnestUNet(num_classes=2, use_fused_decoder=True)
    x0 = jnp.zeros((1, hw, hw, 3), jnp.float32)
    variables = jax.jit(m0.init, static_argnums=(2,))(jax.random.PRNGKey(0), x0, False)
    variables = fold_batch_stats(variables)
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, variables
    )
    xs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, hw, hw, 3))
    ).astype(jnp.bfloat16)

    ips0 = bench_variant(m0, variables, xs, "xla-eval      ", reps)
    ips1 = bench_variant(m1, variables, xs, "fused-decoder ", reps)
    print(json.dumps({"batch": batch, "xla_ips": ips0, "fused_ips": ips1,
                      "speedup": ips1 / ips0}))


if __name__ == "__main__":
    main()
