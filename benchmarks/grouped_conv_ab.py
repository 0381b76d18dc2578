"""Grouped vs dense lowering of the decoder SplAt convs, fwd AND bwd, on chip.

VERDICT r4 item 3(b): dense_groups='decoder' WINS at serving (+11% with
int8) but LOSES in the train graph (168.15 vs 184.75 img/s/chip,
train_scaling.json). This measures WHERE per stage: each decoder stage's
grouped 3x3 conv (C → 2C, groups=4; per-group out channels = C/2, so
decoder_0/1 run at 16/32 of the MXU's 128 lanes while decoder_3/4 fill
them), timed standalone as

  * fwd        — the conv alone
  * fwd+bwd    — value_and_grad wrt (kernel, input): one fwd + dX + dW pass

for (a) the grouped lowering XLA emits for feature_group_count=4 and (b)
the block-diagonal dense expansion (4x the FLOPs at dense MXU efficiency —
exact same math). Appends JSON lines to benchmarks/grouped_conv_ab.json.

Decoder shapes at 304² (models/segmentor.py:224-242): stage i runs at
(304/2^(4-i))²... indexed here as the module names decoder_0..4 with
spatial 304,152,76,38,19 and C = 32,64,256,512,1024.
"""
from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [  # (name, hw, C) — splat conv is C -> 2C, groups=4, 3x3
    ("decoder_0", 304, 32),
    ("decoder_1", 152, 64),
    ("decoder_2", 76, 256),
    ("decoder_3", 38, 512),
    ("decoder_4", 19, 1024),
]


def main(batch: int = 128, dtype_name: str = "bfloat16") -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.dtype(dtype_name)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "grouped_conv_ab.json")

    def conv(x, k, groups):
        # mirrors the train graph's conv exactly (models/resnest.py:201-205):
        # no preferred_element_type — bf16 in/out, fp32 MXU accumulation
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    def dense_expand(k, groups):
        """(3,3,C/g,2C) grouped kernel -> (3,3,C,2C) block-diagonal dense."""
        kh, kw, cin_g, cout = k.shape
        cout_g = cout // groups
        blocks = []
        for g in range(groups):
            pad_lo = g * cin_g
            pad_hi = (groups - 1 - g) * cin_g
            blk = jnp.pad(k[..., g * cout_g:(g + 1) * cout_g],
                          ((0, 0), (0, 0), (pad_lo, pad_hi), (0, 0)))
            blocks.append(blk)
        return jnp.concatenate(blocks, axis=-1)

    def timed(fn, *args, reps=10):
        # The jitted graph reduces every output to ONE f32 scalar (sum —
        # nothing is DCE'd) and the timed region fetches just that scalar:
        # one dispatch, 4-byte downlink. block_until_ready on this relay
        # platform returns before execution finishes, so completion must be
        # forced by a host transfer (same rule as int8_ab.py /
        # serve_latency.py). Every measurement still carries the ~28 ms
        # relay dispatch floor — it is measured separately below
        # (stage='dispatch_floor') and identical across the A/B arms.
        def scalar_fn(*a):
            out = fn(*a)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        fn_j = jax.jit(scalar_fn)
        np.asarray(fn_j(*args))  # compile + warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn_j(*args))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) * 1e3

    rows = []
    # the additive per-dispatch constant every row below carries: an empty
    # graph, timed the same way — subtract it when comparing absolute cost
    floor = {"stage": "dispatch_floor", "batch": batch, "dtype": dtype_name,
             "ms": round(timed(lambda t: t + 1.0, jnp.float32(0.0)), 3)}
    print(json.dumps(floor), flush=True)
    rows.append(floor)
    for name, hw, c in STAGES:
        groups = 4
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((batch, hw, hw, c)), dtype)
        kg = jnp.asarray(
            rng.standard_normal((3, 3, c // groups, 2 * c)) * 0.05, dtype)

        def fwd_grouped(x, k):
            return conv(x, k, groups)

        def fwd_dense(x, k):
            return conv(x, dense_expand(k, groups), 1)

        def loss_of(fwd):
            def loss(x, k):
                return jnp.sum(fwd(x, k).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1))

        row = {"stage": name, "hw": hw, "c": c, "batch": batch,
               "dtype": dtype_name,
               "fwd_grouped_ms": round(timed(fwd_grouped, x, kg), 3),
               "fwd_dense_ms": round(timed(fwd_dense, x, kg), 3),
               "bwd_grouped_ms": round(timed(loss_of(fwd_grouped), x, kg), 3),
               "bwd_dense_ms": round(timed(loss_of(fwd_dense), x, kg), 3)}
        print(json.dumps(row), flush=True)
        rows.append(row)

    with open(out_path, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    a = ap.parse_args()
    main(a.batch, a.dtype)
