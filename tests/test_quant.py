"""int8 PTQ serving path (ops/quant.py): op-level error bounds, calibration
harness, end-to-end Predictor parity, and param-tree invariance.

The reference ships no quantized path (it is a torch fp32 library); this is
framework-supplied serving machinery for the BASELINE throughput target, so
the tests here bound quantization error against our own fp path rather than
against torch.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octave_tpu.ops import quant


class TestInt8Conv:
    def test_matches_fp_conv_within_tolerance(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 64)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
        sx = float(jnp.max(jnp.abs(x))) / 127.0
        yq = quant.int8_conv(x, w, b, sx, padding=[(1, 1), (1, 1)])
        yf = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        rel = float(jnp.linalg.norm(yq - yf) / jnp.linalg.norm(yf))
        assert rel < 0.02, rel

    def test_grouped_conv(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 64)), jnp.float32)
        sx = float(jnp.max(jnp.abs(x))) / 127.0
        yq = quant.int8_conv(x, w, None, sx, padding=[(1, 1), (1, 1)], groups=4)
        yf = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4,
        )
        rel = float(jnp.linalg.norm(yq - yf) / jnp.linalg.norm(yf))
        assert rel < 0.02, rel

    def test_conv_transpose_2x2_matches_fp(self):
        from octave_tpu.ops.common import conv_transpose_2x2

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.1, (16, 8, 2, 2)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (8,)), jnp.float32)
        sx = float(jnp.max(jnp.abs(x))) / 127.0
        yq = quant.int8_conv_transpose_2x2(x, k, b, sx)
        yf = conv_transpose_2x2(x, k, b)
        assert yq.shape == yf.shape == (2, 16, 16, 8)
        rel = float(jnp.linalg.norm(yq - yf) / jnp.linalg.norm(yf))
        assert rel < 0.02, rel

    def test_weight_quantization_saturates_at_127(self):
        w = jnp.asarray(np.random.default_rng(2).normal(0, 1, (3, 3, 4, 8)), jnp.float32)
        wq, ws = quant.quantize_weight(w)
        assert wq.dtype == jnp.int8
        assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) <= 127
        # per-out-channel scale reconstructs the channel absmax
        rec = wq.astype(jnp.float32) * ws
        assert float(jnp.max(jnp.abs(rec - w))) < float(jnp.max(ws)) * 0.51

    def test_under_jit_with_static_scale(self):
        x = jnp.ones((1, 8, 8, 4), jnp.bfloat16)
        w = jnp.ones((1, 1, 4, 4), jnp.float32) * 0.5

        @jax.jit
        def f(x, w):
            return quant.int8_conv(x, w, None, 1.0 / 127.0, padding=[(0, 0), (0, 0)])

        y = f(x, w)
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(y, np.float32), 2.0, rtol=1e-2)


@pytest.fixture(scope="module")
def small_predictor_pair():
    """fp and int8 Predictors sharing weights, at a CPU-friendly size."""
    from octave_tpu.serve import Predictor

    rng = np.random.default_rng(0)
    calib = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32) for _ in range(2)]
    # fold_bn=False keeps RAW variables (folded ones are only valid under
    # the folded_inference trace context)
    fp = Predictor.initialize(image_hw=(64, 64), dtype=jnp.float32, fold_bn=False)
    q = Predictor(
        fp.variables, dtype=jnp.float32, fold_bn=False,
        int8_decoder=True, calibration_batches=calib,
    )
    return fp, q, calib


class TestPredictorInt8:
    def test_requires_calibration_batches(self):
        from octave_tpu.serve import Predictor

        # validation fires before any model build — the empty variables
        # tree is never touched, so this test costs milliseconds
        with pytest.raises(ValueError, match="calibration_batches"):
            Predictor({}, int8_decoder=True)

    @pytest.mark.slow
    def test_scales_cover_decoder_only(self, small_predictor_pair):
        _, q, _ = small_predictor_pair
        keys = list(q._quant_scales)
        assert keys, "calibration produced no scales"
        assert all(k.startswith(("decoder_", "upsampling_")) for k in keys)
        # the split-kernel pair convs and the splat conv are all covered
        assert any("conv1_a_absmax" in k for k in keys)
        assert any("splat/conv" in k for k in keys)
        # entries are PackedScale after offline weight packing (the default)
        assert all(
            (s.x_scale if isinstance(s, quant.PackedScale) else s) > 0
            for s in q._quant_scales.values()
        )

    @pytest.mark.slow
    def test_output_close_to_fp(self, small_predictor_pair):
        fp, q, calib = small_predictor_pair
        x = calib[0]
        y_fp = fp(x)
        y_q = q(x)
        assert y_q.shape == y_fp.shape
        # softmax probabilities: quantization shifts them only slightly
        mad = float(np.mean(np.abs(y_q - y_fp)))
        assert mad < 0.05, mad
        # the predicted masks agree almost everywhere
        agree = float(np.mean((y_q.argmax(-1) == y_fp.argmax(-1))))
        assert agree > 0.98, agree

    @pytest.mark.slow
    def test_param_tree_unchanged(self, small_predictor_pair):
        fp, q, _ = small_predictor_pair
        flat_fp = jax.tree_util.tree_structure(fp.variables["params"])
        flat_q = jax.tree_util.tree_structure(q.variables["params"])
        assert flat_fp == flat_q

    @pytest.mark.slow
    def test_dense_groups_exact_and_int8(self):
        """The bench-default serving config: dense-lowered decoder splat
        convs (exact math vs grouped) composed with int8."""
        from octave_tpu.serve import Predictor

        rng = np.random.default_rng(5)
        calib = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
        base = Predictor.initialize(image_hw=(64, 64), dtype=jnp.float32,
                                    fold_bn=False)
        y0 = base(calib[0])
        # dense bf16 is EXACT vs grouped
        d = Predictor(base.variables, dtype=jnp.float32, fold_bn=False,
                      dense_groups="decoder")
        np.testing.assert_allclose(d(calib[0]), y0, atol=1e-5)
        # dense + int8 within quantization tolerance
        q = Predictor(base.variables, dtype=jnp.float32, int8_decoder=True,
                      calibration_batches=calib, dense_groups="decoder")
        mad = float(np.mean(np.abs(q(calib[0]) - y0)))
        assert mad < 0.05, mad

    def test_int8_conv_transpose_native_and_einsum_lowerings(self):
        from octave_tpu.ops import common
        from octave_tpu.ops.common import conv_transpose_2x2

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(0, 1, (1, 4, 4, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.1, (8, 4, 2, 2)), jnp.float32)
        sx = float(jnp.max(jnp.abs(x))) / 127.0
        yf = conv_transpose_2x2(x, k, None)
        prev = common._CONV_TRANSPOSE_IMPL
        try:
            outs = []
            for impl in ("native", "einsum"):
                common.set_conv_transpose_impl(impl)
                outs.append(quant.int8_conv_transpose_2x2(x, k, None, sx))
        finally:
            common.set_conv_transpose_impl(prev)
        # both lowerings agree with each other and with fp within tolerance
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
        rel = float(jnp.linalg.norm(outs[0] - yf) / jnp.linalg.norm(yf))
        assert rel < 0.02, rel

    @pytest.mark.slow
    def test_int8_with_folded_bn(self):
        """The production config: folded BN + bf16 + int8 decoder."""
        from octave_tpu.serve import Predictor

        rng = np.random.default_rng(3)
        calib = [rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)]
        base = Predictor.initialize(image_hw=(64, 64), dtype=jnp.float32,
                                    fold_bn=False)
        q = Predictor(
            base.variables, dtype=jnp.float32, fold_bn=True,
            int8_decoder=True, calibration_batches=calib,
        )
        y_fp = base(calib[0])
        y_q = q(calib[0])
        mad = float(np.mean(np.abs(y_q - y_fp)))
        assert mad < 0.05, mad


class TestPrepack:
    def test_prepack_matches_per_call_op_level(self):
        """int8_conv with an offline-packed kernel is BIT-identical to the
        per-call weight-quantize path."""
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 16)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 24)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.1, (24,)), jnp.float32)
        sx = float(jnp.max(jnp.abs(x))) / 127.0
        y_percall = quant.int8_conv(x, w, b, sx, padding=[(1, 1), (1, 1)])
        kf = np.asarray(w, np.float32)
        ws = np.maximum(np.max(np.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.asarray(np.round(kf / ws).astype(np.int8))
        y_packed = quant.int8_conv(
            x, wq, b, quant.PackedScale(sx, ws), padding=[(1, 1), (1, 1)]
        )
        np.testing.assert_array_equal(np.asarray(y_percall), np.asarray(y_packed))

    @pytest.mark.slow
    def test_prepack_predictor_equivalent(self):
        """End-to-end: Predictor(int8_prepack=True) vs the per-call int8
        Predictor on the same weights (VERDICT r2 item 3: offline packing
        must be a pure graph simplification). The packed int8 KERNELS are
        bit-identical to the jitted quantize_weight expression prepack runs
        (verified below; an EAGER quantize_weight can flip single elements
        sitting exactly on a rounding boundary — XLA fuses kf*(1/ws)
        differently); the bf16 outputs agree to bf16 rounding —
        constant-folding the dequant multiplies reorders bf16 math, so
        exact-bit output equality across the two graphs is not a meaningful
        target. Masks must be identical."""
        from octave_tpu.serve import Predictor

        rng = np.random.default_rng(7)
        x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        base = Predictor.initialize(image_hw=(64, 64))
        kw = dict(
            num_classes=2, int8_decoder=True, calibration_batches=[x],
            dense_groups="decoder",
        )
        percall = Predictor(base.variables, int8_prepack=False, fold_bn=False, **kw)
        packed = Predictor(base.variables, int8_prepack=True, fold_bn=False, **kw)
        # every scale entry got packed, and kernels really are int8
        from flax.traverse_util import flatten_dict

        assert all(isinstance(v, quant.PackedScale)
                   for v in packed._quant_scales.values())
        flat_packed = flatten_dict(packed.variables["params"], sep="/")
        flat_percall = flatten_dict(percall.variables["params"], sep="/")
        n_int8 = 0
        for p, v in flat_packed.items():
            if v.dtype == np.int8:
                n_int8 += 1
                # bit-identical to the per-call quantization of this kernel
                # (same jitted expression prepack_weights traces)
                wq_ref, _ = jax.jit(quant.quantize_weight)(flat_percall[p])
                np.testing.assert_array_equal(np.asarray(wq_ref), np.asarray(v), err_msg=p)
        assert n_int8 >= 10, n_int8
        # packed variables must be COMMITTED device arrays: params ride
        # every jitted call as arguments, and a host-numpy leaf re-uploads
        # on each call (~70 MB over the relay link; measured 3.4 s/call,
        # benchmarks/serve_latency.json pre-fix)
        for p, v in flat_packed.items():
            assert isinstance(v, jax.Array), f"host leaf after prepack: {p}"
        y1, y2 = percall(x), packed(x)
        # probabilities within bf16 rounding — one bf16 ulp at p∈[0.5,1) is
        # 2^-9 ≈ 0.00195, so allow two ulps; hard masks identical
        np.testing.assert_allclose(y1, y2, atol=4e-3)
        np.testing.assert_array_equal(y1.argmax(-1), y2.argmax(-1))
