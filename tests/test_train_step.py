"""Integration: one fused weakly-supervised + adversarial train step runs,
losses are finite, all mutable state advances, and the supervised loss
decreases on a learnable synthetic task (SURVEY.md §4 integration tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octave_tpu.data.preprocess import mask_pyramid, mask_to_onehot, scribble_to_onehot
from octave_tpu.models.discriminator import DiscriminatorBlock
from octave_tpu.models.segmentor import ResnestUNet
from octave_tpu.train.schedule import make_optimizer, polynomial_decay
from octave_tpu.train.state import TrainState
from octave_tpu.train.steps import StepConfig, make_train_step


HW = 32


def _batch(rng, b=2, hw=HW):
    img = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (b, hw, hw)) > 0.6).astype(np.int32)
    scrib_map = np.where(rng.uniform(0, 1, (b, hw, hw)) < 0.3, mask + 1, 0)
    dense = mask_to_onehot(jnp.asarray(mask), 2)
    return {
        "image": jnp.asarray(img),
        "scribble_onehot": scribble_to_onehot(jnp.asarray(scrib_map), 2),
        "mask_onehot": dense,
        "mask_pyramid": mask_pyramid(dense, 4),
    }


@pytest.fixture(scope="module")
def setup():
    seg = ResnestUNet(num_classes=2)
    disc = DiscriminatorBlock(input_hw=(HW, HW), depth=4, num_filters=8)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    seg_vars = seg.init(key, batch["image"], True)
    disc_vars = disc.init(
        {"params": key, "noise": key}, list(batch["mask_pyramid"]), True
    )
    state = TrainState.create(
        seg_params=seg_vars["params"],
        disc_params=disc_vars["params"],
        batch_stats=seg_vars["batch_stats"],
        spectral=disc_vars["spectral"],
        seg_tx=make_optimizer(schedule=polynomial_decay(1e-3, decay_steps=100)),
        disc_tx=make_optimizer(1e-4),
        rng=jax.random.PRNGKey(7),
    )
    return seg, disc, state, batch


@pytest.mark.slow
class TestTrainStep:
    def test_adversarial_step(self, setup):
        seg, disc, state, batch = setup
        cfg = StepConfig(num_classes=2, use_discriminator=True, discriminator_depth=4)
        step = jax.jit(make_train_step(seg, disc, cfg))
        s1, losses = step(state, batch)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert {"loss_sup", "loss_ild", "loss_adv", "loss_disc", "loss_seg_total"} <= set(losses)
        assert int(s1.step) == 1

        # every mutable collection advanced
        def changed(a, b):
            return any(
                float(jnp.abs(x - y).max()) > 0 for x, y in
                zip(jax.tree.leaves(a), jax.tree.leaves(b))
            )

        assert changed(s1.seg_params, state.seg_params)
        assert changed(s1.disc_params, state.disc_params)
        assert changed(s1.batch_stats, state.batch_stats)
        assert changed(s1.spectral, state.spectral)
        assert not bool(jnp.all(s1.rng == state.rng))

        # second step runs from the new state (no recompile errors, finite)
        s2, losses2 = step(s1, batch)
        assert np.isfinite(float(losses2["loss_seg_total"]))

    def test_weak_supervision_learns(self, setup):
        """Config #4: WPCE+ILD only (no GAN) decreases on a fixed batch."""
        seg, _, state, batch = setup
        cfg = StepConfig(num_classes=2, use_discriminator=False, lambda_ild=0.1)
        step = jax.jit(make_train_step(seg, None, cfg))
        losses_hist = []
        s = state
        for _ in range(8):
            s, losses = step(s, batch)
            losses_hist.append(float(losses["loss_sup"]))
        assert losses_hist[-1] < losses_hist[0], losses_hist

    def test_dice_supervised_mode(self, setup):
        """weakly_supervise=False → DiceLoss fallback (octa.py:53-54)."""
        seg, _, state, batch = setup
        cfg = StepConfig(num_classes=2, weakly_supervise=False, use_discriminator=False,
                         lambda_ild=0.0)
        step = jax.jit(make_train_step(seg, None, cfg))
        batch = dict(batch, scribble_onehot=batch["mask_onehot"])
        _, losses = step(state, batch)
        assert 0.0 <= float(losses["loss_sup"]) <= 1.0


@pytest.mark.slow
class TestMultiStep:
    """make_multi_step(step, k) must be EXACTLY k sequential steps — it only
    changes how many steps ride one device dispatch, never the math."""

    def test_equivalent_to_sequential(self, setup):
        # SGD state, NOT the fixture's Adam: params must end linear in the
        # per-step grads, so the only sequential-vs-fused difference is XLA
        # reassociation noise (~1e-6). Under Adam the comparison is
        # structurally flaky: update = mu/(sqrt(nu)+eps) is ~sign(g) early,
        # so ~1e-7 reassociation deltas in near-zero grad elements flip
        # signs and move single params by O(lr) (measured 2.7e-4 on 2/2048
        # elements of one kernel) — Adam amplification, not a multi-step
        # defect. The fused-vs-sequential *mechanism* (state threading,
        # batch slicing, BN/spectral advance, loss averaging) is what this
        # test pins down.
        seg, disc, state0, batch = setup
        import optax

        state = TrainState.create(
            seg_params=state0.seg_params,
            disc_params=state0.disc_params,
            batch_stats=state0.batch_stats,
            spectral=state0.spectral,
            seg_tx=optax.sgd(1e-2),
            disc_tx=optax.sgd(1e-2),
            rng=jax.random.PRNGKey(7),
        )
        rng = np.random.default_rng(5)
        batches = [_batch(rng) for _ in range(3)]
        cfg = StepConfig(num_classes=2, use_discriminator=True,
                         discriminator_depth=4)
        step = jax.jit(make_train_step(seg, disc, cfg))
        from octave_tpu.train.steps import make_multi_step

        multi = jax.jit(make_multi_step(make_train_step(seg, disc, cfg), 3))

        s_seq = state
        seq_losses = []
        for b in batches:
            s_seq, losses = step(s_seq, b)
            seq_losses.append(losses)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        s_multi, m_losses = multi(state, stacked)

        assert int(s_multi.step) == int(s_seq.step) == 3
        for a, b_, name in (
            (s_multi.seg_params, s_seq.seg_params, "seg_params"),
            (s_multi.disc_params, s_seq.disc_params, "disc_params"),
            (s_multi.batch_stats, s_seq.batch_stats, "batch_stats"),
            (s_multi.spectral, s_seq.spectral, "spectral"),
        ):
            # not bit-exact: the k-step graph fuses/reassociates differently
            # than the 1-step graph; with SGD the drift stays at float noise
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b_)):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5,
                    err_msg=name,
                )
        want = {
            k: float(np.mean([float(l[k]) for l in seq_losses]))
            for k in seq_losses[0]
        }
        for k, v in want.items():
            np.testing.assert_allclose(float(m_losses[k]), v, rtol=1e-3,
                                       err_msg=k)

    def test_k1_is_identity(self, setup):
        from octave_tpu.train.steps import make_multi_step

        def f(s, b):
            return s, b

        assert make_multi_step(f, 1) is f


@pytest.mark.slow
def test_dense_groups_grad_exact_fp64():
    """The block-diagonal dense lowering's GRADIENTS are exact math: in
    float64 (reassociation noise ~1e-15), kernel and input grads of a
    grouped conv match the dense-lowered form to 1e-12 — the scatter
    transpose of `zeros.at[blocks].set(kernel)` drops exactly the off-block
    entries (models/resnest.py::groups_as_dense)."""
    from octave_tpu.models.resnest import Conv, groups_as_dense

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float64)
        conv = Conv(features=32, kernel_size=3, padding=1, groups=4)
        vs = conv.init(jax.random.PRNGKey(0), x)
        vs = jax.tree.map(lambda a: a.astype(jnp.float64), vs)

        def loss(params, x, dense):
            def f():
                y = conv.apply(params, x)
                return jnp.sum(jnp.sin(y))  # nonlinear → nontrivial cotangents

            if dense:
                with groups_as_dense():
                    return f()
            return f()

        g0 = jax.grad(loss, argnums=(0, 1))(vs, x, False)
        g1 = jax.grad(loss, argnums=(0, 1))(vs, x, True)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_dense_groups_step_equivalence(setup):
    """dense_groups='decoder' through the FULL train step: losses match to
    f32 tolerance and every gradient leaf agrees up to conv-reassociation
    noise (the lowering itself is proven exact in fp64 above; this checks
    the step wiring — context placement, remat interplay, transpose rules)."""
    seg, disc, state, batch = setup
    outs = {}
    for dg in (None, "decoder"):
        cfg = StepConfig(num_classes=2, use_discriminator=True,
                         discriminator_depth=4, dense_groups=dg)
        step = jax.jit(make_train_step(seg, disc, cfg))
        outs[dg] = step(state, batch)[1]
    for k in outs[None]:
        a, b = float(outs[None][k]), float(outs["decoder"][k])
        assert abs(a - b) <= 1e-3 * max(1.0, abs(a)), (k, a, b)


def test_einsum_groups_value_and_grad_exact_fp64():
    """The shifted-batched-matmul lowering of grouped convs
    (models/resnest.py::grouped_conv_einsum) is exact math: fp64 values and
    (kernel, input) grads match lax's feature_group_count conv to 1e-12
    across kernel size / stride / dilation / bias geometries."""
    from octave_tpu.models.resnest import Conv, groups_as_einsum

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(7)
        geoms = [  # (in_ch, feat, k, stride, pad, dil, groups, bias)
            (16, 32, 3, 1, 1, 1, 4, False),   # decoder splat shape
            (16, 32, 3, 2, 1, 1, 2, True),    # strided
            (12, 24, 3, 1, 2, 2, 2, False),   # dilated
            (16, 8, 1, 1, 0, 1, 2, True),     # 1x1 fc conv (SplAt attention)
        ]
        for cin, feat, k, s, p, d, g, bias in geoms:
            x = jnp.asarray(rng.standard_normal((2, 9, 9, cin)), jnp.float64)
            conv = Conv(features=feat, kernel_size=k, strides=s, padding=p,
                        dilation=d, groups=g, use_bias=bias)
            vs = jax.tree.map(lambda a: a.astype(jnp.float64),
                              conv.init(jax.random.PRNGKey(0), x))

            def loss(params, x, einsum):
                def f():
                    return jnp.sum(jnp.sin(conv.apply(params, x)))

                if einsum:
                    with groups_as_einsum():
                        return f()
                return f()

            for a, b in zip(
                jax.tree.leaves(jax.value_and_grad(loss, argnums=(0, 1))(vs, x, False)),
                jax.tree.leaves(jax.value_and_grad(loss, argnums=(0, 1))(vs, x, True)),
            ):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-12, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_einsum_groups_step_equivalence(setup):
    """einsum_groups='decoder+enc' through the FULL train step: losses agree
    with the grouped-conv baseline to f32 reassociation tolerance (the
    lowering is proven exact in fp64 above; this checks step wiring)."""
    seg, disc, state, batch = setup
    outs = {}
    for eg in (None, "decoder+enc"):
        cfg = StepConfig(num_classes=2, use_discriminator=True,
                         discriminator_depth=4, einsum_groups=eg)
        step = jax.jit(make_train_step(seg, disc, cfg))
        outs[eg] = step(state, batch)[1]
    for k in outs[None]:
        a, b = float(outs[None][k]), float(outs["decoder+enc"][k])
        # This checks WIRING (scope routing, remat interplay, transpose
        # rules) — a scoping bug produces O(0.1+) divergence. It cannot
        # check exactness at f32: the 9-tap einsum sum reorders every
        # grouped conv's accumulation and the drift amplifies through the
        # softmax-KLD ILD and the spectral-norm discriminator chain —
        # measured 1.8e-3 (loss_disc) to 2.8e-3 (loss_ild) varying with
        # the XLA CPU compile. Exactness is proven to 1e-12 in the fp64
        # test above; this tolerance is sized for the float noise.
        assert abs(a - b) <= 1e-2 * max(1.0, abs(a)), (k, a, b)


@pytest.mark.smoke
def test_einsum_groups_include_spec():
    """'enc' and '+'-combined scopes (models/resnest.py::dense_groups_include)."""
    from octave_tpu.models.resnest import dense_groups_include

    inc = dense_groups_include("decoder:234+enc")
    assert inc("decoder_2/splat/conv") and inc("decoder_4/splat/conv")
    assert not inc("decoder_0/splat/conv") and not inc("decoder_1/splat/conv")
    assert inc("backbone/layer3_2/splat/conv")
    enc = dense_groups_include("enc")
    assert enc("backbone/layer1_0/splat/conv")
    assert not enc("decoder_0/splat/conv")
    with pytest.raises(ValueError, match="dense_groups"):
        dense_groups_include("decoder:234+bogus")


@pytest.mark.smoke
def test_dense_groups_bad_value():
    seg = ResnestUNet(num_classes=2)
    with pytest.raises(ValueError, match="dense_groups"):
        make_train_step(seg, None, StepConfig(num_classes=2,
                                              use_discriminator=False,
                                              dense_groups="bogus"))


@pytest.mark.smoke
def test_dense_groups_include_spec():
    """The per-stage spec grammar (models/resnest.py::dense_groups_include):
    'decoder:<digits>' scopes dense lowering to the named decoder stages —
    the win is stage-dependent (benchmarks/grouped_conv_ab.json)."""
    from octave_tpu.models.resnest import dense_groups_include

    assert dense_groups_include("all") is None  # groups_as_dense: include-all
    inc = dense_groups_include("decoder")
    assert inc("decoder_3/splat/conv") and not inc("layer1/0/splat/conv")
    inc01 = dense_groups_include("decoder:01")
    assert inc01("decoder_0/splat/conv") and inc01("decoder_1/splat/conv")
    assert not inc01("decoder_2/splat/conv")
    for bad in ("decoder:", "decoder:x1", "bogus", ""):
        with pytest.raises(ValueError, match="dense_groups"):
            dense_groups_include(bad)


def test_eval_step(setup):
    from octave_tpu.train.steps import make_eval_step

    seg, _, state, batch = setup
    eval_step = jax.jit(make_eval_step(seg, 2))
    pred, metrics = eval_step(state.seg_params, state.batch_stats, batch)
    assert pred.shape == (2, HW, HW, 2)
    for k in ("dice", "iou", "auc", "accuracy", "sensitivity", "specificity"):
        v = float(metrics[k])
        assert 0.0 <= v <= 1.0, (k, v)


def test_moment_dtype_bf16():
    """make_optimizer(moment_dtype='bfloat16'): mu stored bf16, nu stays
    f32, and an update still produces finite f32 params."""
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.ones((4, 4), jnp.float32), "b": jnp.zeros((4,), jnp.float32)}
    tx = make_optimizer(1e-3, moment_dtype="bfloat16")
    opt_state = tx.init(params)
    mus = [l for l in jax.tree.leaves(opt_state) if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert len(mus) == 2, "expected the two mu leaves in bf16"
    f32s = [l for l in jax.tree.leaves(opt_state) if hasattr(l, "dtype") and l.dtype == jnp.float32]
    assert len(f32s) >= 2, "nu must stay f32"
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(new_params):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(leaf)))
