"""The weakly-supervised adversarial train/eval steps as single XLA graphs.

Implements the step the reference implies but never ships (SURVEY.md §3.5;
reference octa.py:51-56 wires the losses, README.md:28-36 leaves the loop to
the user):

    atts, agg, _ = segmentor(x)
    L_seg = WPCE(softmax(agg), scribble) + λ_ild·ILD(atts) + λ_adv·G(D(atts))
    L_D   = LSGAN(D(real_pyramid), D(stop_grad(atts)))
    two optimizers step (segmentor / discriminator)

TPU-native design decisions:
  * both GAN phases compile into ONE jitted step — no Python between the
    generator and discriminator updates;
  * `stop_gradient` partitions the graph instead of two .backward() calls;
  * BN batch_stats update once (segmentor forward); spectral-norm u/v update
    in the discriminator phase (fake then real pass, matching the torch
    in-place power-iteration ordering of D(fake);D(real));
  * under a data mesh, gradients/losses are pmean'd over `axis_name` and BN
    runs cross-replica (the modules' bn_axis_name) — this is the DDP
    equivalent of the reference's implied Lightning/NCCL setup
    (reference requirements.txt:9).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from octave_tpu.losses.gan import ls_discriminator_loss, ls_generator_loss
from octave_tpu.losses.segmentor import (
    dice_loss,
    interlayer_divergence,
    interlayer_divergence_pooled,
    weighted_partial_ce,
)
from octave_tpu.models.discriminator import DiscriminatorBlock
from octave_tpu.models.segmentor import ResnestUNet
from octave_tpu.train.state import TrainState


def adapt_segmentor_output(out):
    """Normalize any segmentor family forward output to
    ``(pyramids, agg_maps)`` — tuples of attention pyramids (possibly empty)
    and per-head agg maps.

    Output shapes across the family (reference compose.py):
      * ResnestUNet                      → (atts, agg, x4)
      * ResnestUNet(encoder_gating=True) → (g_x, atts, agg, x4)  (4-tuple,
        segmentor.py:269-270; the gating heads feed the classification path,
        not the segmentation losses)
      * ResnestUnetParallelHead          → stacked (2, b, h, w, c) agg maps
      * ResnestUnetParallelHeadAttentionGate
                                         → ((atts, atts_c), stacked)
    """
    if isinstance(out, jax.Array) or hasattr(out, "shape"):
        # ParallelHead: stacked agg maps, no attention pyramid
        return (), tuple(out[i] for i in range(out.shape[0]))
    if len(out) == 2:
        # ParallelHeadAttentionGate: dual pyramids + stacked agg maps
        (atts, atts_c), stacked = out
        return (tuple(atts), tuple(atts_c)), tuple(
            stacked[i] for i in range(stacked.shape[0])
        )
    if len(out) == 4:
        # encoder_gating: (g_x, attentions, agg_map, latent)
        _, attentions, agg_map, _ = out
        return (tuple(attentions),), (agg_map,)
    attentions, agg_map, _ = out
    return (tuple(attentions),), (agg_map,)


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Loss wiring (defaults follow the reference facade, octa.py:51-56)."""

    num_classes: int = 2
    weakly_supervise: bool = True
    lambda_ild: float = 1.0
    lambda_adv: float = 1.0
    ild_weights: Optional[Tuple[float, ...]] = None
    ild_stop_gradient: bool = False
    ild_divergence: str = "KLD"
    ild_impl: str = "pooled"  # 'pooled' (bandwidth-optimal, exact for integer scales) | 'resize'
    use_discriminator: bool = True
    discriminator_depth: int = 4
    # depth of the second ("c" / thin-branch) discriminator for the
    # ParallelHeadAttentionGate dual pyramid (its c pyramid has at most 2
    # levels — gates at decoder depths 1 and 0, segmentor.py:480-483)
    discriminator_depth_c: int = 1
    supervise_attention0: bool = False  # also apply the supervised loss to atts[0]
    # rematerialization of the segmentor forward (memory ↔ FLOPs):
    #   False   — save everything XLA wants (fastest, most HBM)
    #   True    — one checkpoint region over the whole forward. Measured to
    #             be nearly useless: the backward recomputes the entire
    #             forward and holds every intermediate at once (15.26 →
    #             14.48 GB temps at B=64/304², train_scaling.json)
    #   'block' — block-granular: the MODEL must be built with
    #             remat_blocks=True (each Bottleneck / decoder stage is its
    #             own region, only inter-block residuals stay live); the
    #             step itself adds no outer checkpoint. The Trainer wires
    #             this automatically from config train.remat='block'.
    #   'block-enc' — backbone Bottlenecks only; decoder activations stay
    #             saved (skips the decoder forward recompute in the
    #             backward at ~5 GB extra HBM @ B=128/304²)
    #   'block:<idx>' — backbone Bottlenecks + exactly the decoder stages
    #             named by the digit string (e.g. 'block:012' remats stages
    #             0-2; stages 3-4 stay saved). Stage i runs at (H/2^i)²
    #             spatial, so leaving the LOW-res stages un-remated skips
    #             their recompute at small HBM cost — measured best at
    #             B=128/304²: 'block:012' k=2 → 190.6 img/s vs 184.8 for
    #             'block' (train_scaling.json)
    #   'conv'  — selective: one region saving exactly the conv outputs
    #             (checkpoint_name anchors in models/resnest.py). Crashes
    #             the v5e relay compiler at every batch size (recorded in
    #             train_scaling.json) — kept for reproduction only.
    remat: object = False
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16': MXU-native compute, fp32 master weights
    # None | 'decoder' | 'decoder:<digits>' | 'all' — lower grouped convs to
    # block-diagonal DENSE
    # convs in the train graph (models/resnest.py::groups_as_dense; exact
    # math, identical param tree, and the transpose/grad convs lower dense
    # too). The decoder splat convs run groups=4 with 16-32 channels per
    # group — far below the MXU's 128-lane tiling; dense does 4x the FLOPs
    # at full MXU rate on these bandwidth-bound stages (the inference-side
    # win was +11% composed with int8, docs/architecture.md).
    dense_groups: Optional[str] = None
    # None | same spec grammar as dense_groups (plus 'enc' / '+'-combos) —
    # lower grouped convs to kh*kw shifted batched MATMULS instead
    # (models/resnest.py::grouped_conv_einsum): exact grouped FLOPs, fwd and
    # both backward passes become plain batched dots the MXU tiles directly,
    # and the generated-code footprint shrinks vs the windowed conv loops
    # (the relay compile-helper constraint, train_scaling.json HTTP-500
    # rows). Scopes given to both knobs must not overlap; einsum wins.
    einsum_groups: Optional[str] = None
    axis_name: Optional[str] = None


def _supervised(cfg: StepConfig, probs: jax.Array, target: jax.Array) -> jax.Array:
    if cfg.weakly_supervise:
        return weighted_partial_ce(
            probs, target, cfg.num_classes, manual=True, axis_name=cfg.axis_name
        )
    return dice_loss(probs, target)


def make_train_step(
    segmentor,
    discriminator,
    cfg: StepConfig,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the fused GAN train step for ANY segmentor-family model.

    `segmentor` may be any of the three reference segmentor classes (or an
    equivalent module); its forward output is normalized by
    `adapt_segmentor_output`, so `encoder_gating=True` and the dual-decoder
    ParallelHead variants train through the same step.

    `discriminator` is None, a single DiscriminatorBlock (judging the main
    attention pyramid), or a dict like ``{"main": block, "c": block}`` for
    the ParallelHeadAttentionGate dual pyramids — then `state.disc_params` /
    `state.spectral` carry the same dict structure and one optimizer steps
    the combined tree.

    batch dict: image (b,h,w,3), scribble_onehot (b,h,w,c), optional
    scribble_onehot_c (second-head target, defaults to scribble_onehot),
    mask_pyramid (finest-first tuple, only when a discriminator is on).
    Wrap the result in jax.jit (single device) or shard_map (mesh) — see
    octave_tpu.parallel.
    """
    if isinstance(discriminator, dict):
        disc_items = [(k, d) for k, d in discriminator.items() if d is not None]
        multi_d = True
    elif discriminator is not None:
        disc_items = [("main", discriminator)]
        multi_d = False
    else:
        disc_items, multi_d = [], False
    # which pyramid / real-branch depth each discriminator judges
    d_pyr_idx = {"main": 0, "c": 1}
    d_depth = {"main": cfg.discriminator_depth, "c": cfg.discriminator_depth_c}

    def _dget(tree, name):
        return tree[name] if multi_d else tree

    def _dset(tree, name, val):
        return {**tree, name: val} if multi_d else val

    use_d = cfg.use_discriminator and bool(disc_items)
    cdtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None

    if cfg.dense_groups is not None or cfg.einsum_groups is not None:
        import contextlib

        from octave_tpu.models.resnest import (dense_groups_include,
                                               groups_as_dense,
                                               groups_as_einsum)

        _inc_d = (dense_groups_include(cfg.dense_groups)
                  if cfg.dense_groups is not None else False)
        _inc_e = (dense_groups_include(cfg.einsum_groups)
                  if cfg.einsum_groups is not None else False)

        def _dense_ctx():
            # trace-time switches: active while the step traces
            # (thread-local, models/resnest.py); cached executions are
            # unaffected
            stack = contextlib.ExitStack()
            if _inc_d is not False:
                stack.enter_context(groups_as_dense(_inc_d))
            if _inc_e is not False:
                stack.enter_context(groups_as_einsum(_inc_e))
            return stack
    else:
        import contextlib

        _dense_ctx = contextlib.nullcontext

    def _cast(tree):
        if cdtype is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(cdtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    def train_step(state: TrainState, batch: Dict[str, Any]):
        rng, r_g, r_fake, r_real = jax.random.split(state.rng, 4)
        if cfg.axis_name is not None:
            # independent noise draws per data shard (the DDP-faithful
            # behavior: each process draws its own instance/label noise)
            idx = jax.lax.axis_index(cfg.axis_name)
            r_g, r_fake, r_real = (
                jax.random.fold_in(r, idx) for r in (r_g, r_fake, r_real)
            )

        def _seg_forward(seg_params, image):
            # mixed precision: cast INSIDE the differentiated fn so grads come
            # back fp32 through the cast-transpose (fp32 master weights)
            with _dense_ctx():
                return segmentor.apply(
                    {"params": _cast(seg_params), "batch_stats": state.batch_stats},
                    _cast(image),
                    True,
                    mutable=["batch_stats"],
                )

        if cfg.remat == "conv":
            # selective remat: keep conv outputs, recompute everything else
            _seg_forward = jax.checkpoint(
                _seg_forward,
                policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
            )
        elif isinstance(cfg.remat, str) and cfg.remat.startswith("block"):
            # 'block' / 'block-enc' / 'block:<idx>' / '...+conv': the
            # segmentor itself was built with remat_blocks (and optionally
            # remat_save_convs) set — the step adds no outer checkpoint
            pass
        elif cfg.remat:
            # full remat: trade FLOPs for HBM — the whole forward is
            # recomputed in the backward
            _seg_forward = jax.checkpoint(_seg_forward)

        def seg_loss_fn(seg_params):
            out, mut = _seg_forward(seg_params, batch["image"])
            # native-dtype pyramids (bf16 under mixed precision) feed the
            # DISCRIMINATOR — running the critic in f32 doubles its HBM
            # residuals and halves its MXU rate for no accuracy benefit
            # (only the scalar GAN losses need f32)
            pyramids_native, agg_maps = adapt_segmentor_output(out)
            pyramids = pyramids_native
            if cdtype is not None:
                # mixed precision: segmentation losses in fp32
                pyramids = tuple(
                    tuple(a.astype(jnp.float32) for a in p) for p in pyramids_native
                )
                agg_maps = tuple(a.astype(jnp.float32) for a in agg_maps)
            # per-head supervised loss: head 0 ← scribble_onehot, further
            # heads ← scribble_onehot_c (the ROSE thin-branch target) when
            # the batch carries one, else the same scribbles
            target_c = batch.get("scribble_onehot_c", batch["scribble_onehot"])
            l_sup = jnp.zeros((), jnp.float32)
            for head, agg_map in enumerate(agg_maps):
                probs = jax.nn.softmax(agg_map, axis=-1)
                tgt = batch["scribble_onehot"] if head == 0 else target_c
                l_sup = l_sup + _supervised(cfg, probs, tgt)
            if cfg.supervise_attention0 and pyramids:
                l_sup = l_sup + _supervised(
                    cfg, pyramids[0][0], batch["scribble_onehot"]
                )
            losses = {"loss_sup": l_sup}
            total = l_sup
            if cfg.lambda_ild > 0 and any(len(p) > 1 for p in pyramids):
                l_ild = sum(
                    (
                        interlayer_divergence_pooled(
                            p,
                            weights=list(cfg.ild_weights) if cfg.ild_weights else None,
                            stop_gradient=cfg.ild_stop_gradient,
                        )
                        if cfg.ild_impl == "pooled" and cfg.ild_divergence == "KLD"
                        else interlayer_divergence(
                            p,
                            weights=list(cfg.ild_weights) if cfg.ild_weights else None,
                            stop_gradient=cfg.ild_stop_gradient,
                            divergence=cfg.ild_divergence,
                        )
                    )
                    for p in pyramids
                    if len(p) > 1
                )
                losses["loss_ild"] = l_ild
                total = total + cfg.lambda_ild * l_ild
            if use_d:
                # generator phase: D in train mode; its power-iteration state
                # update is discarded here (the discriminator phase owns it)
                l_adv = jnp.zeros((), jnp.float32)
                for di, (name, d) in enumerate(disc_items):
                    pyr = pyramids_native[d_pyr_idx[name]][: d_depth[name] + 1]
                    y_fake, _ = d.apply(
                        {
                            "params": _cast(_dget(state.disc_params, name)),
                            "spectral": _dget(state.spectral, name),
                        },
                        list(pyr),
                        True,
                        rngs={"noise": jax.random.fold_in(r_g, di)},
                        mutable=["spectral"],
                    )
                    l_adv = l_adv + ls_generator_loss(y_fake.astype(jnp.float32))
                losses["loss_adv"] = l_adv
                total = total + cfg.lambda_adv * l_adv
            losses["loss_seg_total"] = total
            return total, (mut["batch_stats"], pyramids_native, losses)

        (seg_loss, (new_stats, pyramids, losses)), seg_grads = jax.value_and_grad(
            seg_loss_fn, has_aux=True
        )(state.seg_params)

        if cfg.axis_name is not None:
            seg_grads = jax.lax.pmean(seg_grads, cfg.axis_name)
            losses = jax.lax.pmean(losses, cfg.axis_name)

        seg_updates, seg_opt_state = state.seg_tx.update(
            seg_grads, state.seg_opt_state, state.seg_params
        )
        seg_params = optax.apply_updates(state.seg_params, seg_updates)

        disc_params = state.disc_params
        disc_opt_state = state.disc_opt_state
        spectral = state.spectral
        if use_d:
            fake_pyrs = {
                name: [
                    jax.lax.stop_gradient(a)
                    for a in pyramids[d_pyr_idx[name]][: d_depth[name] + 1]
                ]
                for name, _ in disc_items
            }

            def disc_loss_fn(d_params):
                l_d = jnp.zeros((), jnp.float32)
                new_spec = state.spectral
                for di, (name, d) in enumerate(disc_items):
                    y_fake, mut1 = d.apply(
                        {
                            "params": _cast(_dget(d_params, name)),
                            "spectral": _dget(new_spec, name),
                        },
                        fake_pyrs[name],
                        True,
                        rngs={"noise": jax.random.fold_in(r_fake, di)},
                        mutable=["spectral"],
                    )
                    y_real, mut2 = d.apply(
                        {
                            "params": _cast(_dget(d_params, name)),
                            "spectral": mut1["spectral"],
                        },
                        [_cast(p) for p in batch["mask_pyramid"][: d_depth[name] + 1]],
                        True,
                        rngs={"noise": jax.random.fold_in(r_real, di)},
                        mutable=["spectral"],
                    )
                    l_d = l_d + ls_discriminator_loss(
                        y_real.astype(jnp.float32), y_fake.astype(jnp.float32)
                    )
                    new_spec = _dset(new_spec, name, mut2["spectral"])
                return l_d, new_spec

            (d_loss, spectral), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params)
            if cfg.axis_name is not None:
                d_grads = jax.lax.pmean(d_grads, cfg.axis_name)
                d_loss = jax.lax.pmean(d_loss, cfg.axis_name)
            d_updates, disc_opt_state = state.disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)
            losses["loss_disc"] = d_loss

        new_state = state.replace(
            step=state.step + 1,
            seg_params=seg_params,
            disc_params=disc_params,
            batch_stats=new_stats,
            spectral=spectral,
            seg_opt_state=seg_opt_state,
            disc_opt_state=disc_opt_state,
            rng=rng,
        )
        return new_state, losses

    return train_step


def make_multi_step(train_step, k: int):
    """Chain ``k`` sequential train steps into ONE device dispatch.

    Profiling the B=128/304² block-remat step on the v5e relay shows 648.6
    ms/step of device-op time inside a 764.7 ms/step wall — ~116 ms/step
    (15%) is per-dispatch overhead and inter-dispatch scheduling gaps
    (benchmarks/profile_train.txt). Serving amortizes the same overhead by
    aggregating batches per dispatch (serve.predict_many); training
    amortizes it by unrolling k steps into one jitted call. NOT lax.scan —
    a conv-heavy scan body lowers ~10x slower on this relay (the loop body
    gets conservative layouts; docs/architecture.md round-2 measurements).

    The k steps are data-dependent through ``state``, so XLA cannot
    interleave their compute and peak HBM stays that of a single step
    (memory_analysis recorded in train_scaling.json).

    ``batches`` must be a pytree whose leaves carry a leading ``(k, ...)``
    axis (a stack of k per-step batch dicts). Returns ``(state, losses)``
    with each loss averaged over the k steps (the Trainer's logging window
    mean is unchanged).
    """
    if k <= 1:
        return train_step

    def multi_step(state, batches):
        acc = None
        for i in range(k):
            b = jax.tree.map(lambda x: x[i], batches)
            state, losses = train_step(state, b)
            acc = losses if acc is None else jax.tree.map(jnp.add, acc, losses)
        return state, jax.tree.map(lambda x: x / k, acc)

    return multi_step


def _eval_forward(segmentor, seg_params, batch_stats, image):
    """predict('softmax') semantics for any segmentor-family model; for the
    dual-decoder variants, the MAIN head (index 0, the thick/full-vessel
    branch) is the one scored against the dense GT."""
    out = segmentor.apply(
        {"params": seg_params, "batch_stats": batch_stats}, image, False
    )
    _, agg_maps = adapt_segmentor_output(out)
    return jax.nn.softmax(agg_maps[0], axis=-1)


def make_eval_step(segmentor, num_classes: int = 2):
    """Inference + metrics step (BASELINE.json configs #2-3): softmax
    prediction, vessel-channel probability vs dense GT."""
    from octave_tpu.utils.metrics import eval_step_metrics

    def eval_step(seg_params, batch_stats, batch):
        pred = _eval_forward(segmentor, seg_params, batch_stats, batch["image"])
        vessel_prob = pred[..., 1] if num_classes > 1 else pred[..., 0]
        target = batch["mask_onehot"][..., 1] if num_classes > 1 else batch["mask_onehot"][..., 0]
        metrics = eval_step_metrics(vessel_prob, target)
        return pred, metrics

    return eval_step


def make_eval_accumulate_step(segmentor, num_classes: int = 2,
                              threshold: float = 0.5):
    """Streaming eval: returns per-batch confusion counts + ROC histograms so
    the harness computes DATASET-level Dice/AUC (not a mean of per-batch
    values, which is biased for unequal batch difficulty)."""
    from octave_tpu.utils.metrics import AucAccumulator, ConfusionAccumulator

    def eval_step(seg_params, batch_stats, batch):
        pred = _eval_forward(segmentor, seg_params, batch_stats, batch["image"])
        vessel_prob = pred[..., 1] if num_classes > 1 else pred[..., 0]
        target = batch["mask_onehot"][..., 1] if num_classes > 1 else batch["mask_onehot"][..., 0]
        hard = (vessel_prob >= threshold).astype(jnp.float32)
        # optional per-sample validity weight: 0 for tail-batch padding
        # samples added so mesh shards stay equal-sized (they must not
        # contribute to dataset-level counts)
        weight = batch.get("sample_weight")
        conf = ConfusionAccumulator.empty().update(hard, target, weight)
        auc = AucAccumulator.empty().update(vessel_prob, target, weight)
        return pred, conf, auc

    return eval_step
