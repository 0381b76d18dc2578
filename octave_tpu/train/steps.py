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
    supervise_attention0: bool = False  # also apply the supervised loss to atts[0]
    remat: bool = False  # rematerialize the segmentor forward (memory ↔ FLOPs)
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16': MXU-native compute, fp32 master weights
    axis_name: Optional[str] = None


def _supervised(cfg: StepConfig, probs: jax.Array, target: jax.Array) -> jax.Array:
    if cfg.weakly_supervise:
        return weighted_partial_ce(
            probs, target, cfg.num_classes, manual=True, axis_name=cfg.axis_name
        )
    return dice_loss(probs, target)


def make_train_step(
    segmentor: ResnestUNet,
    discriminator: Optional[DiscriminatorBlock],
    cfg: StepConfig,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the fused GAN train step.

    batch dict: image (b,h,w,3), scribble_onehot (b,h,w,c), mask_pyramid
    (finest-first tuple, only when the discriminator is on).
    Wrap the result in jax.jit (single device) or shard_map (mesh) — see
    octave_tpu.parallel.
    """
    use_d = cfg.use_discriminator and discriminator is not None
    cdtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None

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
            return segmentor.apply(
                {"params": _cast(seg_params), "batch_stats": state.batch_stats},
                _cast(image),
                True,
                mutable=["batch_stats"],
            )

        if cfg.remat:
            # trade FLOPs for HBM: activations recomputed in the backward
            _seg_forward = jax.checkpoint(_seg_forward)

        def seg_loss_fn(seg_params):
            out, mut = _seg_forward(seg_params, batch["image"])
            attentions, agg_map, _ = out
            if cdtype is not None:
                # mixed precision: losses in fp32
                attentions = tuple(a.astype(jnp.float32) for a in attentions)
                agg_map = agg_map.astype(jnp.float32)
            probs = jax.nn.softmax(agg_map, axis=-1)
            l_sup = _supervised(cfg, probs, batch["scribble_onehot"])
            if cfg.supervise_attention0:
                l_sup = l_sup + _supervised(cfg, attentions[0], batch["scribble_onehot"])
            losses = {"loss_sup": l_sup}
            total = l_sup
            if cfg.lambda_ild > 0 and len(attentions) > 1:
                if cfg.ild_impl == "pooled" and cfg.ild_divergence == "KLD":
                    l_ild = interlayer_divergence_pooled(
                        attentions,
                        weights=list(cfg.ild_weights) if cfg.ild_weights else None,
                        stop_gradient=cfg.ild_stop_gradient,
                    )
                else:
                    l_ild = interlayer_divergence(
                        attentions,
                        weights=list(cfg.ild_weights) if cfg.ild_weights else None,
                        stop_gradient=cfg.ild_stop_gradient,
                        divergence=cfg.ild_divergence,
                    )
                losses["loss_ild"] = l_ild
                total = total + cfg.lambda_ild * l_ild
            if use_d:
                # generator phase: D in train mode; its power-iteration state
                # update is discarded here (the discriminator phase owns it)
                y_fake, _ = discriminator.apply(
                    {"params": _cast(state.disc_params), "spectral": state.spectral},
                    list(attentions[: cfg.discriminator_depth + 1]),
                    True,
                    rngs={"noise": r_g},
                    mutable=["spectral"],
                )
                l_adv = ls_generator_loss(y_fake)
                losses["loss_adv"] = l_adv
                total = total + cfg.lambda_adv * l_adv
            losses["loss_seg_total"] = total
            return total, (mut["batch_stats"], attentions, losses)

        (seg_loss, (new_stats, attentions, losses)), seg_grads = jax.value_and_grad(
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
            fake_pyramid = [
                jax.lax.stop_gradient(a)
                for a in attentions[: cfg.discriminator_depth + 1]
            ]

            def disc_loss_fn(d_params):
                y_fake, mut1 = discriminator.apply(
                    {"params": _cast(d_params), "spectral": state.spectral},
                    fake_pyramid,
                    True,
                    rngs={"noise": r_fake},
                    mutable=["spectral"],
                )
                y_real, mut2 = discriminator.apply(
                    {"params": _cast(d_params), "spectral": mut1["spectral"]},
                    list(batch["mask_pyramid"][: cfg.discriminator_depth + 1]),
                    True,
                    rngs={"noise": r_real},
                    mutable=["spectral"],
                )
                l_d = ls_discriminator_loss(y_real, y_fake)
                return l_d, mut2["spectral"]

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


def make_eval_step(segmentor: ResnestUNet, num_classes: int = 2):
    """Inference + metrics step (BASELINE.json configs #2-3): softmax
    prediction, vessel-channel probability vs dense GT."""
    from octave_tpu.utils.metrics import eval_step_metrics

    def eval_step(seg_params, batch_stats, batch):
        attentions, pred = segmentor.apply(
            {"params": seg_params, "batch_stats": batch_stats},
            batch["image"],
            "softmax",
            False,
            method=ResnestUNet.predict,
        )
        vessel_prob = pred[..., 1] if num_classes > 1 else pred[..., 0]
        target = batch["mask_onehot"][..., 1] if num_classes > 1 else batch["mask_onehot"][..., 0]
        metrics = eval_step_metrics(vessel_prob, target)
        return pred, metrics

    return eval_step


def make_eval_accumulate_step(segmentor: ResnestUNet, num_classes: int = 2,
                              threshold: float = 0.5):
    """Streaming eval: returns per-batch confusion counts + ROC histograms so
    the harness computes DATASET-level Dice/AUC (not a mean of per-batch
    values, which is biased for unequal batch difficulty)."""
    from octave_tpu.utils.metrics import AucAccumulator, ConfusionAccumulator

    def eval_step(seg_params, batch_stats, batch):
        _, pred = segmentor.apply(
            {"params": seg_params, "batch_stats": batch_stats},
            batch["image"],
            "softmax",
            False,
            method=ResnestUNet.predict,
        )
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
