"""OctaScribbleNet: the OCTAve model facade (segmentor + discriminator +
loss bundle).

Re-designed from /root/reference/architectures/models/octa.py:14-60 with the
same constructor surface (including the `pretrian` typo kept as an accepted
alias). Two conscious fixes over the reference, both documented:
  * `forward` raises NotImplementedError in the reference (octa.py:59-60);
    here __call__ actually runs the paper's step — segmentor forward, and
    when a mask pyramid is supplied, both discriminator passes plus the full
    loss dictionary. This is the train step the README tells users to write
    themselves (reference README.md:28-36).
  * shapes are NHWC (TPU-native layout).

Input-shape arguments are (b, c, h, w) torch Sizes in the reference; we accept
either (b, c, h, w) or (b, h, w, c) and infer which by treating the smaller of
dims 1/3 as channels (images here are always ≥ 19px spatial).
"""
from __future__ import annotations

import warnings
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
from flax import linen as nn

from octave_tpu.losses.gan import ls_discriminator_loss, ls_generator_loss
from octave_tpu.losses.segmentor import dice_loss, weighted_partial_ce
from octave_tpu.models.discriminator import DiscriminatorBlock
from octave_tpu.models.segmentor import ResnestUNet


def _shape_chw(shape: Sequence[int]) -> Tuple[int, int, int]:
    """Normalize (b,c,h,w) or (b,h,w,c) to (c,h,w)."""
    _, a, b, c = shape
    if a <= c:  # NCHW
        return a, b, c
    return c, a, b  # NHWC


class OctaScribbleNet(nn.Module):
    """ScribbleNet facade (reference octa.py:14-57).

    Fields mirror the reference constructor kwargs and defaults 1:1.
    """

    raw_input_shape: Tuple[int, ...]
    mask_input_shape: Tuple[int, ...]
    is_training: bool = True
    num_classes: int = 2
    num_filters: int = 64
    instance_noise: bool = True
    label_noise: bool = True
    segmentor_gating_level: int = 4
    discriminator_depth: int = 4
    encoder_gating: bool = False
    weakly_supervise: bool = True
    bn_axis_name: Optional[str] = None

    def setup(self):
        mc, mh, mw = _shape_chw(self.mask_input_shape)
        if mc != self.num_classes:
            warnings.warn(
                "Number channels in mask input is not same as number of classes. "
                "Can cause an error when model discriminator is in use."
            )
        self.segmentor = ResnestUNet(
            num_classes=self.num_classes,
            gating_level=self.segmentor_gating_level,
            encoder_gating=self.encoder_gating,
            bn_axis_name=self.bn_axis_name,
            name="segmentor",
        )
        if self.discriminator_depth > 0:
            self.discriminator = DiscriminatorBlock(
                input_hw=(mh, mw),
                depth=self.discriminator_depth,
                num_filters=self.num_filters,
                instance_noise=self.instance_noise,
                label_noise=self.label_noise,
                name="discriminator",
            )

    def __call__(
        self,
        x: jax.Array,
        y: Optional[Sequence[jax.Array]] = None,
        train: Optional[bool] = None,
    ) -> Dict[str, Any]:
        """The combined weakly-supervised forward (the step the reference
        leaves to the user; wiring per reference octa.py:51-56 and SURVEY §3.5).

        x: (b,h,w,c) image. y: optional finest-first *real* mask pyramid for
        the discriminator (len = discriminator_depth + 1).
        Returns a dict with attentions/agg_map/latent and, when y is given
        and the discriminator exists, y_fake/y_real logits.
        """
        train = self.is_training if train is None else train
        out = self.segmentor(x, train)
        if self.encoder_gating:
            g_x, attentions, agg_map, latent = out
        else:
            attentions, agg_map, latent = out
            g_x = None

        result: Dict[str, Any] = {
            "attentions": attentions,
            "agg_map": agg_map,
            "latent": latent,
        }
        if g_x is not None:
            result["encoder_gates"] = g_x

        if self.discriminator_depth > 0 and y is not None:
            pyramid_fake = list(attentions[: self.discriminator_depth + 1])
            result["y_fake"] = self.discriminator(pyramid_fake, train)
            result["y_real"] = self.discriminator(list(y), train)
        return result

    # -- convenience passthroughs (API parity with the facade's members) ----
    def segment(self, x: jax.Array, method: str = "softmax", train: bool = False):
        return self.segmentor.predict(x, method, train)

    def discriminate(self, y: Sequence[jax.Array], train: bool = False):
        return self.discriminator(list(y), train)

    # -- loss bundle (reference octa.py:51-56) -------------------------------
    def supervised_loss(self, y_hat: jax.Array, ys: jax.Array, **kwargs) -> jax.Array:
        """WeightedPartialCE(manual=True) when weakly supervised, else Dice."""
        if self.weakly_supervise:
            return weighted_partial_ce(
                y_hat, ys, self.num_classes, manual=True,
                ignore_bg=kwargs.get("ignore_bg", False),
                reduction=kwargs.get("reduction", "mean"),
                full=kwargs.get("full", False),
            )
        return dice_loss(y_hat, ys)

    @staticmethod
    def discriminatorial_loss(y_real: jax.Array, y_fake: jax.Array) -> jax.Array:
        return ls_discriminator_loss(y_real, y_fake)

    @staticmethod
    def generator_loss(y_fake: jax.Array) -> jax.Array:
        return ls_generator_loss(y_fake)


def octa_scribble_net(
    raw_input_shape,
    mask_input_shape,
    is_training: bool,
    pretrian: bool = False,  # reference typo kept for API parity (octa.py:21)
    weight_path: str = "resnest50-528c19ca.pth",
    num_classes: int = 2,
    num_filters: int = 64,
    instance_noise: bool = True,
    label_noise: bool = True,
    segmentor_gating_level: int = 4,
    discriminator_depth: int = 4,
    encoder_gating: bool = False,
    weakly_supervise: bool = True,
    pretrain: Optional[bool] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[OctaScribbleNet, Optional[str]]:
    """Factory with the reference's exact constructor argument list
    (octa.py:16-29), including `pretrian`. Returns (module, weight_path or
    None) — weight loading is explicit in JAX (see
    octave_tpu/utils/torch_convert.py) rather than a constructor side effect.
    """
    use_pretrained = pretrain if pretrain is not None else pretrian
    model = OctaScribbleNet(
        raw_input_shape=tuple(raw_input_shape),
        mask_input_shape=tuple(mask_input_shape),
        is_training=is_training,
        num_classes=num_classes,
        num_filters=num_filters,
        instance_noise=instance_noise,
        label_noise=label_noise,
        segmentor_gating_level=segmentor_gating_level,
        discriminator_depth=discriminator_depth,
        encoder_gating=encoder_gating,
        weakly_supervise=weakly_supervise,
        bn_axis_name=bn_axis_name,
    )
    return model, (weight_path if use_pretrained else None)
