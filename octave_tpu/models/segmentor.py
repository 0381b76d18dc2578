"""OCTAve segmentor family: attention-gated ResNeSt U-Nets (TPU-native).

Re-designed from /root/reference/architectures/segmentor/compose.py and
blocks.py:12-46 as NHWC Flax modules. All tensors are NHWC; the attention
pyramid is returned finest-first exactly like the reference
(compose.py:183-187).

Parity map:
  * AdversarialAttentionGate    blocks.py:12-46    → AdversarialAttentionGate
  * ResnestUNet                 compose.py:12-230  → ResnestUNet
  * ResnestUnetParallelHead     compose.py:233-362 → ResnestUnetParallelHead
  * ResnestUnetParallelHeadAttentionGate
                                compose.py:365-527 → ResnestUnetParallelHeadAttentionGate

The odd-size pad/crop dance on x_3 (compose.py:125-147) is static here: input
sizes are compile-time constants under jit, so the pad decision resolves at
trace time (both 304² → 19 and 400² → 25 hit it).
"""
from __future__ import annotations

from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from octave_tpu.models.resnest import (
    Conv,
    ResNeSt,
    ResNestDecoder,
    Upsampling,
    resnest50,
)
from octave_tpu.ops.common import adaptive_avg_pool2d
from octave_tpu.ops.norm import BatchNorm


class _AAGLeaf(nn.Module):
    """Parameter-only leaf reproducing nn.Conv's {kernel, bias} naming."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        from octave_tpu.ops.common import kaiming_uniform_torch, torch_conv_bias_init

        k = self.param("kernel", kaiming_uniform_torch(), (1, 1, self.in_ch, self.out_ch))
        b = self.param("bias", torch_conv_bias_init(self.in_ch), (self.out_ch,))
        return k, b


class _AAGParams(nn.Module):
    """Holder matching the Conv wrapper's extra 'conv' level in the path."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return _AAGLeaf(self.in_ch, self.out_ch, name="conv")()


class AdversarialAttentionGate(nn.Module):
    """AAG (blocks.py:12-46): 1x1 conv → per-pixel softmax over classes →
    attention mask = sum of non-background channels → hadamard with input.

    Returns (masked_x, y_hat). With use_pallas=True the whole gate runs as
    one fused VMEM-resident kernel (octave_tpu/ops/pallas/aag.py) — one read
    of x instead of four HBM round trips."""

    in_channels: int
    out_channels: int
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: Optional[jax.Array] = None, return_params: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        if return_params:
            # hand the gate's (kernel, bias) to a caller that fuses the gate
            # into a larger kernel (the decoder-epilogue path); same
            # parameter tree as the Conv path
            k, b = _AAGParams(self.in_channels, self.out_channels, name="conv1")()
            return k.reshape(self.in_channels, self.out_channels), b
        if self.use_pallas:
            from octave_tpu.ops.pallas.aag import fused_aag

            # identical parameter tree to the Conv path (conv1/conv/{kernel,
            # bias}) so checkpoints and the torch converter are oblivious to
            # the flag
            k, b = _AAGParams(self.in_channels, self.out_channels, name="conv1")()
            return fused_aag(x, k.reshape(self.in_channels, self.out_channels), b)
        x_prime = Conv(self.out_channels, 1, 1, 0, name="conv1")(x)
        y_hat = jax.nn.softmax(x_prime, axis=-1)
        attention_mask = jnp.sum(y_hat[..., 1:], axis=-1, keepdims=True)
        return x * attention_mask, y_hat


class _EncoderGate(nn.Module):
    """Optional per-encoder-level softmax gating head (compose.py:28-37)."""

    out_channels: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = Conv(self.out_channels, 1, 1, 0, name="conv")(x)
        return jax.nn.softmax(g, axis=-1)


def _decoder_cls_factory(remat_blocks, save_convs: bool):
    """Per-stage decoder remat selector shared by all segmentor variants.

    remat_blocks True → every stage remated; a set/tuple of indices → only
    those stages (the backbone handles its own gating). save_convs adds a
    jax.checkpoint policy saving the 'conv_out' anchors, so the backward of
    a remated stage recomputes only elementwise/norm ops, never a conv."""
    kw = {}
    if save_convs:
        kw["policy"] = jax.checkpoint_policies.save_only_these_names("conv_out")

    def dec_cls(i):
        r = remat_blocks
        if r is True or (isinstance(r, (tuple, list, set, frozenset))
                         and i in r):
            return nn.remat(ResNestDecoder, static_argnums=(2,), **kw)
        return ResNestDecoder

    return dec_cls


def _pad_odd(x: jax.Array) -> Tuple[jax.Array, bool, bool]:
    """Static pad of odd H/W to even (compose.py:125-130)."""
    down = x.shape[1] % 2 == 1
    right = x.shape[2] % 2 == 1
    if down:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
    if right:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return x, down, right


def _crop_pad(d: jax.Array, down: bool, right: bool) -> jax.Array:
    """Crop the pad back off after the skip concat (compose.py:142-147)."""
    if down and not right:
        return d[:, :-1, :, :]
    if right and not down:
        return d[:, :, :-1, :]
    if down and right:
        return d[:, :-1, :-1, :]
    return d


def apply_prediction_method(agg_map: jax.Array, method: str, axis: int = -1) -> jax.Array:
    """The predict() post-processing switch (compose.py:189-199)."""
    if method == "softmax":
        return jax.nn.softmax(agg_map, axis=axis)
    if method == "sigmoid":
        return jax.nn.sigmoid(agg_map)
    if method == "one-hot":
        c = agg_map.shape[axis]
        return jax.nn.one_hot(jnp.argmax(agg_map, axis=axis), c, axis=axis, dtype=agg_map.dtype)
    if method == "original":
        return agg_map
    raise ValueError(f"Unknown prediction method: {method}")


class ResnestUNet(nn.Module):
    """ResNeSt-50 encoder + attention-gated U-Net decoder (compose.py:12-230).

    Channel schedule — encoder taps 64/256/512/1024/2048, decoder
    1024/512/256/64/32, final 1x1 conv 32 → num_classes.
    `pretrain`/`weight_path` are handled by the checkpoint tooling
    (octave_tpu/utils/torch_convert.py), not the module.
    """

    num_classes: int
    gating_level: int = 4
    encoder_gating: bool = False
    bn_axis_name: Optional[str] = None
    use_pallas_aag: bool = False
    # eval-only: run each gated decoder block's tail (radix apply + residual
    # + ReLUs + AAG) as one fused Pallas pass (ops/pallas/decoder_epilogue).
    # Parameter tree is identical, so checkpoints/converters are oblivious.
    use_fused_decoder: bool = False
    # block-granular remat (StepConfig.remat='block'): every backbone
    # Bottleneck and every decoder stage is its own checkpoint region; the
    # parameter tree is unchanged (nn.remat is a lifted transform).
    # 'encoder' (StepConfig.remat='block-enc') remats the backbone only.
    remat_blocks: object = False
    # with remat_blocks: each region saves its conv outputs ('conv_out'
    # checkpoint_name anchors), so the backward recomputes only the cheap
    # elementwise/norm chain between convs, never a convolution
    # (StepConfig.remat='block+conv' / 'block:<idx>+conv')
    remat_save_convs: bool = False
    # with remat_blocks: which encoder layers (1-based 1..4) stay remated;
    # True = all. StepConfig.remat='block:<dec>e<enc>' — see
    # models/resnest.py::ResNeSt.remat_layers
    remat_enc_layers: object = True

    def setup(self):
        ax = self.bn_axis_name
        self.backbone = ResNeSt(config=resnest50().config, bn_axis_name=ax,
                                remat_blocks=self.remat_blocks,
                                remat_save_convs=self.remat_save_convs,
                                remat_layers=self.remat_enc_layers,
                                name="backbone")
        # remat_blocks=True remats encoder Bottlenecks AND decoder stages;
        # 'encoder' remats only the backbone (decoder activations stay
        # saved — trades ~5 GB HBM at B=128/304^2 for skipping the decoder
        # forward recompute in the backward); a set/tuple of indices remats
        # exactly those decoder stages (encoder always remated) — stage i
        # runs at (304/2^i)^2 spatial, so high-res stages are the HBM-
        # expensive ones to leave un-remated
        dec_cls = _decoder_cls_factory(self.remat_blocks, self.remat_save_convs)

        if self.encoder_gating:
            self.encoder_0_gate = _EncoderGate(name="encoder_0_gate")
            self.encoder_1_gate = _EncoderGate(name="encoder_1_gate")
            self.encoder_2_gate = _EncoderGate(name="encoder_2_gate")
            self.encoder_3_gate = _EncoderGate(name="encoder_3_gate")
            self.encoder_4_gate = _EncoderGate(name="encoder_4_gate")

        self.upsampling_0 = Upsampling(64, 64, name="upsampling_0")
        self.decoder_0 = dec_cls(0)(64, 32, bn_axis_name=ax, name="decoder_0")
        self.aag_0 = AdversarialAttentionGate(32, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_0")

        self.upsampling_1 = Upsampling(256, 64, name="upsampling_1")
        self.decoder_1 = dec_cls(1)(128, 64, bn_axis_name=ax, name="decoder_1")
        self.aag_1 = AdversarialAttentionGate(64, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_1")

        self.upsampling_2 = Upsampling(512, 256, name="upsampling_2")
        self.decoder_2 = dec_cls(2)(512, 256, bn_axis_name=ax, name="decoder_2")
        self.aag_2 = AdversarialAttentionGate(256, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_2")

        self.upsampling_3 = Upsampling(1024, 512, name="upsampling_3")
        self.decoder_3 = dec_cls(3)(1024, 512, bn_axis_name=ax, name="decoder_3")
        self.aag_3 = AdversarialAttentionGate(512, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_3")

        self.upsampling_4 = Upsampling(2048, 1024, name="upsampling_4")
        self.decoder_4 = dec_cls(4)(2048, 1024, bn_axis_name=ax, name="decoder_4")
        self.aag_4 = AdversarialAttentionGate(1024, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_4")

        self.fc = Conv(self.num_classes, 1, 1, 0, name="fc")

        # Classification heads (compose.py:82-98)
        self.linear_head_emb = nn.Dense(self.num_classes, name="linear_head_emb")
        self.head_dec_conv1 = Conv(64, 7, 1, 0, name="head_dec_conv1")
        self.head_dec_bn1 = BatchNorm(64, axis_name=ax, name="head_dec_bn1")
        self.head_dec_conv2 = Conv(512, 7, 1, 0, name="head_dec_conv2")
        self.head_dec_bn2 = BatchNorm(512, axis_name=ax, name="head_dec_bn2")
        self.linear_head_dec = nn.Dense(self.num_classes, name="linear_head_dec")

    def __call__(self, x: jax.Array, train: bool = False):
        """Forward (compose.py:100-187).

        Returns (attentions finest-first, agg_map, x_4) — or with
        encoder_gating, (g_x, attentions, agg_map, x_4)."""
        bb = self.backbone
        x_0_0 = bb.stem(x, train)
        x_0_1 = bb.maxpool(x_0_0)

        g_x = []
        if self.encoder_gating:
            g_x.append(self.encoder_0_gate(x_0_1))
        x_1 = bb.layer1(x_0_1, train)
        if self.encoder_gating:
            g_x.append(self.encoder_1_gate(x_1))
        x_2 = bb.layer2(x_1, train)
        if self.encoder_gating:
            g_x.append(self.encoder_2_gate(x_2))
        x_3 = bb.layer3(x_2, train)
        if self.encoder_gating:
            g_x.append(self.encoder_3_gate(x_3))

        x_3, down_padding, right_padding = _pad_odd(x_3)
        x_4 = bb.layer4(x_3, train)
        if self.encoder_gating:
            g_x.append(self.encoder_4_gate(x_4))

        attentions = []
        fuse = self.use_fused_decoder and not train

        def stage(depth, decoder, aag, inp):
            """One decoder stage: plain decoder + AAG, or — when fusing and
            this depth is gated — the decoder's fused tail which performs the
            AAG inside the same Pallas pass."""
            gated = self.gating_level >= depth
            if fuse and gated:
                d, y = decoder(inp, train, aag_kb=aag(return_params=True))
                attentions.append(y)
                return d
            d = decoder(inp, train)
            if gated:
                d, y = aag(d)
                attentions.append(y)
            return d

        # skip-concats are passed as (skip, up) PAIRS: the decoder's first
        # convs split their kernels along input channels instead of reading a
        # materialized concat (exact math — conv is linear in channels)
        d_4 = self.upsampling_4(x_4)
        d_4 = stage(4, self.decoder_4, self.aag_4,
                    (_crop_pad(x_3, down_padding, right_padding),
                     _crop_pad(d_4, down_padding, right_padding)))

        d_3 = stage(3, self.decoder_3, self.aag_3, (x_2, self.upsampling_3(d_4)))
        d_2 = stage(2, self.decoder_2, self.aag_2, (x_1, self.upsampling_2(d_3)))
        d_1 = stage(1, self.decoder_1, self.aag_1, (x_0_0, self.upsampling_1(d_2)))
        # depth 0: no skip (compose.py:175-176)
        d_0 = stage(0, self.decoder_0, self.aag_0, self.upsampling_0(d_1))

        agg_map = self.fc(d_0)
        attentions.reverse()

        if self.encoder_gating:
            return tuple(g_x), tuple(attentions), agg_map, x_4
        return tuple(attentions), agg_map, x_4

    def predict(
        self,
        x: jax.Array,
        method: Literal["softmax", "one-hot", "original", "sigmoid"] = "softmax",
        train: bool = False,
    ):
        """Inference post-processing (compose.py:189-199)."""
        out = self(x, train)
        attentions, agg_map = (out[1], out[2]) if self.encoder_gating else (out[0], out[1])
        return attentions, apply_prediction_method(agg_map, method)

    def classification_predict(
        self,
        x: jax.Array,
        method: Literal["softmax", "sigmoid"],
        mode: Literal["classic", "classic-gating", "ae-squash", "ae-extract"],
        train: bool = False,
    ):
        """Classification-head inference (compose.py:201-230)."""
        if mode == "classic-gating" and not self.encoder_gating:
            raise ValueError(f"{mode} is not valid if `encoder_gating` is not enabled.")
        out = self(x, train)
        if self.encoder_gating:
            g_x, att, predicate, latent = out
        else:
            att, predicate, latent = out

        predicate = jax.nn.softmax(predicate, axis=-1)

        if mode in ("classic", "classic-gating"):
            emb = self.linear_head_emb(jnp.mean(latent, axis=(1, 2)))
        elif mode == "ae-squash":
            emb = jnp.mean(predicate, axis=(1, 2))
        elif mode == "ae-extract":
            h = adaptive_avg_pool2d(predicate, (32, 32))
            h = nn.relu(self.head_dec_conv1(h))
            h = self.head_dec_bn1(h, train)
            h = nn.relu(self.head_dec_conv2(h))
            h = self.head_dec_bn2(h, train)
            emb = self.linear_head_dec(jnp.mean(h, axis=(1, 2)))
        else:
            raise NotImplementedError

        if method == "softmax":
            class_pred = jax.nn.softmax(emb, axis=-1)
        elif method == "sigmoid":
            class_pred = jax.nn.sigmoid(emb)
        else:
            raise NotImplementedError

        if mode == "classic-gating" and self.encoder_gating:
            return class_pred, g_x, att, predicate
        return class_pred, att, predicate


class ResnestUnetParallelHead(nn.Module):
    """Dual-decoder (thick/thin) variant without gates (compose.py:233-362).

    Returns stacked agg maps of shape (2, b, h, w, c)."""

    num_classes: int
    bn_axis_name: Optional[str] = None
    remat_blocks: object = False  # see ResnestUNet.remat_blocks
    remat_save_convs: bool = False  # see ResnestUNet.remat_save_convs
    remat_enc_layers: object = True  # see ResnestUNet.remat_enc_layers

    def setup(self):
        ax = self.bn_axis_name
        self.backbone = ResNeSt(config=resnest50().config, bn_axis_name=ax,
                                remat_blocks=self.remat_blocks,
                                remat_save_convs=self.remat_save_convs,
                                remat_layers=self.remat_enc_layers,
                                name="backbone")
        # see ResnestUNet.setup for the remat_blocks semantics
        dec_cls = _decoder_cls_factory(self.remat_blocks, self.remat_save_convs)
        self.upsampling_0 = Upsampling(64, 64, name="upsampling_0")
        self.decoder_0 = dec_cls(0)(64, 32, bn_axis_name=ax, name="decoder_0")
        self.upsampling_1 = Upsampling(256, 64, name="upsampling_1")
        self.decoder_1 = dec_cls(1)(128, 64, bn_axis_name=ax, name="decoder_1")
        self.upsampling_2 = Upsampling(512, 256, name="upsampling_2")
        self.decoder_2 = dec_cls(2)(512, 256, bn_axis_name=ax, name="decoder_2")
        self.upsampling_3 = Upsampling(1024, 512, name="upsampling_3")
        self.decoder_3 = dec_cls(3)(1024, 512, bn_axis_name=ax, name="decoder_3")
        self.upsampling_4 = Upsampling(2048, 1024, name="upsampling_4")
        self.decoder_4 = dec_cls(4)(2048, 1024, bn_axis_name=ax, name="decoder_4")
        # Parallel branch from x_1 (compose.py:279-285)
        self.upsampling_1_c = Upsampling(256, 64, name="upsampling_1_c")
        self.decoder_1_c = dec_cls(1)(128, 64, bn_axis_name=ax, name="decoder_1_c")
        self.upsampling_0_c = Upsampling(64, 64, name="upsampling_0_c")
        self.decoder_0_c = dec_cls(0)(64, 32, bn_axis_name=ax, name="decoder_0_c")
        self.fc = Conv(self.num_classes, 1, 1, 0, name="fc")
        self.fc_c = Conv(self.num_classes, 1, 1, 0, name="fc_c")

    def _trunk(self, x: jax.Array, train: bool):
        bb = self.backbone
        x_0_0 = bb.stem(x, train)
        x_0_1 = bb.maxpool(x_0_0)
        x_1 = bb.layer1(x_0_1, train)
        x_2 = bb.layer2(x_1, train)
        x_3 = bb.layer3(x_2, train)
        x_3, down, right = _pad_odd(x_3)
        x_4 = bb.layer4(x_3, train)
        return x_0_0, x_1, x_2, x_3, x_4, down, right

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x_0_0, x_1, x_2, x_3, x_4, down, right = self._trunk(x, train)

        # skip-concats as (skip, up) pairs — the decoder splits its kernels
        # along input channels; exact math, no materialized concat (same
        # flagship optimization as ResnestUNet)
        d_4 = self.upsampling_4(x_4)
        d_4 = self.decoder_4(
            (_crop_pad(x_3, down, right), _crop_pad(d_4, down, right)), train
        )
        d_3 = self.upsampling_3(d_4)
        d_3 = self.decoder_3((x_2, d_3), train)
        d_2 = self.upsampling_2(d_3)
        d_2 = self.decoder_2((x_1, d_2), train)
        d_1 = self.upsampling_1(d_2)
        d_1 = self.decoder_1((x_0_0, d_1), train)
        d_0 = self.decoder_0(self.upsampling_0(d_1), train)

        d_1_c = self.upsampling_1_c(x_1)
        d_1_c = self.decoder_1_c((x_0_0, d_1_c), train)
        d_0_c = self.decoder_0_c(self.upsampling_0_c(d_1_c), train)

        agg_map = self.fc(d_0)
        agg_map_c = self.fc_c(d_0_c)
        return jnp.stack([agg_map, agg_map_c], axis=0)  # (k, b, h, w, c)

    def predict(self, x: jax.Array, method: str = "softmax", train: bool = False):
        agg_map = self(x, train)
        return apply_prediction_method(agg_map, method)


class ResnestUnetParallelHeadAttentionGate(nn.Module):
    """Dual-decoder variant with AAGs (compose.py:365-527).

    Note the reference's depth-4 gate condition here is `> 3` (strict),
    unlike ResnestUNet's `>= 4` — same threshold, preserved.
    Constructor arg spelled `gating_leveL` in the reference; we accept the
    corrected spelling."""

    num_classes: int
    gating_level: int = 3
    bn_axis_name: Optional[str] = None
    use_pallas_aag: bool = False
    use_fused_decoder: bool = False  # eval-only fused decoder tail + AAG
    remat_blocks: object = False  # see ResnestUNet.remat_blocks
    remat_save_convs: bool = False  # see ResnestUNet.remat_save_convs
    remat_enc_layers: object = True  # see ResnestUNet.remat_enc_layers

    def setup(self):
        ax = self.bn_axis_name
        self.backbone = ResNeSt(config=resnest50().config, bn_axis_name=ax,
                                remat_blocks=self.remat_blocks,
                                remat_save_convs=self.remat_save_convs,
                                remat_layers=self.remat_enc_layers,
                                name="backbone")
        # see ResnestUNet.setup for the remat_blocks semantics
        dec_cls = _decoder_cls_factory(self.remat_blocks, self.remat_save_convs)
        self.upsampling_0 = Upsampling(64, 64, name="upsampling_0")
        self.decoder_0 = dec_cls(0)(64, 32, bn_axis_name=ax, name="decoder_0")
        self.aag_0 = AdversarialAttentionGate(32, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_0")
        self.upsampling_1 = Upsampling(256, 64, name="upsampling_1")
        self.decoder_1 = dec_cls(1)(128, 64, bn_axis_name=ax, name="decoder_1")
        self.aag_1 = AdversarialAttentionGate(64, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_1")
        self.upsampling_2 = Upsampling(512, 256, name="upsampling_2")
        self.decoder_2 = dec_cls(2)(512, 256, bn_axis_name=ax, name="decoder_2")
        self.aag_2 = AdversarialAttentionGate(256, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_2")
        self.upsampling_3 = Upsampling(1024, 512, name="upsampling_3")
        self.decoder_3 = dec_cls(3)(1024, 512, bn_axis_name=ax, name="decoder_3")
        self.aag_3 = AdversarialAttentionGate(512, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_3")
        self.upsampling_4 = Upsampling(2048, 1024, name="upsampling_4")
        self.decoder_4 = dec_cls(4)(2048, 1024, bn_axis_name=ax, name="decoder_4")
        self.aag_4 = AdversarialAttentionGate(1024, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_4")
        self.upsampling_1_c = Upsampling(256, 64, name="upsampling_1_c")
        self.decoder_1_c = dec_cls(1)(128, 64, bn_axis_name=ax, name="decoder_1_c")
        self.aag_1_c = AdversarialAttentionGate(64, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_1_c")
        self.upsampling_0_c = Upsampling(64, 64, name="upsampling_0_c")
        self.decoder_0_c = dec_cls(0)(64, 32, bn_axis_name=ax, name="decoder_0_c")
        self.aag_0_c = AdversarialAttentionGate(32, self.num_classes, use_pallas=self.use_pallas_aag, name="aag_0_c")
        self.fc = Conv(self.num_classes, 1, 1, 0, name="fc")
        self.fc_c = Conv(self.num_classes, 1, 1, 0, name="fc_c")

    def __call__(self, x: jax.Array, train: bool = False):
        bb = self.backbone
        x_0_0 = bb.stem(x, train)
        x_0_1 = bb.maxpool(x_0_0)
        x_1 = bb.layer1(x_0_1, train)
        x_2 = bb.layer2(x_1, train)
        x_3 = bb.layer3(x_2, train)
        x_3, down, right = _pad_odd(x_3)
        x_4 = bb.layer4(x_3, train)

        attentions, attentions_c = [], []
        fuse = self.use_fused_decoder and not train

        def stage(gated, decoder, aag, inp, sink):
            """Skip-pairs + (when fusing and gated) the decoder's fused
            Pallas tail — same machinery as ResnestUNet."""
            if fuse and gated:
                d, y = decoder(inp, train, aag_kb=aag(return_params=True))
                sink.append(y)
                return d
            d = decoder(inp, train)
            if gated:
                d, y = aag(d)
                sink.append(y)
            return d

        d_4 = self.upsampling_4(x_4)
        # strict `> 3` at depth 4 (compose.py:466), unlike ResnestUNet's >= 4
        d_4 = stage(self.gating_level > 3, self.decoder_4, self.aag_4,
                    (_crop_pad(x_3, down, right), _crop_pad(d_4, down, right)),
                    attentions)
        d_3 = stage(self.gating_level >= 3, self.decoder_3, self.aag_3,
                    (x_2, self.upsampling_3(d_4)), attentions)
        d_2 = stage(self.gating_level >= 2, self.decoder_2, self.aag_2,
                    (x_1, self.upsampling_2(d_3)), attentions)
        d_1 = stage(self.gating_level >= 1, self.decoder_1, self.aag_1,
                    (x_0_0, self.upsampling_1(d_2)), attentions)
        d_0 = stage(self.gating_level >= 0, self.decoder_0, self.aag_0,
                    self.upsampling_0(d_1), attentions)

        d_1_c = stage(self.gating_level >= 1, self.decoder_1_c, self.aag_1_c,
                      (x_0_0, self.upsampling_1_c(x_1)), attentions_c)
        d_0_c = stage(self.gating_level >= 0, self.decoder_0_c, self.aag_0_c,
                      self.upsampling_0_c(d_1_c), attentions_c)

        attentions.reverse()
        attentions_c.reverse()
        agg_map = self.fc(d_0)
        agg_map_c = self.fc_c(d_0_c)
        return (tuple(attentions), tuple(attentions_c)), jnp.stack([agg_map, agg_map_c], axis=0)

    def predict(self, x: jax.Array, method: str = "softmax", train: bool = False):
        attentions, agg_map = self(x, train)
        return attentions, apply_prediction_method(agg_map, method)
