"""EfficientNet-encoder U-Net (the factory's ``efficient_unet`` option).

Reference: /root/reference/code/networks/efficientunet.py (smp-style
UnetDecoder + optional SCSE attention) over the vendored EfficientNet
encoder (networks/efficient_encoder.py; B3 feature channels
(3, 40, 32, 48, 136, 384) at strides /2../32, :156).

Flax re-implementation:
- EfficientNet-B3 topology (width 1.2 / depth 1.4 compound scaling of the B0
  stage table, SE ratio 0.25, swish, BN eps 1e-3/momentum 0.99);
- smp UnetDecoder: nearest 2x upsample, skip concat, (Conv3x3-BN-ReLU) x2,
  optional SCSE attention, decoder channels (256,128,64,32,16), 1x1
  classifier.

Deviation (documented): the reference loads ImageNet-pretrained encoder
weights; no pretrained checkpoints exist in this offline environment, so the
encoder initializes randomly (``pretrained='imagenet'`` raises with a clear
message).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv, _kaiming_uniform_torch

Array = jax.Array

# B0 stage table: (num_repeat, kernel, stride, expand, out_channels)
_B0_STAGES = (
    (1, 3, 1, 1, 16),
    (2, 3, 2, 6, 24),
    (2, 5, 2, 6, 40),
    (3, 3, 2, 6, 80),
    (3, 5, 1, 6, 112),
    (4, 5, 2, 6, 192),
    (1, 3, 1, 6, 320),
)


def _round_filters(f: float, width: float, divisor: int = 8) -> int:
    f *= width
    new_f = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * f:
        new_f += divisor
    return int(new_f)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3, name="bn"
        )(x)


class SqueezeExcite(nn.Module):
    se_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = Conv(self.se_channels, kernel_size=(1, 1), name="reduce")(s)
        s = nn.silu(s)
        s = Conv(x.shape[-1], kernel_size=(1, 1), name="expand")(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = Conv(in_ch * self.expand, kernel_size=(1, 1), use_bias=False,
                     name="expand_conv")(h)
            h = _BN(name="bn0")(h, train=train)
            h = nn.silu(h)
        # depthwise
        h = nn.Conv(
            features=h.shape[-1],
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=h.shape[-1],
            use_bias=False,
            kernel_init=_kaiming_uniform_torch,
            name="dwconv",
        )(h)
        h = _BN(name="bn1")(h, train=train)
        h = nn.silu(h)
        if self.se_ratio > 0:
            h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), name="se")(h)
        h = Conv(self.out_ch, kernel_size=(1, 1), use_bias=False,
                 name="project_conv")(h)
        h = _BN(name="bn2")(h, train=train)
        if self.stride == 1 and in_ch == self.out_ch:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                key = self.make_rng("dropout")
                mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, 1))
                h = h * mask / keep
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """Returns [x, f/2, f/4, f/8, f/16, f/32] feature pyramid."""

    width: float = 1.2  # B3
    depth: float = 1.4
    drop_connect: float = 0.2

    @nn.compact
    def __call__(self, x, *, train: bool):
        feats = [x]
        stem_ch = _round_filters(32, self.width)
        h = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=_kaiming_uniform_torch,
                    name="stem_conv")(x)
        h = _BN(name="stem_bn")(h, train=train)
        h = nn.silu(h)

        feats.append(h)  # /2 tap = stem output (smp efficient_encoder parity)

        total_blocks = sum(_round_repeats(r, self.depth) for r, *_ in _B0_STAGES)
        block_idx = 0
        # smp taps at the ends of groups 2 (/4), 3 (/8), 5 (/16), 7 (/32)
        tap_after_group = {1, 2, 4, 6}
        for si, (r, k, s, e, c) in enumerate(_B0_STAGES):
            reps = _round_repeats(r, self.depth)
            out_ch = _round_filters(c, self.width)
            for bi in range(reps):
                stride = s if bi == 0 else 1
                drop = self.drop_connect * block_idx / total_blocks
                h = MBConv(out_ch, k, stride, e, drop_rate=drop,
                           name=f"block{si}_{bi}")(h, train=train)
                block_idx += 1
            if si in tap_after_group:
                feats.append(h)
        return feats


class SCSE(nn.Module):
    """Concurrent spatial + channel squeeze-excitation (attention.py:51-65)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # channel SE
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = Conv(max(1, c // self.reduction), kernel_size=(1, 1), name="c_reduce")(s)
        s = nn.relu(s)
        s = Conv(c, kernel_size=(1, 1), name="c_expand")(s)
        cse = x * jax.nn.sigmoid(s)
        # spatial SE
        sse = x * jax.nn.sigmoid(Conv(1, kernel_size=(1, 1), name="s_conv")(x))
        return cse + sse


class DecoderBlock(nn.Module):
    out_ch: int
    attention: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            if self.attention == "scse":
                x = SCSE(name="attention1")(x)
        x = Conv(self.out_ch, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = Conv(self.out_ch, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        x = nn.relu(x)
        if self.attention == "scse":
            x = SCSE(name="attention2")(x)
        return x


class EffiUNet(nn.Module):
    in_chns: int
    num_classes: int
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention: Optional[str] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, emb_idx=None):
        if self.pretrained:
            raise NotImplementedError(
                "pretrained EfficientNet weights are unavailable in this "
                "offline build; use pretrained=None (random init)"
            )
        feats = EfficientNetEncoder(name="encoder")(x, train=train)
        # smp: drop the full-res input feature, reverse
        feats = feats[1:][::-1]  # [/32, /16, /8, /4, /2]
        head, skips = feats[0], feats[1:]
        h = head
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            h = DecoderBlock(ch, attention=self.attention, name=f"dec{i}")(
                h, skip, train=train
            )
        logits = Conv(self.num_classes, kernel_size=(1, 1), name="classifier")(h)
        return {"logits": logits, "features": feats}
