"""PNet2D: flat dilated-conv network (DeepIGeoS-style).

Reference parity: /root/reference/code/networks/pnet.py (PNetBlock /
ConcatBlock / OutPutBlock / PNet2D with dilation ratios [1,2,4,8,16] and 64
filters via the factory). NHWC layout; dilated 3x3 convs map directly onto
XLA's convolution with rhs_dilation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, LRELU_SLOPE, _kaiming_uniform_torch, torch_bias_init

Array = jax.Array


class _DilatedConv(nn.Module):
    features: int
    dilation: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size * self.kernel_size
        pad = self.dilation * (self.kernel_size // 2)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(pad, pad), (pad, pad)],
            kernel_init=_kaiming_uniform_torch,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class PNetBlock(nn.Module):
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = _DilatedConv(self.features, self.dilation, name="conv1")(x)
        x = BatchNorm(name="in1")(x, train=train)
        x = nn.leaky_relu(x, negative_slope=LRELU_SLOPE)
        x = _DilatedConv(self.features, self.dilation, name="conv2")(x)
        x = BatchNorm(name="in2")(x, train=train)
        x = nn.leaky_relu(x, negative_slope=LRELU_SLOPE)
        return x


class ConcatBlock(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch,
            (1, 1),
            kernel_init=_kaiming_uniform_torch,
            bias_init=torch_bias_init(in_ch),
            name="conv1",
        )(x)
        x = nn.leaky_relu(x, negative_slope=LRELU_SLOPE)
        x = nn.Conv(
            self.out_features,
            (1, 1),
            kernel_init=_kaiming_uniform_torch,
            bias_init=torch_bias_init(in_ch),
            name="conv2",
        )(x)
        x = nn.leaky_relu(x, negative_slope=LRELU_SLOPE)
        return x


class OutPutBlock(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        in_ch = x.shape[-1]
        drop = lambda name: nn.Dropout(
            rate=0.3, deterministic=not train, broadcast_dims=(-3, -2), name=name
        )
        x = drop("drop1")(x)
        x = nn.Conv(
            in_ch // 2,
            (1, 1),
            kernel_init=_kaiming_uniform_torch,
            bias_init=torch_bias_init(in_ch),
            name="conv1",
        )(x)
        x = nn.leaky_relu(x, negative_slope=LRELU_SLOPE)
        x = drop("drop2")(x)
        x = nn.Conv(
            self.num_classes,
            (1, 1),
            kernel_init=_kaiming_uniform_torch,
            bias_init=torch_bias_init(in_ch // 2),
            name="conv2",
        )(x)
        return x


class PNet2D(nn.Module):
    in_chns: int
    num_classes: int
    num_filters: int = 64
    ratios: Sequence[int] = (1, 2, 4, 8, 16)

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feats = []
        for i, r in enumerate(self.ratios):
            x = PNetBlock(self.num_filters, r, name=f"block{i + 1}")(x, train=train)
            feats.append(x)
        conx = jnp.concatenate(feats, axis=-1)
        conx = ConcatBlock(self.num_filters * 2, name="catblock")(conx)
        logits = OutPutBlock(self.num_classes, name="out")(conx, train=train)
        return {"logits": logits, "features": feats}
