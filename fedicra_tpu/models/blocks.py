"""Core convolutional building blocks for the U-Net family.

TPU-native design notes
-----------------------
- Layout is NHWC throughout (the TPU-friendly conv layout; XLA maps these
  convs onto the MXU). The reference uses NCHW (torch); transposition happens
  only at the IO boundary.
- BatchNorm carries running stats in the ``batch_stats`` collection. Under a
  client-vmapped federation the stats simply live in the per-client state
  pytree, so per-client BN is free (reference parity: torch BN momentum 0.1,
  eps 1e-5; flax momentum = 1 - 0.1).
- Initialisers mirror torch defaults (kaiming_uniform with a=sqrt(5), bias
  uniform(+-1/sqrt(fan_in))) so weight-scale statistics match the reference
  at init, which matters for trajectory-level parity claims.

Reference behaviour being reproduced (for parity auditing):
  /root/reference/code/networks/unet.py:14-70 (ConvBlock / DownBlock / UpBlock).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

LRELU_SLOPE = 0.01  # torch nn.LeakyReLU default negative_slope

# Mixed-precision control (the reference's optional AMP, --amp):
# when set to jnp.bfloat16, convolutions compute in bf16 on the MXU with
# fp32 parameters; BatchNorm stays fp32 (torch autocast semantics). bf16
# needs no GradScaler (the reference's fp16 scaler has no analog here).
_COMPUTE_DTYPE = [None]


def set_compute_dtype(dtype) -> None:
    _COMPUTE_DTYPE[0] = dtype


def compute_dtype():
    return _COMPUTE_DTYPE[0]


def _kaiming_uniform_torch(key, shape, dtype=jnp.float32):
    """torch's default conv/linear weight init: kaiming_uniform(a=sqrt(5)).

    For HWIO conv kernels fan_in = H * W * I. gain = sqrt(2/(1+a^2)) with
    a=sqrt(5) -> gain^2 = 1/3, bound = sqrt(3) * gain / sqrt(fan_in)
    = 1/sqrt(fan_in).
    """
    fan_in = math.prod(int(s) for s in shape[:-1])
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Conv(nn.Module):
    """3x3 (default) conv with torch-style default init, NHWC."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    use_bias: bool = True
    padding: Any = "SAME"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=compute_dtype(),
            kernel_init=_kaiming_uniform_torch,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """torch-parity BatchNorm2d (momentum 0.1, eps 1e-5)."""

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))


class ConvBNAct(nn.Module):
    """Conv -> BN -> LeakyReLU, the halves of the reference ConvBlock."""

    features: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = Conv(self.features, name="conv")(x)
        x = BatchNorm(name="norm")(x, train=train)
        return nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


class ConvBlock(nn.Module):
    """(Conv3x3 -> BN -> LeakyReLU -> Dropout) -> (Conv3x3 -> BN -> LeakyReLU).

    Matches the reference ConvBlock (unet.py:14-30): dropout sits between the
    two conv halves only.
    """

    features: int
    dropout_p: float

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = ConvBNAct(self.features, name="conv1")(x, train=train)
        x = nn.Dropout(rate=self.dropout_p, deterministic=not train, name="drop")(x)
        x = ConvBNAct(self.features, name="conv2")(x, train=train)
        return x


class DownBlock(nn.Module):
    """2x2 maxpool followed by ConvBlock (unet.py:34-46)."""

    features: int
    dropout_p: float

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return ConvBlock(self.features, self.dropout_p, name="block")(x, train=train)


class UpBlock(nn.Module):
    """Upsample + skip-concat + ConvBlock (unet.py:49-70).

    ``bilinear=False`` (the live config) uses a 2x2 stride-2 transposed conv;
    the bilinear variant applies a 1x1 conv then an align_corners=True
    bilinear resize (torch nn.Upsample parity).
    """

    skip_features: int  # channel count of the skip connection (in_channels2)
    features: int  # output channels
    dropout_p: float = 0.0
    bilinear: bool = False

    @nn.compact
    def __call__(self, x_low: Array, x_skip: Array, *, train: bool) -> Array:
        if self.bilinear:
            x_low = Conv(self.skip_features, kernel_size=(1, 1), name="conv1x1")(x_low)
            x_low = _resize_bilinear_align_corners(
                x_low, x_skip.shape[-3], x_skip.shape[-2]
            )
        else:
            in_ch = x_low.shape[-1]
            x_low = nn.ConvTranspose(
                features=self.skip_features,
                kernel_size=(2, 2),
                strides=(2, 2),
                dtype=compute_dtype(),
                kernel_init=_kaiming_uniform_torch,
                bias_init=torch_bias_init(in_ch * 2 * 2),
                name="up",
            )(x_low)
        x = jnp.concatenate([x_skip, x_low], axis=-1)
        return ConvBlock(self.features, self.dropout_p, name="block")(x, train=train)


def _resize_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with torch align_corners=True semantics (NHWC)."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    scale_h = (h - 1) / (out_h - 1) if out_h > 1 else 0.0
    scale_w = (w - 1) / (out_w - 1) if out_w > 1 else 0.0
    rows = jnp.arange(out_h) * scale_h
    cols = jnp.arange(out_w) * scale_w
    r0 = jnp.clip(jnp.floor(rows).astype(jnp.int32), 0, h - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c0 = jnp.clip(jnp.floor(cols).astype(jnp.int32), 0, w - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)
    fr = (rows - r0).astype(x.dtype)
    fc = (cols - c0).astype(x.dtype)
    top = x[..., r0, :, :] * (1 - fr)[:, None, None] + x[..., r1, :, :] * fr[:, None, None]
    out = (
        top[..., :, c0, :] * (1 - fc)[None, :, None]
        + top[..., :, c1, :] * fc[None, :, None]
    )
    return out


class _DSNHeadImpl(nn.Module):
    num_classes: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = Conv(self.hidden, name="conv")(x)
        x = BatchNorm(name="norm")(x, train=train)
        x = nn.relu(x)
        x = nn.Dropout(
            rate=0.10,
            deterministic=not train,
            broadcast_dims=(-3, -2),
            name="drop2d",
        )(x)
        x = Conv(self.num_classes, kernel_size=(1, 1), use_bias=False, name="out")(x)
        return x


class DSNHead(nn.Module):
    """Auxiliary deep-supervision head: Conv3x3->BN->ReLU->Dropout2d(0.1)->Conv1x1.

    Matches the reference dsn_head blocks (unet.py:264-270 etc.): hidden width
    512, final 1x1 conv without bias; Dropout2d == channel dropout, which in
    NHWC is a dropout broadcast over the two spatial dims.

    Rematerialized: the 512-wide hidden activation at full resolution is the
    single largest tensor of the training step (~3.6 GB at 384^2 bs12 fp32);
    recomputing it in the backward pass keeps it out of HBM residency.
    """

    num_classes: int
    hidden: int = 512

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        impl = nn.remat(_DSNHeadImpl, static_argnums=(2,))(
            num_classes=self.num_classes, hidden=self.hidden, name="impl"
        )
        return impl(x, train)
