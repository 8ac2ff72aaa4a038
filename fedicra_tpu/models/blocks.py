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


def _dsn_chunks(h: int) -> int:
    """Largest row-chunk count <= h/24 that divides h (1 for small inputs)."""
    target = h // 24
    for c in range(target, 1, -1):
        if h % c == 0:
            return c
    return 1


class DSNHead(nn.Module):
    """Auxiliary deep-supervision head: Conv3x3->BN->ReLU->Dropout2d(0.1)->Conv1x1.

    Matches the reference dsn_head blocks (unet.py:264-270 etc.): hidden width
    512, final 1x1 conv without bias; Dropout2d == channel dropout, which in
    NHWC is a dropout broadcast over the two spatial dims.

    Memory design: the 512-wide hidden at full resolution is the largest
    tensor of the training step (3.6+ GB at 384^2 bs12 fp32, doubled by its
    cotangent in the backward). The head therefore streams spatial row-tiles
    through a two-pass computation with hand-rolled BatchNorm:
      pass 1: per-channel batch statistics accumulated tile-by-tile;
      pass 2: per-tile conv3x3 -> normalize -> relu -> channel-dropout ->
              conv1x1, each tile rematerialized (jax.checkpoint) so neither
              the hidden nor its gradient is ever fully resident.
    Statistics/normalization follow flax BatchNorm (momentum 0.9, eps 1e-5),
    so the result equals the naive composition exactly in fp32.
    """

    num_classes: int
    hidden: int = 512
    # reference hardcodes Dropout2d(0.1) (unet.py:264-270); configurable so
    # cross-framework trajectory tests can zero it (torch and flax dropout
    # RNG streams cannot be matched)
    drop_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        b, h, w, cin = x.shape
        hid = self.hidden

        kernel = self.param(
            "conv_kernel", _kaiming_uniform_torch, (3, 3, cin, hid)
        )
        cbias = self.param("conv_bias", torch_bias_init(cin * 9), (hid,))
        scale = self.param("bn_scale", nn.initializers.ones, (hid,))
        bias = self.param("bn_bias", nn.initializers.zeros, (hid,))
        out_kernel = self.param(
            "out_kernel", _kaiming_uniform_torch, (1, 1, hid, self.num_classes)
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((hid,))
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((hid,)))

        chunks = _dsn_chunks(h)
        rows = h // chunks
        xp = jnp.pad(x, [(0, 0), (1, 1), (0, 0), (0, 0)])  # H halo for 3x3

        def conv_tile(k):
            tile = jax.lax.dynamic_slice(
                xp, (0, k * rows, 0, 0), (b, rows + 2, w, cin)
            )
            hcol = jax.lax.conv_general_dilated(
                tile, kernel, (1, 1),
                [(0, 0), (1, 1)],  # VALID in H (halo provided), SAME in W
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cbias
            return hcol  # [b, rows, w, hid]

        if train:
            # pass 1: batch statistics, tile-streamed and rematerialized so
            # AD keeps no hidden tiles
            @jax.checkpoint
            def stat_tile(k):
                hcol = conv_tile(k)
                return (
                    jnp.sum(hcol, axis=(0, 1, 2)),
                    jnp.sum(hcol * hcol, axis=(0, 1, 2)),
                )

            s_parts, s2_parts = jax.lax.map(stat_tile, jnp.arange(chunks))
            s, s2 = jnp.sum(s_parts, axis=0), jnp.sum(s2_parts, axis=0)
            n = b * h * w
            mean = s / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
            keep_p = 1.0 - self.drop_rate
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), keep_p, (b, 1, 1, hid)
            )
            drop_scale = keep.astype(x.dtype) / keep_p
        else:
            mean, var = ra_mean.value, ra_var.value
            drop_scale = jnp.ones((b, 1, 1, hid), x.dtype)

        inv = jax.lax.rsqrt(var + 1e-5) * scale
        shift = bias - mean * inv
        ok2 = out_kernel.reshape(hid, self.num_classes)

        @jax.checkpoint
        def apply_tile(k):
            hcol = conv_tile(k)
            a = jnp.maximum(hcol * inv + shift, 0.0) * drop_scale
            return jnp.einsum("bhwc,co->bhwo", a, ok2)

        out = jax.lax.map(apply_tile, jnp.arange(chunks))
        # [chunks, b, rows, w, C] -> [b, h, w, C]
        out = jnp.transpose(out, (1, 0, 2, 3, 4)).reshape(
            b, h, w, self.num_classes
        )
        return out
