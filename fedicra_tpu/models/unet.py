"""U-Net model family with client-personalized channel selection (PCS).

Re-implements the behaviour of the reference model zoo
(/root/reference/code/networks/unet.py) as idiomatic flax.linen modules:

- NHWC layout, conv/BN/LeakyReLU blocks that XLA fuses onto the MXU.
- The client identity is an *input* (one-hot embedding), not module state, so
  the same parameters can be vmapped over clients and over foreign-client
  embeddings (needed for the FedICRA cross-client contrast loss).
- Outputs are a dict (logits / features / decoder stages / heatmaps / aux
  heads) instead of positional tuples.

Reference parity notes (file:line refer to /root/reference/code/networks/unet.py):
- channels [16,32,64,128,256], dropout [0.05,0.1,0.2,0.3,0.5] (:553-558).
- Upsampling parity: although the model configs set ``bilinear: False``
  (:557), the reference decoders never forward that flag to UpBlock
  (e.g. :216-224 construct UpBlock without the ``bilinear`` argument), so
  UpBlock's default ``bilinear=True`` wins: the live path is 1x1-conv +
  align_corners=True bilinear upsampling, NOT transposed conv. Verified by
  parameter-count match (1.813M for unet 1ch/2cls). Our decoders therefore
  default to bilinear=True.
- PersonalizedChannelSelection (:103-144): client one-hot -> fc1; concat with
  global avg/max pooled stats -> shared fc2; hmap = sigmoid(avg+max);
  x = x*hmap + x.
- LCEncoder (:146-203): PCS on the last ``pcs_num`` stages (live: 1 =>
  bottleneck only). Quirk reproduced: ``emb_idx`` of None *or 0* falls back
  to the encoder's own client id (`if not emb_idx:` at :186).
- The reference leaves PCS modules unregistered (plain Python list, :172-177)
  so they are frozen at their random init and excluded from federation. We
  register them as normal params but (a) the training masks exclude them from
  optimizer updates and (b) `params_filters.is_pcs` lets the federation layer
  exclude them from aggregation; gradients still flow *through* them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Conv,
    ConvBlock,
    DSNHead,
    DownBlock,
    UpBlock,
)

Array = jax.Array

DEFAULT_FEATURES = (16, 32, 64, 128, 256)
DEFAULT_DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


class Encoder(nn.Module):
    """Plain 5-stage encoder (unet.py:73-100)."""

    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x: Array, *, train: bool):
        f, d = self.features, self.dropout
        x0 = ConvBlock(f[0], d[0], name="in_conv")(x, train=train)
        x1 = DownBlock(f[1], d[1], name="down1")(x0, train=train)
        x2 = DownBlock(f[2], d[2], name="down2")(x1, train=train)
        x3 = DownBlock(f[3], d[3], name="down3")(x2, train=train)
        x4 = DownBlock(f[4], d[4], name="down4")(x3, train=train)
        return [x0, x1, x2, x3, x4]


class PersonalizedChannelSelection(nn.Module):
    """Client-conditioned channel attention (unet.py:103-144)."""

    f_dim: int

    @nn.compact
    def __call__(self, x: Array, emb: Array):
        # x: (B, H, W, C) ; emb: (B, K) one-hot client embedding
        avg_out = jnp.mean(x, axis=(-3, -2), keepdims=True)  # (B,1,1,C)
        max_out = jnp.max(x, axis=(-3, -2), keepdims=True)

        e = emb[:, None, None, :]  # (B,1,1,K)
        e = Conv(self.f_dim, kernel_size=(1, 1), use_bias=False, name="fc1_a")(e)
        e = nn.relu(e)
        e = Conv(self.f_dim, kernel_size=(1, 1), use_bias=False, name="fc1_b")(e)

        # fc2 is shared between the avg and max paths (single submodule pair).
        fc2_a = Conv(
            max(self.f_dim // 16, 1), kernel_size=(1, 1), use_bias=False, name="fc2_a"
        )
        fc2_b = Conv(self.f_dim, kernel_size=(1, 1), use_bias=False, name="fc2_b")

        avg_in = jnp.concatenate([avg_out, e], axis=-1)
        max_in = jnp.concatenate([max_out, e], axis=-1)
        avg_o = fc2_b(nn.relu(fc2_a(avg_in)))
        max_o = fc2_b(nn.relu(fc2_a(max_in)))

        hmap = jax.nn.sigmoid(avg_o + max_o)  # (B,1,1,C)
        x = x * hmap + x
        return x, hmap


class LCEncoder(nn.Module):
    """Encoder with PCS modules on the last ``pcs_num`` stages (unet.py:146-203)."""

    num_clients: int
    client_id: int = 0
    pcs_num: int = 1
    features: Sequence[int] = DEFAULT_FEATURES
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x: Array, *, train: bool, emb_idx: Optional = None):
        f, d = self.features, self.dropout
        batch = x.shape[0]

        # Reference quirk (unet.py:186-189): `if not emb_idx:` means both None
        # and 0 resolve to the encoder's own client id. We reproduce it for
        # python ints; a traced array emb_idx is used as-is (array inputs are
        # how the vmapped cross-client forwards inject foreign embeddings).
        if emb_idx is None or (isinstance(emb_idx, int) and emb_idx == 0):
            emb_idx = self.client_id
        if isinstance(emb_idx, int):
            emb = jax.nn.one_hot(
                jnp.full((batch,), emb_idx, dtype=jnp.int32), self.num_clients
            )
        else:
            emb_idx = jnp.asarray(emb_idx)
            if emb_idx.ndim == 0:
                emb_idx = jnp.full((batch,), emb_idx, dtype=jnp.int32)
            emb = jax.nn.one_hot(emb_idx, self.num_clients)

        stages = [
            ("in_conv", lambda t: ConvBlock(f[0], d[0], name="in_conv")(t, train=train)),
            ("down1", lambda t: DownBlock(f[1], d[1], name="down1")(t, train=train)),
            ("down2", lambda t: DownBlock(f[2], d[2], name="down2")(t, train=train)),
            ("down3", lambda t: DownBlock(f[3], d[3], name="down3")(t, train=train)),
            ("down4", lambda t: DownBlock(f[4], d[4], name="down4")(t, train=train)),
        ]
        features = []
        heatmaps = []
        n = len(stages)
        for i, (_, fn) in enumerate(stages):
            x = fn(x)
            if i >= n - self.pcs_num:
                pcs_idx = i - (n - self.pcs_num)
                x, hmap = PersonalizedChannelSelection(
                    f_dim=f[i], name=f"pcs{pcs_idx}"
                )(x, emb)
            else:
                hmap = None
            features.append(x)
            heatmaps.append(hmap)
        return features, heatmaps


class Decoder(nn.Module):
    """Plain decoder with 3x3 out conv (unet.py:206-240)."""

    num_classes: int
    features: Sequence[int] = DEFAULT_FEATURES
    bilinear: bool = True

    @nn.compact
    def __call__(self, feature, *, train: bool):
        f = self.features
        x0, x1, x2, x3, x4 = feature
        d1 = UpBlock(f[3], f[3], bilinear=self.bilinear, name="up1")(x4, x3, train=train)
        d2 = UpBlock(f[2], f[2], bilinear=self.bilinear, name="up2")(d1, x2, train=train)
        d3 = UpBlock(f[1], f[1], bilinear=self.bilinear, name="up3")(d2, x1, train=train)
        d4 = UpBlock(f[0], f[0], bilinear=self.bilinear, name="up4")(d3, x0, train=train)
        logits = Conv(self.num_classes, name="out_conv")(d4)
        return {"logits": logits, "de": [d1, d2, d3, d4]}


class DecoderMultiHead(nn.Module):
    """Decoder with ``num_heads`` DSN aux heads on de2/de3/de4 (unet.py:288-398).

    num_heads=1 gives Decoder_Head (aux on de2), 2 gives Decoder_MultiHead_Two,
    3 gives Decoder_MultiHead (the FedICRA model's decoder).
    """

    num_classes: int
    num_heads: int = 3
    features: Sequence[int] = DEFAULT_FEATURES
    bilinear: bool = True
    dsn_dropout: float = 0.1

    @nn.compact
    def __call__(self, feature, *, train: bool):
        f = self.features
        x0, x1, x2, x3, x4 = feature
        d1 = UpBlock(f[3], f[3], bilinear=self.bilinear, name="up1")(x4, x3, train=train)
        d2 = UpBlock(f[2], f[2], bilinear=self.bilinear, name="up2")(d1, x2, train=train)
        d3 = UpBlock(f[1], f[1], bilinear=self.bilinear, name="up3")(d2, x1, train=train)
        d4 = UpBlock(f[0], f[0], bilinear=self.bilinear, name="up4")(d3, x0, train=train)
        logits = Conv(self.num_classes, name="out_conv")(d4)
        aux = []
        sources = [d2, d3, d4]
        for i in range(self.num_heads):
            aux.append(
                DSNHead(
                    self.num_classes,
                    drop_rate=self.dsn_dropout,
                    name=f"dsn_head{i + 1}",
                )(sources[i], train=train)
            )
        return {"logits": logits, "de": [d1, d2, d3, d4], "aux": aux}


def _interp_nearest(x: Array, out_hw) -> Array:
    """torch F.interpolate(..., mode='nearest') parity for NHWC tensors."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = (jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = (jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class DecoderDS(nn.Module):
    """Deep-supervision decoder (unet.py:401-451): per-stage 3x3 out convs."""

    num_classes: int
    features: Sequence[int] = DEFAULT_FEATURES
    bilinear: bool = True

    @nn.compact
    def __call__(self, feature, out_hw, *, train: bool):
        f = self.features
        x0, x1, x2, x3, x4 = feature
        x = UpBlock(f[3], f[3], bilinear=self.bilinear, name="up1")(x4, x3, train=train)
        dp3 = _interp_nearest(Conv(self.num_classes, name="out_conv_dp3")(x), out_hw)
        x = UpBlock(f[2], f[2], bilinear=self.bilinear, name="up2")(x, x2, train=train)
        dp2 = _interp_nearest(Conv(self.num_classes, name="out_conv_dp2")(x), out_hw)
        x = UpBlock(f[1], f[1], bilinear=self.bilinear, name="up3")(x, x1, train=train)
        dp1 = _interp_nearest(Conv(self.num_classes, name="out_conv_dp1")(x), out_hw)
        x = UpBlock(f[0], f[0], bilinear=self.bilinear, name="up4")(x, x0, train=train)
        dp0 = Conv(self.num_classes, name="out_conv")(x)
        return {"logits": dp0, "aux": [dp1, dp2, dp3]}


def feature_dropout(key: Array, x: Array) -> Array:
    """Attention-thresholded feature dropout (unet.py:525-534), NHWC."""
    attention = jnp.mean(x, axis=-1, keepdims=True)  # (B,H,W,1)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)  # (B,)
    thresh = max_val * jax.random.uniform(key, (), minval=0.7, maxval=0.9)
    drop_mask = (attention < thresh[:, None, None, None]).astype(x.dtype)
    return x * drop_mask


def feature_noise(key: Array, x: Array, uniform_range: float = 0.3) -> Array:
    """Multiplicative uniform feature noise (unet.py:536-546), shared over batch."""
    noise = jax.random.uniform(
        key, x.shape[1:], minval=-uniform_range, maxval=uniform_range
    )
    return x * noise[None] + x


def channel_dropout(key: Array, x: Array, p: float = 0.5) -> Array:
    """torch F.dropout2d parity: drop whole channels, scale by 1/(1-p)."""
    keep = jax.random.bernoulli(key, 1.0 - p, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - p), 0.0)


class UNet(nn.Module):
    """Plain U-Net (unet.py:549-566).

    ``dropout`` overrides the per-stage encoder dropout rates (the
    cross-framework trajectory tests set it to zeros so torch and JAX runs
    are deterministic without matching dropout RNG streams).
    """

    in_chns: int
    num_classes: int
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature = Encoder(dropout=self.dropout, name="encoder")(x, train=train)
        out = Decoder(self.num_classes, name="decoder")(feature, train=train)
        out["features"] = feature
        return out


class UNetHead(nn.Module):
    """U-Net + 1 DSN aux head (unet.py:652-668)."""

    in_chns: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature = Encoder(name="encoder")(x, train=train)
        out = DecoderMultiHead(self.num_classes, num_heads=1, name="decoder")(
            feature, train=train
        )
        out["features"] = feature
        return out


class UNetMultiHead(nn.Module):
    """U-Net + 3 DSN aux heads (unet.py:671-689)."""

    in_chns: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature = Encoder(name="encoder")(x, train=train)
        out = DecoderMultiHead(self.num_classes, num_heads=3, name="decoder")(
            feature, train=train
        )
        out["features"] = feature
        return out


class UNetDS(nn.Module):
    """U-Net with deep supervision (unet.py:570-589)."""

    in_chns: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature = Encoder(name="encoder")(x, train=train)
        out = DecoderDS(self.num_classes, name="decoder")(
            feature, x.shape[1:3], train=train
        )
        out["features"] = feature
        return out


class UNetCCT(nn.Module):
    """U-Net with one perturbed auxiliary decoder (unet.py:592-611)."""

    in_chns: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature = Encoder(name="encoder")(x, train=train)
        main = Decoder(self.num_classes, name="main_decoder")(feature, train=train)
        if train:
            key = self.make_rng("perturb")
            keys = jax.random.split(key, len(feature))
            aux_feature = [channel_dropout(k, t) for k, t in zip(keys, feature)]
        else:
            aux_feature = feature
        aux = Decoder(self.num_classes, name="aux_decoder1")(aux_feature, train=train)
        return {"logits": main["logits"], "aux": [aux["logits"]], "features": feature}


class UNetCCT3H(nn.Module):
    """U-Net with two perturbed auxiliary passes (unet.py:614-636).

    Reference quirk kept: both perturbed passes go through *aux_decoder1*
    (aux_decoder2 exists but is unused at :635).
    """

    in_chns: int
    num_classes: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature = Encoder(name="encoder")(x, train=train)
        main = Decoder(self.num_classes, name="main_decoder")(feature, train=train)
        aux_dec = Decoder(self.num_classes, name="aux_decoder1")
        # instantiate (unused, parity with reference param surface)
        aux_dec2 = Decoder(self.num_classes, name="aux_decoder2")
        if train:
            key = self.make_rng("perturb")
            kd, kn = jax.random.split(key)
            kds = jax.random.split(kd, len(feature))
            kns = jax.random.split(kn, len(feature))
            f1 = [channel_dropout(k, t) for k, t in zip(kds, feature)]
            f2 = [feature_noise(k, t) for k, t in zip(kns, feature)]
        else:
            f1 = f2 = feature
        aux1 = aux_dec(f1, train=train)
        aux2 = aux_dec(f2, train=train)
        _ = aux_dec2(feature, train=train)
        return {
            "logits": main["logits"],
            "aux": [aux1["logits"], aux2["logits"]],
            "features": feature,
        }


class UNetLC(nn.Module):
    """LCEncoder + 1-aux-head decoder (unet.py:678-699)."""

    in_chns: int
    num_classes: int
    num_clients: int
    client_id: int = 0
    pcs_num: int = 1
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature, heatmaps = LCEncoder(
            num_clients=self.num_clients,
            client_id=self.client_id,
            pcs_num=self.pcs_num,
            dropout=self.dropout,
            name="encoder",
        )(x, train=train, emb_idx=emb_idx)
        out = DecoderMultiHead(self.num_classes, num_heads=1, name="decoder")(
            feature, train=train
        )
        out["features"] = feature
        out["heatmaps"] = heatmaps
        return out


class UNetLCMultiHead(nn.Module):
    """The FedICRA flagship model: LCEncoder + 3 DSN heads (unet.py:701-722)."""

    in_chns: int
    num_classes: int
    num_clients: int
    client_id: int = 0
    pcs_num: int = 1
    dropout: Sequence[float] = DEFAULT_DROPOUT
    dsn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature, heatmaps = LCEncoder(
            num_clients=self.num_clients,
            client_id=self.client_id,
            pcs_num=self.pcs_num,
            dropout=self.dropout,
            name="encoder",
        )(x, train=train, emb_idx=emb_idx)
        out = DecoderMultiHead(
            self.num_classes,
            num_heads=3,
            dsn_dropout=self.dsn_dropout,
            name="decoder",
        )(feature, train=train)
        out["features"] = feature
        out["heatmaps"] = heatmaps
        return out


class UNetLCMultiHeadTwo(nn.Module):
    """LCEncoder + 2 DSN heads (unet.py:725-746)."""

    in_chns: int
    num_classes: int
    num_clients: int
    client_id: int = 0
    pcs_num: int = 1
    dropout: Sequence[float] = DEFAULT_DROPOUT

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, emb_idx=None):
        feature, heatmaps = LCEncoder(
            num_clients=self.num_clients,
            client_id=self.client_id,
            pcs_num=self.pcs_num,
            dropout=self.dropout,
            name="encoder",
        )(x, train=train, emb_idx=emb_idx)
        out = DecoderMultiHead(self.num_classes, num_heads=2, name="decoder")(
            feature, train=train
        )
        out["features"] = feature
        out["heatmaps"] = heatmaps
        return out
