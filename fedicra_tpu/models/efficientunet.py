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


def _b3_block_layout():
    """Global block list [(stage, rep_in_stage, expand)] with B3 scaling —
    the order efficientnet-pytorch flattens its ``_blocks`` ModuleList in."""
    layout = []
    for si, (r, _k, _s, e, _c) in enumerate(_B0_STAGES):
        for bi in range(_round_repeats(r, 1.4)):
            layout.append((si, bi, e))
    return layout


def convert_torch_encoder_state_dict(state_dict, encoder_params, encoder_stats):
    """Map an efficientnet-pytorch B3 ``state_dict`` (the checkpoints the
    reference loads via encoder_weights='imagenet',
    efficient_encoder.py:111-200) onto the flax encoder trees.

    Accepts either torch tensors or numpy arrays as values. Returns
    (params, batch_stats) with the encoder leaves replaced. Raises KeyError
    when an expected key is missing — a wrong-architecture checkpoint fails
    loudly, not silently.
    """
    import numpy as np

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return v.astype(np.float32)

    def conv_k(key):  # torch OIHW -> flax HWIO (depthwise [C,1,k,k]->[k,k,1,C])
        return arr(key).transpose(2, 3, 1, 0)

    p = jax.tree.map(lambda x: x, encoder_params)  # shallow copy-on-write
    s = jax.tree.map(lambda x: x, encoder_stats)

    def set_bn(dst_p, dst_s, prefix):
        dst_p["bn"] = {
            "scale": jnp.asarray(arr(f"{prefix}.weight")),
            "bias": jnp.asarray(arr(f"{prefix}.bias")),
        }
        dst_s["bn"] = {
            "mean": jnp.asarray(arr(f"{prefix}.running_mean")),
            "var": jnp.asarray(arr(f"{prefix}.running_var")),
        }

    p["stem_conv"] = {"kernel": jnp.asarray(conv_k("_conv_stem.weight"))}
    set_bn(p["stem_bn"], s["stem_bn"], "_bn0")

    for g, (si, bi, expand) in enumerate(_b3_block_layout()):
        name = f"block{si}_{bi}"
        bp, bs = p[name], s[name]
        if expand != 1:
            bp["expand_conv"] = {
                "conv": {"kernel": jnp.asarray(conv_k(f"_blocks.{g}._expand_conv.weight"))}
            }
            set_bn(bp["bn0"], bs["bn0"], f"_blocks.{g}._bn0")
        bp["dwconv"] = {
            "kernel": jnp.asarray(conv_k(f"_blocks.{g}._depthwise_conv.weight"))
        }
        set_bn(bp["bn1"], bs["bn1"], f"_blocks.{g}._bn1")
        bp["se"] = {
            "reduce": {"conv": {
                "kernel": jnp.asarray(conv_k(f"_blocks.{g}._se_reduce.weight")),
                "bias": jnp.asarray(arr(f"_blocks.{g}._se_reduce.bias")),
            }},
            "expand": {"conv": {
                "kernel": jnp.asarray(conv_k(f"_blocks.{g}._se_expand.weight")),
                "bias": jnp.asarray(arr(f"_blocks.{g}._se_expand.bias")),
            }},
        }
        bp["project_conv"] = {
            "conv": {"kernel": jnp.asarray(conv_k(f"_blocks.{g}._project_conv.weight"))}
        }
        set_bn(bp["bn2"], bs["bn2"], f"_blocks.{g}._bn2")

    for new, old, what in ((p, encoder_params, "params"), (s, encoder_stats, "batch_stats")):
        flat_new = jax.tree_util.tree_leaves_with_path(new)
        flat_old = {
            jax.tree_util.keystr(k): v.shape
            for k, v in jax.tree_util.tree_leaves_with_path(old)
        }
        for k, v in flat_new:
            ks = jax.tree_util.keystr(k)
            if flat_old.get(ks) != v.shape:
                raise ValueError(
                    f"converted encoder {what} leaf {ks} has shape {v.shape}, "
                    f"expected {flat_old.get(ks)} — wrong checkpoint variant?"
                )
    return p, s


def load_pretrained_encoder(variables, weights_path_or_state_dict):
    """Load efficientnet-pytorch B3 weights into an initialized EffiUNet
    variables dict. ``weights_path_or_state_dict``: a .pth path (torch
    format) or an already-loaded state_dict. Returns new variables.

    The reference builds efficient_unet with encoder_weights='imagenet'
    (net_factory.py:16-17); this environment has no network, so the file
    must be supplied (CLI: --encoder_weights /path/to/efficientnet-b3.pth).
    """
    if isinstance(weights_path_or_state_dict, (str, bytes)):
        import torch

        state_dict = torch.load(
            weights_path_or_state_dict, map_location="cpu", weights_only=True
        )
    else:
        state_dict = weights_path_or_state_dict
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    enc_p, enc_s = convert_torch_encoder_state_dict(
        state_dict, params["encoder"], stats["encoder"]
    )
    params["encoder"] = enc_p
    stats["encoder"] = enc_s
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


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
                "pretrained EfficientNet weights cannot be fetched in this "
                "offline build; initialize the model then apply "
                "load_pretrained_encoder(variables, '<efficientnet-b3.pth>') "
                "with a locally supplied checkpoint"
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
