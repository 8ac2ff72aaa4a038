"""Functional torch executor of an efficientnet-pytorch B3 encoder state_dict.

Independent implementation of the semantics the reference relies on
(networks/efficient_encoder.py over the efficientnet-pytorch package):
TF-style static SAME padding, swish, SE with input-channel reduction,
BatchNorm eps 1e-3, feature taps after stages 2/3/5/7 plus the stem.

Used by test_efficientunet_parity.py: a synthetic state_dict (exact
efficientnet-pytorch key names and shapes, built by make_b3_state_dict) is
executed here AND converted into the flax EffiUNet encoder — the outputs
must match, proving the converter and the flax topology are correct. When a
real ImageNet .pth is supplied later, the same converter loads it unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

# B0 stage table: (num_repeat, kernel, stride, expand, out_channels)
B0_STAGES = (
    (1, 3, 1, 1, 16),
    (2, 3, 2, 6, 24),
    (2, 5, 2, 6, 40),
    (3, 3, 2, 6, 80),
    (3, 5, 1, 6, 112),
    (4, 5, 2, 6, 192),
    (1, 3, 1, 6, 320),
)
WIDTH, DEPTH = 1.2, 1.4  # B3


def round_filters(f, width=WIDTH, divisor=8):
    f *= width
    new_f = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * f:
        new_f += divisor
    return int(new_f)


def round_repeats(r, depth=DEPTH):
    return int(math.ceil(depth * r))


def _same_pad(x, k, s):
    """TF-style static SAME padding (extra on bottom/right)."""
    h, w = x.shape[-2:]
    oh, ow = -(-h // s), -(-w // s)
    ph = max((oh - 1) * s + k - h, 0)
    pw = max((ow - 1) * s + k - w, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def _conv_same(x, w, b, s, groups=1):
    x = _same_pad(x, w.shape[-1], s)
    return F.conv2d(x, w, b, stride=s, groups=groups)


def _bn(x, sd, prefix):
    return F.batch_norm(
        x, sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
        training=False, eps=1e-3,
    )


def make_b3_state_dict(in_chns=3, seed=0):
    """Synthetic state_dict with efficientnet-pytorch B3 key names/shapes."""
    rng = np.random.default_rng(seed)
    sd = {}

    def t(*shape, scale=None):
        if scale is None:
            # variance-preserving: conv weights ~ 1/sqrt(fan_in) so the 26
            # synthetic blocks don't amplify fp32 noise into the comparison
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else 1
            scale = 1.0 / math.sqrt(max(fan_in, 1))
        return torch.tensor(rng.normal(0, scale, size=shape).astype(np.float32))

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.uniform(0.6, 1.4, c).astype(np.float32)
        )
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32)
        )

    stem = round_filters(32)
    sd["_conv_stem.weight"] = t(stem, in_chns, 3, 3)
    add_bn("_bn0", stem)

    g = 0
    in_ch = stem
    for (r, k, s, e, c) in B0_STAGES:
        out_ch = round_filters(c)
        for bi in range(round_repeats(r)):
            mid = in_ch * e
            if e != 1:
                sd[f"_blocks.{g}._expand_conv.weight"] = t(mid, in_ch, 1, 1)
                add_bn(f"_blocks.{g}._bn0", mid)
            sd[f"_blocks.{g}._depthwise_conv.weight"] = t(mid, 1, k, k)
            add_bn(f"_blocks.{g}._bn1", mid)
            se = max(1, int(in_ch * 0.25))
            sd[f"_blocks.{g}._se_reduce.weight"] = t(se, mid, 1, 1)
            sd[f"_blocks.{g}._se_reduce.bias"] = t(se)
            sd[f"_blocks.{g}._se_expand.weight"] = t(mid, se, 1, 1)
            sd[f"_blocks.{g}._se_expand.bias"] = t(mid)
            sd[f"_blocks.{g}._project_conv.weight"] = t(out_ch, mid, 1, 1)
            add_bn(f"_blocks.{g}._bn2", out_ch)
            in_ch = out_ch
            g += 1
    return sd


def encoder_forward(sd, x_nhwc):
    """Eval-mode encoder features [x, /2, /4, /8, /16, /32] (NHWC out)."""
    x = torch.tensor(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    feats = [x]
    h = _conv_same(x, sd["_conv_stem.weight"], None, 2)
    h = F.silu(_bn(h, sd, "_bn0"))
    feats.append(h)

    g = 0
    in_ch = h.shape[1]
    tap_after_stage = {1, 2, 4, 6}
    for si, (r, k, s, e, c) in enumerate(B0_STAGES):
        for bi in range(round_repeats(r)):
            stride = s if bi == 0 else 1
            blk_in = h
            bi_ch = h.shape[1]
            z = h
            if e != 1:
                z = F.silu(
                    _bn(
                        F.conv2d(z, sd[f"_blocks.{g}._expand_conv.weight"]),
                        sd, f"_blocks.{g}._bn0",
                    )
                )
            z = _conv_same(
                z, sd[f"_blocks.{g}._depthwise_conv.weight"], None, stride,
                groups=z.shape[1],
            )
            z = F.silu(_bn(z, sd, f"_blocks.{g}._bn1"))
            sq = z.mean(dim=(2, 3), keepdim=True)
            sq = F.silu(
                F.conv2d(sq, sd[f"_blocks.{g}._se_reduce.weight"],
                         sd[f"_blocks.{g}._se_reduce.bias"])
            )
            sq = F.conv2d(sq, sd[f"_blocks.{g}._se_expand.weight"],
                          sd[f"_blocks.{g}._se_expand.bias"])
            z = z * torch.sigmoid(sq)
            z = _bn(
                F.conv2d(z, sd[f"_blocks.{g}._project_conv.weight"]),
                sd, f"_blocks.{g}._bn2",
            )
            if stride == 1 and z.shape[1] == bi_ch:
                z = z + blk_in
            h = z
            g += 1
        if si in tap_after_stage:
            feats.append(h)
    return [f.detach().numpy().transpose(0, 2, 3, 1) for f in feats]
