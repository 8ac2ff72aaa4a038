"""Fused Pallas TPU kernel for the gated CRF loss (Potts, no masks).

The XLA offset-streaming implementation (losses/gated_crf.py) makes ~120
passes over HBM — one read of the padded feature/probability arrays per
offset (the checkpointed scan rematerializes them in the backward too). This
kernel keeps one image's probabilities and features resident in VMEM
(~4.5 MB at 384^2: y 3 planes + f 5 planes, fp32) and runs the whole offset
loop on the VPU, so HBM is touched once per image per pass.

Mosaic constraints shaping the kernel:
- channels live as separate 2D planes ((C, H, W) blocks; the last two dims
  carry the (8,128) tiling) — channel-last reductions with C < 128 cannot
  be relayouted;
- the offset loop is unrolled at trace time: dynamic slice starts on the
  sublane/lane dims must be statically aligned, so each of the 120 offsets
  becomes a static slice.

Forward:   L = sum_o sum_q k_o(q) * (1 - <y(q), y(q+o)>) / (B*H*W)
Backward:  dL/dy(q) = -(2/(B*H*W)) * sum_o k_o(q) * y_pad(q+o)
           (the offset set is symmetric and k_{-o}(q+o) == k_o(q), both
           computed from the same zero-padded features), no gradient to the
           features (the guide image is a leaf in the live objective,
           …_Ours.py:143-151).

Equality with the XLA path is asserted in tests/test_gated_crf_pallas.py
(value and gradient, interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _offsets(radius: int):
    return [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if not (dy == 0 and dx == 0)
    ]


def _load_padded(dst_ref, src_ref, n_ch, r, h, w):
    dst_ref[:] = jnp.zeros_like(dst_ref)
    for c in range(n_ch):
        dst_ref[c, r : r + h, r : r + w] = src_ref[0, c]


def _shifted(planes, dy, dx, r, h, w):
    """Window [r+dy : r+dy+h, r+dx : r+dx+w] of padded (n, H+2r, W+2r)
    planes, for TRACED dy/dx: Mosaic forbids dynamic sublane/lane slice
    starts, but dynamic *rotations* (pltpu.roll) are supported — roll the
    pad into place, then take the static window. Wrapped rows/cols land in
    the discarded pad region for any |shift| <= r."""
    rolled = pltpu.roll(pltpu.roll(planes, -dy, axis=1), -dx, axis=2)
    return rolled[:, r : r + h, r : r + w]


def _offset_of(o, radius):
    """Flat offset index 0..d^2-1 -> (dy, dx, live) with the center masked."""
    d = 2 * radius + 1
    dy = o // d - radius
    dx = o % d - radius
    live = jnp.logical_or(dy != 0, dx != 0).astype(jnp.float32)
    return dy, dx, live


def _fwd_kernel(y_ref, f_ref, out_ref, yp_ref, fp_ref, *, radius, h, w):
    r = radius
    n_c = y_ref.shape[1]
    _load_padded(yp_ref, y_ref, n_c, r, h, w)
    _load_padded(fp_ref, f_ref, f_ref.shape[1], r, h, w)

    fp = fp_ref[:]
    yp = yp_ref[:]
    f0 = fp[:, r : r + h, r : r + w]
    y0 = yp[:, r : r + h, r : r + w]

    # one fori_loop body instead of 120 unrolled offset bodies: the unrolled
    # variant exceeded 30 min in the remote Mosaic compiler (round 2); this
    # compiles ~d^2 x faster and runs the same VPU math per offset
    def body(o, tot):
        dy, dx, live = _offset_of(o, radius)
        fs = _shifted(fp, dy, dx, r, h, w)
        k = jnp.exp(-0.5 * jnp.sum((fs - f0) ** 2, axis=0))
        cross = jnp.sum(_shifted(yp, dy, dx, r, h, w) * y0, axis=0)
        return tot + live * jnp.sum(k * (1.0 - cross))

    d = 2 * radius + 1
    tot = jax.lax.fori_loop(0, d * d, body, jnp.float32(0.0))

    # full-array SMEM output block (per-program (1,1) blocks violate the TPU
    # tiling rule); the grid is sequential so per-row writes don't race
    out_ref[pl.program_id(0), 0] = tot


def _bwd_kernel(y_ref, f_ref, out_ref, yp_ref, fp_ref, *, radius, h, w):
    r = radius
    n_c = y_ref.shape[1]
    _load_padded(yp_ref, y_ref, n_c, r, h, w)
    _load_padded(fp_ref, f_ref, f_ref.shape[1], r, h, w)

    fp = fp_ref[:]
    yp = yp_ref[:]
    f0 = fp[:, r : r + h, r : r + w]

    def body(o, acc):
        dy, dx, live = _offset_of(o, radius)
        fs = _shifted(fp, dy, dx, r, h, w)
        k = jnp.exp(-0.5 * jnp.sum((fs - f0) ** 2, axis=0))
        return acc + (live * k)[None] * _shifted(yp, dy, dx, r, h, w)

    d = 2 * radius + 1
    acc = jax.lax.fori_loop(
        0, d * d, body, jnp.zeros((n_c, h, w), jnp.float32)
    )
    out_ref[0] = acc


def _run(kernel, y, feats, out_shape, radius):
    b, c, h, w = y.shape
    f = feats.shape[1]
    return pl.pallas_call(
        functools.partial(kernel, radius=radius, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, f, h, w), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=out_shape[1],
        scratch_shapes=[
            pltpu.VMEM((c, h + 2 * radius, w + 2 * radius), jnp.float32),
            pltpu.VMEM((f, h + 2 * radius, w + 2 * radius), jnp.float32),
        ],
        out_shape=out_shape[0],
        interpret=jax.default_backend() == "cpu",
    )(y, feats)


def _fwd_call(y, feats, radius):
    b = y.shape[0]
    out = _run(
        _fwd_kernel,
        y,
        feats,
        (
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        radius,
    )
    return jnp.sum(out)


def _bwd_call(y, feats, radius):
    b, c, h, w = y.shape
    return _run(
        _bwd_kernel,
        y,
        feats,
        (
            jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
        ),
        radius,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gated_crf_potts(y, feats, radius):
    """y, feats in (B, C, H, W) planes layout."""
    total = _fwd_call(y, feats, radius)
    return total / (y.shape[0] * y.shape[2] * y.shape[3])


def _gated_crf_potts_fwd(y, feats, radius):
    return _gated_crf_potts(y, feats, radius), (y, feats)


def _gated_crf_potts_bwd(radius, res, g):
    y, feats = res
    acc = _bwd_call(y, feats, radius)
    denom = y.shape[0] * y.shape[2] * y.shape[3]
    return (-2.0 * g / denom) * acc, None


_gated_crf_potts.defvjp(_gated_crf_potts_fwd, _gated_crf_potts_bwd)


def gated_crf_loss_pallas(
    softmax_probs: Array,
    image: Array,
    *,
    radius: int = 5,
    kernels_desc: Optional[List[dict]] = None,
) -> Array:
    """Drop-in fused replacement for losses.gated_crf.gated_crf_loss in the
    live configuration (single Potts kernel, no masks). The guide features
    are a gradient leaf (stop-gradient), matching the live objective."""
    from ..losses.gated_crf import gated_crf_features

    if kernels_desc is None:
        kernels_desc = [{"weight": 1.0, "xy": 6.0, "rgb": 0.1}]
    assert len(kernels_desc) == 1 and float(kernels_desc[0]["weight"]) == 1.0, (
        "fused kernel covers the live single-kernel configuration; use the "
        "XLA path for multi-kernel/masked/compatibility variants"
    )
    desc = kernels_desc[0]
    feats = gated_crf_features(image, desc["xy"], desc.get("rgb"))
    y_pl = jnp.transpose(softmax_probs.astype(jnp.float32), (0, 3, 1, 2))
    f_pl = jnp.transpose(
        jax.lax.stop_gradient(feats.astype(jnp.float32)), (0, 3, 1, 2)
    )
    return _gated_crf_potts(y_pl, f_pl, radius)
