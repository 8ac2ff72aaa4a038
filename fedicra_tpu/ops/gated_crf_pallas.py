"""Fused Pallas TPU kernel for the gated CRF loss (Potts, no masks).

The XLA offset-streaming implementation (losses/gated_crf.py) makes ~120
passes over HBM — one read of the padded feature/probability arrays per
offset (the checkpointed scan rematerializes them in the backward too). This
kernel keeps one image's probabilities and features resident in VMEM
(~4.5 MB at 384^2: y 384*384*3 + f 384*384*5, fp32) and runs the whole
offset loop on the VPU, so HBM is touched once per image per pass.

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


def _offsets(radius: int) -> np.ndarray:
    return np.asarray(
        [
            (dy, dx)
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if not (dy == 0 and dx == 0)
        ],
        dtype=np.int32,
    )


def _fwd_kernel(off_ref, y_ref, f_ref, out_ref, yp_ref, fp_ref, *, radius, h, w):
    r = radius
    n_off = off_ref.shape[0]
    yp_ref[:] = jnp.zeros_like(yp_ref)
    fp_ref[:] = jnp.zeros_like(fp_ref)
    yp_ref[r : r + h, r : r + w, :] = y_ref[0]
    fp_ref[r : r + h, r : r + w, :] = f_ref[0]

    y0 = y_ref[0]
    f0 = f_ref[0]

    def body(i, tot):
        dy = off_ref[i, 0]
        dx = off_ref[i, 1]
        ysh = yp_ref[pl.ds(r + dy, h), pl.ds(r + dx, w), :]
        fsh = fp_ref[pl.ds(r + dy, h), pl.ds(r + dx, w), :]
        d = fsh - f0
        k = jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))
        cross = jnp.sum(ysh * y0, axis=-1)
        return tot + jnp.sum(k * (1.0 - cross))

    out_ref[0, 0] = jax.lax.fori_loop(0, n_off, body, jnp.float32(0.0))


def _bwd_kernel(off_ref, y_ref, f_ref, out_ref, yp_ref, fp_ref, *, radius, h, w):
    r = radius
    n_off = off_ref.shape[0]
    yp_ref[:] = jnp.zeros_like(yp_ref)
    fp_ref[:] = jnp.zeros_like(fp_ref)
    yp_ref[r : r + h, r : r + w, :] = y_ref[0]
    fp_ref[r : r + h, r : r + w, :] = f_ref[0]
    f0 = f_ref[0]

    def body(i, acc):
        dy = off_ref[i, 0]
        dx = off_ref[i, 1]
        ysh = yp_ref[pl.ds(r + dy, h), pl.ds(r + dx, w), :]
        fsh = fp_ref[pl.ds(r + dy, h), pl.ds(r + dx, w), :]
        d = fsh - f0
        k = jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))
        return acc + k[..., None] * ysh

    acc = jax.lax.fori_loop(
        0, n_off, body, jnp.zeros((h, w, y_ref.shape[-1]), jnp.float32)
    )
    out_ref[0] = acc


def _run(kernel, offsets, y, feats, out_shape, radius):
    b, h, w, c = y.shape
    f = feats.shape[-1]
    grid = (b,)
    return pl.pallas_call(
        functools.partial(kernel, radius=radius, h=h, w=w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h, w, c), lambda i, off: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, w, f), lambda i, off: (i, 0, 0, 0)),
            ],
            out_specs=out_shape[1],
            scratch_shapes=[
                pltpu.VMEM((h + 2 * radius, w + 2 * radius, c), jnp.float32),
                pltpu.VMEM((h + 2 * radius, w + 2 * radius, f), jnp.float32),
            ],
        ),
        out_shape=out_shape[0],
        interpret=jax.default_backend() == "cpu",
    )(offsets, y, feats)


def _fwd_call(offsets, y, feats, radius):
    b = y.shape[0]
    out = _run(
        _fwd_kernel,
        offsets,
        y,
        feats,
        (
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            pl.BlockSpec((1, 1), lambda i, off: (i, 0), memory_space=pltpu.SMEM),
        ),
        radius,
    )
    return jnp.sum(out)


def _bwd_call(offsets, y, feats, radius):
    b, h, w, c = y.shape
    return _run(
        _bwd_kernel,
        offsets,
        y,
        feats,
        (
            jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
            pl.BlockSpec((1, h, w, c), lambda i, off: (i, 0, 0, 0)),
        ),
        radius,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gated_crf_potts(y, feats, radius):
    offsets = jnp.asarray(_offsets(radius))
    total = _fwd_call(offsets, y, feats, radius)
    return total / (y.shape[0] * y.shape[1] * y.shape[2])


def _gated_crf_potts_fwd(y, feats, radius):
    return _gated_crf_potts(y, feats, radius), (y, feats)


def _gated_crf_potts_bwd(radius, res, g):
    y, feats = res
    offsets = jnp.asarray(_offsets(radius))
    acc = _bwd_call(offsets, y, feats, radius)
    denom = y.shape[0] * y.shape[1] * y.shape[2]
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
    return _gated_crf_potts(
        softmax_probs.astype(jnp.float32),
        jax.lax.stop_gradient(feats.astype(jnp.float32)),
        radius,
    )
