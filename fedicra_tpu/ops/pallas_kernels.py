"""Pallas TPU kernels: exact Gaussian kernel filtering (dense-CRF message
passing) as a flash-attention-style streaming kernel.

The reference's dense-CRF path filters class scores with a 5-D Gaussian
kernel via an *approximate* permutohedral lattice on the host
(utils/pytorch/wrapper/bilateralfilter/permutohedral.cpp, OpenMP over the
batch). On TPU the O(N^2) kernel sum is a few hundred GFLOPs of matmul —
MXU territory — so we compute it *exactly*:

    out_i = sum_j exp(-0.5 * ||f_i - f_j||^2) * v_j
          = sum_j exp(f_i . f_j - 0.5|f_i|^2 - 0.5|f_j|^2) * v_j

streamed over column tiles with an fp32 accumulator: no N x N matrix ever
materializes (flash-attention structure, without the softmax normalizer).

The kernel is linear in ``values`` and the Gaussian kernel matrix is
symmetric, so the custom VJP is the same kernel applied to the cotangent.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _filter_kernel(feats_ref, norms_ref, values_ref, out_ref, *, tn: int):
    """One row-tile: out[q] = sum over all column tiles of exp(s) @ v."""
    i = pl.program_id(0)
    tm = out_ref.shape[0]
    qs = feats_ref[pl.ds(i * tm, tm), :]  # [TM, D]
    qn = norms_ref[pl.ds(i * tm, tm), :]  # [TM, 1]
    n_pad = feats_ref.shape[0]

    def body(j, acc):
        ks = feats_ref[pl.ds(j * tn, tn), :]  # [TN, D]
        kn = norms_ref[pl.ds(j * tn, tn), :]  # [TN, 1]
        s = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TM, TN]
        e = jnp.exp(s - 0.5 * qn - 0.5 * kn.T)
        vs = values_ref[pl.ds(j * tn, tn), :]  # [TN, C]
        return acc + jax.lax.dot_general(
            e, vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros((tm, out_ref.shape[1]), jnp.float32)
    acc = jax.lax.fori_loop(0, n_pad // tn, body, acc)
    out_ref[...] = acc


def _gaussian_filter_impl(feats: Array, values: Array, tm: int, tn: int) -> Array:
    n, d = feats.shape
    c = values.shape[1]
    n_pad = _round_up(n, max(tm, tn))
    d_pad = _round_up(d, 8)
    c_pad = _round_up(c, 8)

    f = jnp.zeros((n_pad, d_pad), feats.dtype).at[:n, :d].set(feats)
    v = jnp.zeros((n_pad, c_pad), values.dtype).at[:n, :c].set(values)
    norms = jnp.sum(f * f, axis=1, keepdims=True)
    # padded rows: +inf norm kills their kernel contribution (exp -> 0)
    pad_mask = (jnp.arange(n_pad) >= n)[:, None]
    norms = jnp.where(pad_mask, jnp.inf, norms)

    grid = (n_pad // tm,)
    out = pl.pallas_call(
        functools.partial(_filter_kernel, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_pad), jnp.float32),
    )(f, norms, v)
    return out[:n, :c]


def _gaussian_filter_xla(feats: Array, values: Array, tn: int = 2048) -> Array:
    """XLA fallback with the same tiling (CPU tests / non-TPU backends)."""
    n, d = feats.shape
    c = values.shape[1]
    n_pad = _round_up(n, tn)
    f = jnp.zeros((n_pad, d), feats.dtype).at[:n].set(feats)
    v = jnp.zeros((n_pad, c), values.dtype).at[:n].set(values)
    norms = jnp.sum(f * f, axis=1, keepdims=True)
    norms = jnp.where((jnp.arange(n_pad) >= n)[:, None], jnp.inf, norms)

    def body(j, acc):
        ks = jax.lax.dynamic_slice(f, (j * tn, 0), (tn, d))
        kn = jax.lax.dynamic_slice(norms, (j * tn, 0), (tn, 1))
        vs = jax.lax.dynamic_slice(v, (j * tn, 0), (tn, c))
        s = f @ ks.T - 0.5 * norms - 0.5 * kn.T
        return acc + jnp.exp(s) @ vs

    acc = jax.lax.fori_loop(
        0, n_pad // tn, body, jnp.zeros((n_pad, c), jnp.float32)
    )
    return acc[:n]


@jax.custom_vjp
def gaussian_kernel_filter(feats: Array, values: Array) -> Array:
    """out_i = sum_j exp(-||f_i - f_j||^2 / 2) v_j  (exact, self included)."""
    return _dispatch(feats, values)


def _dispatch(feats, values):
    if jax.default_backend() in ("tpu", "axon"):
        return _gaussian_filter_impl(feats, values, tm=256, tn=512)
    return _gaussian_filter_xla(feats, values)


def _gkf_fwd(feats, values):
    out = _dispatch(feats, values)
    return out, (feats,)


def _gkf_bwd(res, g):
    (feats,) = res
    # kernel matrix is symmetric; filter the cotangent. No feature gradient
    # (the dense-CRF loss treats guide features as constants).
    dv = _dispatch(feats, g)
    import numpy as np

    zero = np.zeros((), dtype=jax.dtypes.float0)
    return np.broadcast_to(zero, feats.shape), dv


gaussian_kernel_filter.defvjp(_gkf_fwd, _gkf_bwd)


def bilateral_features(
    image_hwc: Array, sigma_rgb: float, sigma_xy: float
) -> Array:
    """[x/sxy, y/sxy, rgb/srgb] feature stack, flattened to [H*W, 2+C]
    (bilateralfilter.cpp:4-19 parity)."""
    h, w, c = image_hwc.shape
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    feats = jnp.concatenate(
        [
            (xs / sigma_xy)[..., None],
            (ys / sigma_xy)[..., None],
            image_hwc / sigma_rgb,
        ],
        axis=-1,
    )
    return feats.reshape(h * w, -1)
