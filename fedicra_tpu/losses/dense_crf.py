"""DenseCRF loss (Tang et al. regularized-loss form), exact on TPU.

Reference: utils/DenseCRFLoss.py — dead in the reference's live procedures
(only importable with the vendored SWIG permutohedral build), provided here
for full capability coverage:

    L = -(weight / N) * sum_i sum_j k(f_i, f_j) s_i s_j,   s = probs * ROI,
    k = exp(-||dxy||^2 / (2 sxy^2) - ||drgb||^2 / (2 srgb^2))

with inputs downscaled by ``scale_factor`` (images/ROIs nearest, probs
bilinear) and sigma_xy scaled accordingly (DenseCRFLoss.forward parity).

The reference approximates the filtering with a host-side permutohedral
lattice; we evaluate it exactly with the Pallas/MXU streaming kernel
(ops/pallas_kernels.py). Gradient wrt probs matches the reference backward
(-2 * K s * ROI scaled) automatically: the filter is linear and the kernel
symmetric.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.pallas_kernels import bilateral_features, gaussian_kernel_filter

Array = jax.Array


def _resize_nearest(x, hw):
    return jax.image.resize(x, (*x.shape[:-3], *hw, x.shape[-1]), method="nearest")


def dense_crf_loss(
    images: Array,  # [B,H,W,C] in [0,1] (reference feeds denormalized uint8-range; see note)
    probs: Array,  # [B,H,W,K] softmax scores
    rois: Array,  # [B,H,W] float/bool
    *,
    weight: float = 2e-9,
    sigma_rgb: float = 15.0,
    sigma_xy: float = 100.0,
    scale_factor: float = 0.5,
    image_scale: float = 255.0,
) -> Array:
    """Scalar dense-CRF loss. ``image_scale`` maps [0,1] inputs to the
    uint8 intensity range the reference's sigmas are calibrated for."""
    b, h, w, _ = probs.shape
    oh, ow = int(h * scale_factor), int(w * scale_factor)
    img_s = _resize_nearest(images * image_scale, (oh, ow))
    probs_s = jax.image.resize(
        probs, (b, oh, ow, probs.shape[-1]), method="linear"
    )
    rois_s = _resize_nearest(rois[..., None].astype(probs.dtype), (oh, ow))

    s = probs_s * rois_s  # [B,oh,ow,K]
    sxy = sigma_xy * scale_factor

    def per_image(img, seg):
        feats = bilateral_features(img, sigma_rgb, sxy)
        flat = seg.reshape(oh * ow, -1)
        AS = gaussian_kernel_filter(jax.lax.stop_gradient(feats), flat)
        return jnp.sum(flat * AS)

    total = jnp.sum(jax.vmap(per_image)(img_s, s))
    return -weight * total / b


def dense_crf_loss_lattice(
    images,  # np [B,H,W,C] in [0,1]
    probs,  # np [B,H,W,K]
    rois,  # np [B,H,W]
    *,
    weight: float = 2e-9,
    sigma_rgb: float = 15.0,
    sigma_xy: float = 100.0,
    scale_factor: float = 0.5,
    image_scale: float = 255.0,
):
    """Host permutohedral-lattice evaluation of the same loss and its
    gradient wrt probs — the reference's execution model (DenseCRFLoss.py
    forward/backward via bilateralfilter_batch). Returns (loss, d_probs)
    as numpy arrays; d_probs is at the downscaled resolution like the
    reference (its backward never upsamples, DenseCRFLoss.py:32-44).
    """
    import numpy as np

    from .. import native

    b, h, w, _ = probs.shape
    oh, ow = int(h * scale_factor), int(w * scale_factor)

    def nearest(x, hw):
        ys = (np.arange(hw[0]) * (x.shape[1] / hw[0])).astype(np.int64)
        xs = (np.arange(hw[1]) * (x.shape[2] / hw[1])).astype(np.int64)
        return x[:, ys][:, :, xs]

    img_s = nearest(np.asarray(images, np.float32) * image_scale, (oh, ow))
    probs_s = np.asarray(
        jax.image.resize(
            jnp.asarray(probs), (b, oh, ow, probs.shape[-1]), method="linear"
        )
    )
    rois_s = nearest(
        np.asarray(rois, np.float32)[..., None], (oh, ow)
    )

    yy, xx = np.meshgrid(np.arange(oh), np.arange(ow), indexing="ij")
    sxy = sigma_xy * scale_factor
    xy = np.stack([xx, yy], -1).astype(np.float32) / sxy
    s = (probs_s * rois_s).reshape(b, oh * ow, -1).astype(np.float32)

    loss = 0.0
    d_probs = np.zeros_like(s)
    for i in range(b):
        feats = np.concatenate(
            [np.broadcast_to(xy, (oh, ow, 2)), img_s[i] / sigma_rgb], -1
        ).reshape(oh * ow, -1)
        AS = native.permutohedral_filter(feats, s[i])
        loss += float(np.sum(s[i] * AS))
        # d/dprobs of -w/b * s^T K s with s = probs*roi: -2w/b * roi * (K s)
        d_probs[i] = (-2.0 * weight / b) * rois_s[i].reshape(-1, 1) * AS
    return -weight * loss / b, d_probs.reshape(b, oh, ow, -1)
