"""Permutohedral lattice (native C++) vs brute-force Gaussian filtering.

The lattice is an approximation (Adams et al. 2010): the separable [1 2 1]
lattice blur slightly over-smooths (effective sigma ~1.05-1.1 of target),
exactly like the implementation the reference vendors
(utils/pytorch/wrapper/bilateralfilter/permutohedral.cpp). Tolerances below
reflect that known approximation, not numerical noise.
"""

import numpy as np
import pytest

from fedicra_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _brute(pos, val, sigma=1.0):
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2 / sigma**2)
    return K @ val, K @ np.ones((pos.shape[0], 1))


@pytest.mark.parametrize("d", [2, 5])
def test_normalized_filter_close_to_gaussian(d):
    rng = np.random.default_rng(0)
    N = 400
    pos = rng.uniform(0, 3, size=(N, d)).astype(np.float32)
    val = rng.normal(size=(N, 4)).astype(np.float32)
    got = native.permutohedral_filter(pos, val)
    got_n = got / native.permutohedral_filter(pos, np.ones((N, 1), np.float32))
    exact, norm = _brute(pos, val)
    err = np.abs(got_n - exact / norm)
    assert np.median(err) < 0.02, np.median(err)
    assert err.mean() < 0.05, err.mean()


def test_constant_values_preserved():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 2, size=(200, 3)).astype(np.float32)
    val = np.full((200, 2), 1.7, np.float32)
    got = native.permutohedral_filter(pos, val)
    ones = native.permutohedral_filter(pos, np.ones((200, 1), np.float32))
    np.testing.assert_allclose(got / ones, 1.7, rtol=1e-4)


def test_batch_matches_single():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 2, size=(2, 100, 2)).astype(np.float32)
    val = rng.normal(size=(2, 100, 3)).astype(np.float32)
    batched = native.permutohedral_filter(pos, val)
    for b in range(2):
        single = native.permutohedral_filter(pos[b], val[b])
        np.testing.assert_allclose(batched[b], single, rtol=1e-5, atol=1e-5)


def test_dense_crf_lattice_vs_exact():
    """Host lattice DenseCRF loss tracks the exact Pallas/XLA evaluation."""
    import jax
    import jax.numpy as jnp

    from fedicra_tpu.losses.dense_crf import (
        dense_crf_loss,
        dense_crf_loss_lattice,
    )

    rng = np.random.default_rng(3)
    b, h, w, k = 2, 32, 32, 3
    # smooth image so the bilateral kernel has structure
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = (np.sin(yy / 7.0) * np.cos(xx / 5.0) * 0.5 + 0.5)[None, ..., None]
    images = np.clip(
        base + 0.05 * rng.normal(size=(b, h, w, 3)), 0, 1
    ).astype(np.float32)
    logits = rng.normal(size=(b, h, w, k)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    rois = (rng.uniform(size=(b, h, w)) > 0.3).astype(np.float32)

    exact = float(dense_crf_loss(jnp.asarray(images), jnp.asarray(probs), jnp.asarray(rois)))
    approx, d_probs = dense_crf_loss_lattice(images, probs, rois)
    assert np.isfinite(approx) and np.isfinite(d_probs).all()
    # The *raw* (unnormalized) lattice filter carries a scale bias at d=5 —
    # the reference's vendored lattice shares it (same raw usage in
    # DenseCRFLoss.forward) — so only sign + order of magnitude match:
    assert exact < 0 and approx < 0
    assert 0.3 < approx / exact < 1.7, (approx, exact)

    # gradient direction must agree with an exact same-resolution evaluation:
    # d/dprobs_s of -w/b * s^T K s  =  -2w/b * roi * (K s),  s = probs_s*roi
    oh = ow = h // 2
    img_s = images[:, ::2, ::2] * 255.0
    probs_s = np.asarray(
        jax.image.resize(jnp.asarray(probs), (b, oh, ow, k), method="linear")
    )
    rois_s = rois[:, ::2, ::2]
    yy2, xx2 = np.meshgrid(np.arange(oh), np.arange(ow), indexing="ij")
    xy = np.stack([xx2, yy2], -1) / 50.0  # sigma_xy * scale_factor
    g_exact = np.zeros((b, oh, ow, k))
    for i in range(b):
        f = np.concatenate(
            [np.broadcast_to(xy, (oh, ow, 2)), img_s[i] / 15.0], -1
        ).reshape(-1, 5)
        K = np.exp(-0.5 * ((f[:, None] - f[None, :]) ** 2).sum(-1))
        s = (probs_s[i] * rois_s[i][..., None]).reshape(-1, k)
        g_exact[i] = (
            (-2.0 * 2e-9 / b) * rois_s[i].reshape(-1, 1) * (K @ s)
        ).reshape(oh, ow, k)
    cos = np.sum(g_exact * d_probs) / (
        np.linalg.norm(g_exact) * np.linalg.norm(d_probs) + 1e-30
    )
    assert cos > 0.9, cos
