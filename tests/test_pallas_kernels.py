"""Gaussian kernel filter (dense-CRF message passing) vs dense numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from fedicra_tpu.losses.dense_crf import dense_crf_loss
from fedicra_tpu.ops.pallas_kernels import (
    bilateral_features,
    gaussian_kernel_filter,
)


def _oracle(feats, values):
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2)
    return K @ values


def test_gaussian_filter_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n, d, c = 300, 5, 3
    feats = rng.uniform(0, 3, size=(n, d)).astype(np.float32)
    values = rng.normal(size=(n, c)).astype(np.float32)
    out = gaussian_kernel_filter(jnp.asarray(feats), jnp.asarray(values))
    np.testing.assert_allclose(np.asarray(out), _oracle(feats, values),
                               rtol=2e-4, atol=1e-4)


def test_gaussian_filter_grad_is_symmetric_filter():
    rng = np.random.default_rng(1)
    n, d, c = 120, 4, 2
    feats = jnp.asarray(rng.uniform(0, 2, size=(n, d)).astype(np.float32))
    values = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    _, vjp = jax.vjp(lambda v: gaussian_kernel_filter(feats, v), values)
    (dv,) = vjp(g)
    expect = _oracle(np.asarray(feats), np.asarray(g))
    np.testing.assert_allclose(np.asarray(dv), expect, rtol=2e-4, atol=1e-4)


def test_dense_crf_loss_runs_and_penalizes_inconsistency():
    rng = np.random.default_rng(2)
    b, h, w, k = 1, 16, 16, 2
    images = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))
    rois = jnp.ones((b, h, w))
    # uniform probs vs one-hot: the (negative) potential is larger in
    # magnitude when labels agree with their neighbours
    uniform = jnp.full((b, h, w, k), 0.5)
    onehot = jnp.zeros((b, h, w, k)).at[..., 0].set(1.0)
    l_u = float(dense_crf_loss(images, uniform, rois, weight=1.0))
    l_o = float(dense_crf_loss(images, onehot, rois, weight=1.0))
    assert np.isfinite(l_u) and np.isfinite(l_o)
    assert l_o < l_u  # consistent labelling => lower (more negative) loss


def test_bilateral_features_shape():
    img = jnp.zeros((8, 10, 3))
    f = bilateral_features(img, 0.1, 6.0)
    assert f.shape == (80, 5)
