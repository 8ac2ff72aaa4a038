"""Loss parity tests against torch-based oracles (torch CPU is an
independent implementation used only as a numerical reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from fedicra_tpu.losses import (
    gated_crf_loss,
    multi_scale_tree_energy_loss,
    partial_cross_entropy,
    partial_dice_loss,
    tree_energy_loss,
)


def test_partial_ce_matches_torch_ignore_index():
    rng = np.random.default_rng(0)
    nc = 3
    logits = rng.normal(size=(2, 8, 8, nc)).astype(np.float32)
    labels = rng.integers(0, nc + 1, size=(2, 8, 8))  # nc == ignore
    ours = partial_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), nc)
    ref = tF.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(),
        ignore_index=nc,
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_partial_ce_all_ignored_is_finite():
    nc = 2
    logits = jnp.zeros((1, 4, 4, nc))
    labels = jnp.full((1, 4, 4), nc)
    assert np.isfinite(float(partial_cross_entropy(logits, labels, nc)))


def test_partial_dice_reference_formula():
    rng = np.random.default_rng(1)
    nc = 3
    probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 6, 6, nc)).astype(np.float32)))
    labels = rng.integers(0, nc + 1, size=(2, 6, 6))
    ours = float(partial_dice_loss(probs, jnp.asarray(labels), nc))

    p = np.asarray(probs)
    ignore = (labels != nc).astype(np.float64)
    smooth = 1e-5
    total = 0.0
    for i in range(nc):
        t = (labels == i).astype(np.float64)
        s = p[..., i]
        inter = (s * t * ignore).sum()
        dice = (2 * inter + smooth) / ((s * s * ignore).sum() + (t * t * ignore).sum() + smooth)
        total += 1 - dice
    np.testing.assert_allclose(ours, total / nc, rtol=1e-5)


def _gated_crf_torch_oracle(
    y_soft, image, radius, sigma_xy, sigma_rgb,
    mask_src=None, mask_dst=None, compatibility=None,
):
    """Independent torch implementation of the gated CRF formula (NCHW),
    covering the full ModelLossSemsegGatedCRF surface (masks + non-Potts
    compatibility, gate_crf_loss.py:77-113)."""
    y = torch.from_numpy(y_soft)  # (B,C,H,W)
    img = torch.from_numpy(image)
    B, C, H, W = y.shape
    d = 2 * radius + 1
    cols = torch.arange(W, dtype=torch.float32).view(1, 1, 1, W).expand(B, 1, H, W)
    rows = torch.arange(H, dtype=torch.float32).view(1, 1, H, 1).expand(B, 1, H, W)
    feat = torch.cat([cols / sigma_xy, rows / sigma_xy, img / sigma_rgb], dim=1)

    def unfold(t):
        n, c = t.shape[:2]
        return tF.unfold(t, d, 1, radius).view(n, c, d, d, H, W)

    fu = unfold(feat)
    diff = fu - feat.view(B, -1, 1, 1, H, W)
    kern = torch.exp(-0.5 * (diff ** 2).sum(dim=1, keepdim=True))
    kern[:, :, radius, radius] = 0

    denom = float(B * H * W)

    def fix(m):
        m = torch.from_numpy(m).view(B, 1, H, W).clone()
        m[m != m] = 0.0
        m[m < 1.0] = 0.0
        return m

    if mask_src is not None:
        ms = fix(mask_src)
        denom = float(ms.sum().clamp(min=1))
        kern = kern * unfold(ms)
    if mask_dst is not None:
        md = fix(mask_dst)
        denom = float(md.sum().clamp(min=1))
        kern = kern * md.view(B, 1, 1, 1, H, W)

    yu = unfold(y)
    prod = (kern * yu).view(B, C, d * d, H, W).sum(dim=2)
    if compatibility is None:
        loss = kern.sum() - (prod * y).sum()
    else:
        compat = torch.from_numpy(compatibility).float()
        compat = (C - 1) * tF.normalize(compat, p=1, dim=1)
        y_cn = y.permute(1, 0, 2, 3).contiguous().view(C, -1)
        pk_nc = prod.permute(0, 2, 3, 1).contiguous().view(-1, C)
        loss = (compat * (y_cn @ pk_nc)).sum()
    return float(loss / denom)


@pytest.mark.parametrize("radius", [2, 5])
def test_gated_crf_matches_torch_oracle(radius):
    rng = np.random.default_rng(2)
    B, C, H, W = 2, 3, 16, 16
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    image = rng.uniform(size=(B, H, W, 3)).astype(np.float32)

    ours = float(
        gated_crf_loss(jnp.asarray(probs), jnp.asarray(image), radius=radius)
    )
    ref = _gated_crf_torch_oracle(
        np.transpose(probs, (0, 3, 1, 2)).copy(),
        np.transpose(image, (0, 3, 1, 2)).copy(),
        radius,
        6.0,
        0.1,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_gated_crf_masks_match_torch_oracle():
    """mask_src (neighbor gate + denom) and mask_dst (center gate + denom
    override), gate_crf_loss.py:79-90."""
    rng = np.random.default_rng(6)
    B, C, H, W = 2, 3, 12, 12
    probs = np.asarray(
        jax.nn.softmax(jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)))
    )
    image = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    # masks with edge values in (0,1) to exercise the <1 -> 0 fixup, plus NaN
    msrc = rng.choice([0.0, 0.5, 1.0], size=(B, H, W)).astype(np.float32)
    mdst = rng.choice([0.0, 1.0], size=(B, H, W)).astype(np.float32)
    msrc[0, 0, 0] = np.nan

    for src, dst in ((msrc, None), (None, mdst), (msrc, mdst)):
        ours = float(
            gated_crf_loss(
                jnp.asarray(probs), jnp.asarray(image), radius=3,
                mask_src=jnp.asarray(src) if src is not None else None,
                mask_dst=jnp.asarray(dst) if dst is not None else None,
            )
        )
        ref = _gated_crf_torch_oracle(
            np.transpose(probs, (0, 3, 1, 2)).copy(),
            np.transpose(image, (0, 3, 1, 2)).copy(),
            3, 6.0, 0.1, mask_src=src, mask_dst=dst,
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, err_msg=str((src is None, dst is None)))


def test_gated_crf_compatibility_matches_torch_oracle():
    """Non-Potts class compatibility branch (gate_crf_loss.py:97-113)."""
    rng = np.random.default_rng(7)
    B, C, H, W = 2, 3, 12, 12
    probs = np.asarray(
        jax.nn.softmax(jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)))
    )
    image = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    compat = np.array(
        [[0.0, 1.0, 2.0], [1.0, 0.0, 0.5], [2.0, 0.5, 0.0]], np.float32
    )
    ours = float(
        gated_crf_loss(
            jnp.asarray(probs), jnp.asarray(image), radius=3,
            compatibility=jnp.asarray(compat),
        )
    )
    ref = _gated_crf_torch_oracle(
        np.transpose(probs, (0, 3, 1, 2)).copy(),
        np.transpose(image, (0, 3, 1, 2)).copy(),
        3, 6.0, 0.1, compatibility=compat,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_tree_energy_loss_smoke_and_grads():
    rng = np.random.default_rng(3)
    B, H, W, C = 2, 12, 12, 2
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    image = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    aux = [
        jnp.asarray(rng.normal(size=(B, H // s, W // s, C)).astype(np.float32))
        for s in (4, 2, 1)
    ]
    rois = jnp.asarray(rng.integers(0, 2, size=(B, H, W)).astype(np.float32))

    def loss_fn(lg, a1, a2, a3):
        l, *_ = multi_scale_tree_energy_loss(lg, image, a1, a2, a3, rois, 0.1)
        return l

    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(logits, *aux)
    assert np.isfinite(float(val)) and float(val) >= 0
    # gradients flow to preds and to all high-level aux features
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_tree_energy_single_scale_identity_guide():
    """Uniform guide image => low tree averages probs globally; with no high
    feats, AS is the per-image mean prob and the loss is |prob - mean|."""
    B, H, W, C = 1, 6, 6, 2
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    image = jnp.ones((B, H, W, 3))
    rois = jnp.ones((B, H, W))
    loss, AS = tree_energy_loss(logits, image, None, rois, 1.0)
    prob = np.asarray(jax.nn.softmax(logits, axis=-1))
    expect_AS = np.broadcast_to(prob.mean(axis=(1, 2), keepdims=True), prob.shape)
    np.testing.assert_allclose(np.asarray(AS), expect_AS, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(loss), np.abs(prob - expect_AS).sum() / (B * H * W), rtol=1e-4
    )
