"""Host-offloaded (C++) tree filter vs the pure-JAX device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedicra_tpu import native
from fedicra_tpu.losses.tree_energy import multi_scale_tree_energy_loss

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def _inputs(seed=0, B=2, H=12, W=12, C=2):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    image = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    aux = [
        jnp.asarray(rng.normal(size=(B, H // s, W // s, C)).astype(np.float32))
        for s in (4, 2, 1)
    ]
    rois = jnp.asarray(rng.integers(0, 2, size=(B, H, W)).astype(np.float32))
    return logits, image, aux, rois


def test_host_filter_matches_jax_path_values_and_grads():
    logits, image, aux, rois = _inputs()

    def loss(host):
        def f(lg, a1, a2, a3):
            l, AS1, AS2, AS3 = multi_scale_tree_energy_loss(
                lg, image, a1, a2, a3, rois, 0.1, host_offload=host
            )
            return l, (AS1, AS2, AS3)

        (val, ASs), grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3),
                                               has_aux=True)(logits, *aux)
        return val, ASs, grads

    v_jax, AS_jax, g_jax = loss(False)
    v_host, AS_host, g_host = loss(True)

    np.testing.assert_allclose(float(v_host), float(v_jax), rtol=2e-4, atol=1e-6)
    for a, b in zip(AS_host, AS_jax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)
    for a, b in zip(g_host, g_jax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=2e-4)


def test_host_additive_chain_matches_jax_path():
    """The C++ fan-out (MScaleAdd, flower_common.py:692-753) chain must match
    the device additive path in value and gradients — the split trainer uses
    it for the treeenergy_add procedure on callback-less runtimes."""
    from fedicra_tpu.losses.tree_energy_host import multi_scale_tree_loss_host

    logits, image, aux, rois = _inputs(seed=7)

    def f(lg, a1, a2, a3):
        l, *_ = multi_scale_tree_energy_loss(
            lg, image, a1, a2, a3, rois, 0.1, recursive=False,
            host_offload=False,
        )
        return l

    v_jax, g_jax = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(logits, *aux)

    prob, softmax_vjp = jax.vjp(
        lambda lg: jax.nn.softmax(lg, axis=-1), logits
    )
    v_host, d_prob, d_a1, d_a2, d_a3 = multi_scale_tree_loss_host(
        np.asarray(prob), np.asarray(image), *[np.asarray(a) for a in aux],
        np.asarray(rois), 0.1, recursive=False,
    )
    (d_logits,) = softmax_vjp(jnp.asarray(d_prob))

    np.testing.assert_allclose(v_host, float(v_jax), rtol=2e-4, atol=1e-6)
    # atol covers sign(prob - AS_k) flips on near-zero L1 residuals: fp32
    # order differences make isolated elements cross zero differently, each
    # worth ~scale = weight/N (~1.4e-3 here); all other elements match to 2e-4
    for got, want in zip((d_logits, d_a1, d_a2, d_a3), g_jax):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-3, atol=8e-4
        )


def test_host_resize_matches_jax_linear():
    """resize_up_host must reproduce jax.image.resize(method='linear')
    exactly — the device model's aux upsampling — for the odd shape ratios
    the decoder heads produce (4x, 2x, and non-divisor cases)."""
    from fedicra_tpu.losses.tree_energy_host import resize_up_host

    rng = np.random.default_rng(5)
    for h, w, H, W in [(4, 4, 16, 16), (6, 6, 12, 12), (3, 5, 12, 20),
                       (7, 7, 12, 12), (12, 12, 12, 12)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        want = np.asarray(
            jax.image.resize(jnp.asarray(x), (2, H, W, 3), method="linear")
        )
        got = resize_up_host(x, H, W)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_host_loss_native_res_aux_equals_full_res():
    """Shipping native-res aux + adjoint-mapped cotangents is exactly
    equivalent to the old full-res protocol: same loss, same d_prob, and
    <d_native, delta> == <d_full, resize(delta)> for any perturbation."""
    from fedicra_tpu.losses.tree_energy import _resize_bilinear
    from fedicra_tpu.losses.tree_energy_host import (
        multi_scale_tree_loss_host,
        resize_up_host,
    )

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 12, 12, 3
    prob = rng.uniform(0.05, 1.0, size=(B, H, W, C)).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    low = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    aux = [rng.normal(size=(B, H // s, W // s, C)).astype(np.float32)
           for s in (4, 2, 1)]
    rois = rng.integers(0, 2, size=(B, H, W)).astype(np.float32)

    aux_full = [np.asarray(_resize_bilinear(jnp.asarray(a), (H, W)))
                for a in aux]
    v_full, dp_full, *d_full = multi_scale_tree_loss_host(
        prob, low, *aux_full, rois, 0.1
    )
    v_nat, dp_nat, *d_nat = multi_scale_tree_loss_host(
        prob, low, *aux, rois, 0.1
    )

    np.testing.assert_allclose(v_nat, v_full, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(dp_nat, dp_full, rtol=2e-3, atol=1e-6)
    for a, dn, df in zip(aux, d_nat, d_full):
        assert dn.shape == a.shape
        delta = rng.normal(size=a.shape).astype(np.float32)
        lhs = float(np.vdot(dn, delta))
        rhs = float(np.vdot(df, resize_up_host(delta, H, W)))
        np.testing.assert_allclose(lhs, rhs, rtol=2e-3, atol=1e-5)


def test_host_filter_under_jit():
    logits, image, aux, rois = _inputs(seed=3)

    @jax.jit
    def f(lg):
        l, *_ = multi_scale_tree_energy_loss(
            lg, image, *aux, rois, 0.1, host_offload=True
        )
        return l

    v = f(logits)
    assert np.isfinite(float(v))
    g = jax.jit(jax.grad(f))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_low_tree_disk_cache_roundtrip(tmp_path, monkeypatch):
    """A process restart (watchdog resume/quiesce yield) must reload the
    identical low-tree structure from disk instead of rebuilding it."""
    monkeypatch.setenv("FEDICRA_TREE_CACHE_DIR", str(tmp_path))
    from fedicra_tpu.losses import tree_energy_host as teh
    from fedicra_tpu.ops.mst import grid_edges

    H = W = 16
    rng = np.random.default_rng(7)
    low = rng.random((2, H * W, 3), np.float32)
    eu, ev = grid_edges(H, W)
    s1 = teh._low_structure_cached(low, (H, W), eu, ev, 0.02)
    teh._LOW_TREE_CACHE.clear()  # simulate a fresh process
    before = teh.low_tree_cache_stats()["disk_hits"]
    s2 = teh._low_structure_cached(low, (H, W), eu, ev, 0.02)
    assert teh.low_tree_cache_stats()["disk_hits"] == before + 1
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("recursive", [True, False])
def test_packed_chain_matches_unpacked_bitwise(recursive):
    """The packed-layout chain (one (B,H,W,4C) array in, one cotangent
    array out — the split trainer's wire format) must reproduce the
    unpacked channel-slice path bit-for-bit, for f32 and for bf16 input
    (bf16 rows widen exactly in the C++ deinterleave)."""
    import ml_dtypes

    from fedicra_tpu.losses import tree_energy_host as teh

    B, H, W, C = 3, 20, 20, 3
    rng = np.random.default_rng(11)
    packed = rng.random((B, H, W, 4 * C), np.float32)
    low = rng.random((B, H, W, 3), np.float32)
    rois = (rng.random((B, H, W)) < 0.25).astype(np.float32)

    for arr in (packed, packed.astype(ml_dtypes.bfloat16)):
        wide = np.asarray(arr, np.float32)
        sl = lambda k: np.ascontiguousarray(wide[..., k * C : (k + 1) * C])
        ref = teh.multi_scale_tree_loss_host(
            sl(0), low, sl(1), sl(2), sl(3), rois, 0.1,
            recursive=recursive, per_image=True,
        )
        li, d = teh.multi_scale_tree_loss_host_packed(
            arr, low, rois, 0.1, recursive=recursive
        )
        np.testing.assert_array_equal(li, ref[0])
        np.testing.assert_array_equal(d, np.concatenate(ref[1:], axis=-1))
