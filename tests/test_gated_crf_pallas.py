"""Fused Pallas gated-CRF kernel == XLA offset-streaming implementation.

Runs in interpret mode on the CPU test mesh; the same kernel compiles for
TPU (ops/gated_crf_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedicra_tpu.losses.gated_crf import gated_crf_loss
from fedicra_tpu.ops.gated_crf_pallas import gated_crf_loss_pallas


def _data(seed=0, b=2, h=16, w=16, c=3):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    image = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))
    return probs, image


@pytest.mark.parametrize("radius", [2, 5])
def test_pallas_value_matches_xla(radius):
    probs, image = _data()
    ref = float(gated_crf_loss(probs, image, radius=radius))
    got = float(gated_crf_loss_pallas(probs, image, radius=radius))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pallas_gradient_matches_xla():
    probs, image = _data(seed=1)

    def ref_loss(p):
        return gated_crf_loss(p, image, radius=3)

    def pallas_loss(p):
        return gated_crf_loss_pallas(p, image, radius=3)

    g_ref = jax.grad(ref_loss)(probs)
    g_got = jax.grad(pallas_loss)(probs)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_auto_dispatch_env_knob(monkeypatch):
    """gated_crf_loss_auto: XLA by default, Pallas under FEDICRA_GATED_CRF."""
    from fedicra_tpu.losses.gated_crf import gated_crf_loss_auto

    probs, image = _data(seed=3, h=12, w=12)
    base = float(gated_crf_loss(probs, image, radius=2))
    monkeypatch.delenv("FEDICRA_GATED_CRF", raising=False)
    np.testing.assert_allclose(
        float(gated_crf_loss_auto(probs, image, radius=2)), base, rtol=1e-6
    )
    monkeypatch.setenv("FEDICRA_GATED_CRF", "pallas")
    np.testing.assert_allclose(
        float(gated_crf_loss_auto(probs, image, radius=2)), base, rtol=1e-5
    )


def test_pallas_grad_through_softmax():
    """End-to-end through softmax (the objective's usage)."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(1, 12, 12, 3)).astype(np.float32))
    image = jnp.asarray(rng.uniform(size=(1, 12, 12, 3)).astype(np.float32))

    def f_ref(l):
        return gated_crf_loss(jax.nn.softmax(l, -1), image, radius=2)

    def f_got(l):
        return gated_crf_loss_pallas(jax.nn.softmax(l, -1), image, radius=2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_got)(logits)),
        np.asarray(jax.grad(f_ref)(logits)),
        rtol=1e-4,
        atol=1e-6,
    )
