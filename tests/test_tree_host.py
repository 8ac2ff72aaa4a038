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
