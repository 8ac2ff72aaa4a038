"""Native C++ component tests (skip when no compiler)."""

import numpy as np
import pytest

from fedicra_tpu import native
from fedicra_tpu.ops.mst import grid_edges, mst_oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def test_native_boruvka_matches_kruskal_oracle():
    h, w = 9, 7
    eu, ev = grid_edges(h, w)
    rng = np.random.default_rng(0)
    ew = rng.uniform(1, 2, size=(3, len(eu))).astype(np.float32)
    ew[1] = np.round(ew[1] * 4) / 4  # ties
    sel = native.boruvka_mst_batch(eu, ev, ew)
    for b in range(3):
        np.testing.assert_array_equal(sel[b], mst_oracle(eu, ev, ew[b], h * w))


def test_native_matches_device_mst():
    import jax.numpy as jnp

    from fedicra_tpu.ops.mst import boruvka_mst

    h, w = 6, 8
    eu, ev = grid_edges(h, w)
    rng = np.random.default_rng(5)
    ew = rng.uniform(1, 2, size=len(eu)).astype(np.float32)
    sel_native = native.boruvka_mst_batch(eu, ev, ew)
    sel_dev = np.asarray(
        boruvka_mst(jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(ew), h * w)
    )
    np.testing.assert_array_equal(sel_native, sel_dev)
