"""Tests for the MST / tree-structure / tree-filter stack against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedicra_tpu.ops.mst import boruvka_mst, grid_edges, mst_oracle
from fedicra_tpu.ops.tree import build_tree
from fedicra_tpu.ops.tree_filter import tree_filter, tree_filter_refine
from fedicra_tpu.ops.tree_filter_ref import (
    root_tree,
    tree_filter_dense_oracle,
    tree_filter_oracle,
)


def _random_grid_weights(h, w, seed, ties=False):
    rng = np.random.default_rng(seed)
    eu, ev = grid_edges(h, w)
    ew = rng.uniform(1.0, 2.0, size=len(eu)).astype(np.float32)
    if ties:
        ew = np.round(ew * 4) / 4  # force many ties
    return eu, ev, ew


@pytest.mark.parametrize("h,w,ties", [(4, 5, False), (7, 6, False), (8, 8, True), (1, 9, False), (9, 1, False)])
def test_boruvka_matches_kruskal(h, w, ties):
    eu, ev, ew = _random_grid_weights(h, w, seed=h * 100 + w, ties=ties)
    V = h * w
    sel = np.asarray(boruvka_mst(jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(ew), V))
    ref = mst_oracle(eu, ev, ew, V)
    assert sel.sum() == V - 1
    np.testing.assert_array_equal(sel, ref)


def test_boruvka_batched_vmap():
    h, w = 6, 6
    eu, ev = grid_edges(h, w)
    rng = np.random.default_rng(0)
    ews = rng.uniform(1, 2, size=(3, len(eu))).astype(np.float32)
    sel = jax.vmap(lambda e: boruvka_mst(jnp.asarray(eu), jnp.asarray(ev), e, h * w))(
        jnp.asarray(ews)
    )
    for b in range(3):
        np.testing.assert_array_equal(
            np.asarray(sel[b]), mst_oracle(eu, ev, ews[b], h * w)
        )


def test_build_tree_structure():
    h, w = 5, 7
    V = h * w
    eu, ev, ew = _random_grid_weights(h, w, seed=3)
    sel = mst_oracle(eu, ev, ew, V)
    ts = build_tree(jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(sel), V)
    parent_ref, bfs = root_tree(eu, ev, sel, V)

    dfs_vertices = np.asarray(ts.dfs_vertices)
    dfs_pos = np.asarray(ts.dfs_pos)
    parent_pos = np.asarray(ts.parent_pos)
    size = np.asarray(ts.size)

    # dfs order is a permutation starting at the root
    assert sorted(dfs_vertices.tolist()) == list(range(V))
    assert dfs_vertices[0] == 0
    np.testing.assert_array_equal(dfs_pos[dfs_vertices], np.arange(V))

    # parents agree with BFS-rooted parents
    for i in range(V):
        v = dfs_vertices[i]
        p = dfs_vertices[parent_pos[i]]
        assert p == parent_ref[v], (v, p, parent_ref[v])

    # subtree sizes: recompute from parents
    size_ref = np.ones(V, dtype=int)
    order = np.argsort(-np.asarray([_depth(parent_ref, v) for v in range(V)]))
    for v in order:
        if parent_ref[v] != v:
            size_ref[parent_ref[v]] += size_ref[v]
    np.testing.assert_array_equal(size, size_ref[dfs_vertices])

    # every subtree is a contiguous DFS interval
    for i in range(V):
        sub = set()
        v = dfs_vertices[i]
        for u in range(V):
            uu = u
            while True:
                if uu == v:
                    sub.add(u)
                    break
                if parent_ref[uu] == uu:
                    break
                uu = parent_ref[uu]
        assert sub == set(dfs_vertices[i : i + size[i]].tolist())


def _depth(parent, v):
    d = 0
    while parent[v] != v:
        v = parent[v]
        d += 1
    return d


@pytest.mark.parametrize("h,w,scale", [(4, 4, 1.0), (6, 5, 1.0), (6, 5, 40.0)])
def test_tree_filter_matches_oracles(h, w, scale):
    """scale=40 drives path products deep into underflow territory (logw ~ -40
    per edge) to exercise the stabilized range sums."""
    V = h * w
    eu, ev, ew = _random_grid_weights(h, w, seed=7)
    sel = mst_oracle(eu, ev, ew, V)
    ts = build_tree(jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(sel), V)
    parent_ref, bfs = root_tree(eu, ev, sel, V)

    rng = np.random.default_rng(5)
    x = rng.uniform(0.1, 1.0, size=(V, 3)).astype(np.float32)
    logw_vertex = -scale * rng.uniform(0.0, 1.0, size=V).astype(np.float32)

    # oracle works in original vertex indexing
    y_ref, _, _ = tree_filter_oracle(x, logw_vertex, parent_ref, bfs)
    y_dense = tree_filter_dense_oracle(x, logw_vertex, parent_ref)
    np.testing.assert_allclose(y_ref, y_dense, rtol=1e-5, atol=1e-6)

    dfs = np.asarray(ts.dfs_vertices)
    x_dfs = jnp.asarray(x[dfs])
    logw_dfs = jnp.asarray(logw_vertex[dfs])
    y = tree_filter_refine(x_dfs, logw_dfs, ts.parent_pos, ts.size)
    y = np.asarray(y)[np.asarray(ts.dfs_pos)]
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=1e-5)


def test_tree_filter_grad_feature_and_weight():
    h, w = 4, 4
    V = h * w
    eu, ev, ew = _random_grid_weights(h, w, seed=11)
    sel = mst_oracle(eu, ev, ew, V)
    ts = build_tree(jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(sel), V)
    parent_ref, bfs = root_tree(eu, ev, sel, V)
    dfs = np.asarray(ts.dfs_vertices)

    rng = np.random.default_rng(13)
    x = rng.uniform(0.1, 1.0, size=(V, 2)).astype(np.float64)
    logw_vertex = -rng.uniform(0.1, 2.0, size=V).astype(np.float64)
    g = rng.normal(size=(V, 2)).astype(np.float64)

    def loss_jax(x_dfs, logw_dfs):
        y = tree_filter_refine(x_dfs, logw_dfs, ts.parent_pos, ts.size)
        return jnp.sum(y * jnp.asarray(g[dfs]))

    x_dfs = jnp.asarray(x[dfs].astype(np.float32))
    logw_dfs = jnp.asarray(logw_vertex[dfs].astype(np.float32))
    dx, dlogw = jax.grad(loss_jax, argnums=(0, 1))(x_dfs, logw_dfs)

    # finite differences through the numpy oracle
    def loss_np(x_, logw_):
        y, _, _ = tree_filter_oracle(x_, logw_, parent_ref, bfs)
        return float(np.sum(y * g))

    eps = 1e-5
    dx_fd = np.zeros_like(x)
    for i in range(V):
        for c in range(2):
            xp = x.copy(); xp[i, c] += eps
            xm = x.copy(); xm[i, c] -= eps
            dx_fd[i, c] = (loss_np(xp, logw_vertex) - loss_np(xm, logw_vertex)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dx)[np.asarray(ts.dfs_pos)], dx_fd, rtol=2e-3, atol=1e-4)

    dlogw_fd = np.zeros(V)
    for i in range(V):
        lp = logw_vertex.copy(); lp[i] += eps
        lm = logw_vertex.copy(); lm[i] -= eps
        dlogw_fd[i] = (loss_np(x, lp) - loss_np(x, lm)) / (2 * eps)
    dlogw_v = np.asarray(dlogw)[np.asarray(ts.dfs_pos)]
    # root entry has no real edge; oracle ignores it too
    root = int(dfs[0])
    dlogw_fd[root] = 0.0
    np.testing.assert_allclose(dlogw_v, dlogw_fd, rtol=2e-3, atol=1e-4)


def test_tree_filter_wrapper_identity_weights():
    """With all-equal embeddings, every edge weight is 1 => output = mean(x)."""
    h, w = 3, 4
    V = h * w
    eu, ev = grid_edges(h, w)
    ew = np.ones(len(eu), dtype=np.float32)
    sel = mst_oracle(eu, ev, ew, V)
    ts = build_tree(jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(sel), V)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(V, 2)).astype(np.float32))
    embed = jnp.ones((V, 3))
    y = tree_filter(x, embed, ts, sigma=0.02, low_tree=True)
    np.testing.assert_allclose(
        np.asarray(y), np.broadcast_to(np.asarray(x).mean(0), (V, 2)), rtol=1e-4
    )


def test_dense_structure_fast_matches_reference():
    """The torch-mirror dense oracle's Euler-tour + sparse-table LCA
    structure (added for the cross-framework collapse experiment, where the
    naive O(V^3) build dominated) must equal the naive reference build
    elementwise — ancestor matrix and all-pairs LCA — on grid MSTs and on a
    degenerate path tree."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_mirror import (
        _dense_tree_structure,
        _dense_tree_structure_ref,
        _kruskal_bfs_parent,
    )

    rng = np.random.default_rng(7)
    cases = []
    for h, w in ((4, 5), (8, 8), (1, 9), (6, 11)):
        feats = rng.normal(size=(h * w, 3)).astype(np.float32)
        cases.append(_kruskal_bfs_parent(feats, h, w))
    # path graph rooted at one end (worst-case depth)
    path = np.arange(-1, 30, dtype=np.int64)
    path[0] = 0
    cases.append(path)
    for parent in cases:
        P_ref, L_ref = _dense_tree_structure_ref(parent)
        P, L = _dense_tree_structure(parent)
        np.testing.assert_array_equal(P, P_ref)
        np.testing.assert_array_equal(L, L_ref)
