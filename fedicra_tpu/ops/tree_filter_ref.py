"""Sequential numpy oracles for the tree-filter stack (test-only).

These mirror the reference algorithms directly (BFS rooting + the two
dependency-ordered scans of refine.cu) so the parallel JAX implementations in
:mod:`fedicra_tpu.ops.tree_filter` can be verified against an independent,
obviously-correct implementation on small graphs.
"""

from __future__ import annotations

from collections import deque
from typing import Tuple

import numpy as np


def root_tree(
    eu: np.ndarray, ev: np.ndarray, selected: np.ndarray, V: int, root: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """BFS-root the selected spanning tree: returns (parent, bfs_order)."""
    adj = [[] for _ in range(V)]
    for i in np.nonzero(selected)[0]:
        u, v = int(eu[i]), int(ev[i])
        adj[u].append(v)
        adj[v].append(u)
    parent = np.full(V, -1, dtype=np.int64)
    parent[root] = root
    order = [root]
    q = deque([root])
    seen = np.zeros(V, dtype=bool)
    seen[root] = True
    while q:
        u = q.popleft()
        for v in adj[u]:
            if not seen[v]:
                seen[v] = True
                parent[v] = u
                order.append(v)
                q.append(v)
    assert seen.all(), "selected edges do not span the graph"
    return parent, np.asarray(order)


def tree_filter_oracle(
    x: np.ndarray,
    log_edge_weight_to_parent: np.ndarray,
    parent: np.ndarray,
    bfs_order: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-pass filter: returns (y, A, F) with y = F_x / F_1.

    x: [V, C]; log_edge_weight_to_parent: [V] (root entry ignored).
    """
    V, C = x.shape
    w = np.exp(log_edge_weight_to_parent.astype(np.float64))
    root = bfs_order[0]
    w[root] = 0.0

    xs = np.concatenate([x.astype(np.float64), np.ones((V, 1))], axis=1)
    A = xs.copy()
    for v in bfs_order[::-1]:
        p = parent[v]
        if p != v:
            A[p] += w[v] * A[v]
    F = np.zeros_like(A)
    for v in bfs_order:
        p = parent[v]
        if p == v:
            F[v] = A[v]
        else:
            F[v] = A[v] * (1 - w[v] ** 2) + w[v] * F[p]
    y = F[:, :C] / F[:, C:]
    return y, A, F


def tree_filter_dense_oracle(
    x: np.ndarray,
    log_edge_weight_to_parent: np.ndarray,
    parent: np.ndarray,
) -> np.ndarray:
    """O(V^2) pairwise-path-product filter; independent of the two-pass form."""
    V, C = x.shape
    logw = log_edge_weight_to_parent.astype(np.float64)

    def path_to_root(v):
        path = [v]
        while parent[v] != v:
            v = parent[v]
            path.append(v)
        return path

    paths = [path_to_root(v) for v in range(V)]
    depths = {v: len(p) for v, p in enumerate(paths)}
    M = np.zeros((V, V))
    for i in range(V):
        for j in range(V):
            pi, pj = set(paths[i]), paths[j]
            # walk j's path upward until it meets i's
            lca = next(v for v in pj if v in pi)
            s = 0.0
            v = i
            while v != lca:
                s += logw[v]
                v = parent[v]
            v = j
            while v != lca:
                s += logw[v]
                v = parent[v]
            M[i, j] = np.exp(s)
    y = (M @ x) / (M @ np.ones((V, 1)))
    return y
