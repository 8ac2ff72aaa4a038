"""Learnable tree filter as dense, O(V log V), TPU-friendly primitives.

Replaces the reference's dependency-ordered CUDA scans
(/root/reference/code/utils/TreeEnergyLoss/kernels/lib_tree_filter/src/refine/
refine.cu: leaf_root_aggr_kernel / root_leaf_prop_kernel busy-wait scans, plus
custom backward kernels) with two parallel primitives over the DFS order
produced by :mod:`fedicra_tpu.ops.tree`:

Semantics. With per-node edge weight w_i = exp(logw_i) to its parent (root
weight forced to 0), the *unnormalized* filter matrix is
``M[i,j] = prod of w along the tree path i..j`` and the filter output is
``y = (M x) / (M 1)`` — identical to refine_forward (refine.cu:201-249).

Upward pass (A[v] = sum_{u in subtree(v)} W(u,v) x_u):
  Because W(u,v) = P[u]/P[v] for ancestors v (P = root-path weight product),
  A[v] is a *contiguous range sum* over the DFS order of x_u * P[u], divided
  by P[v]. We compute log P by parent pointer doubling and evaluate the range
  sums with a max-stabilized sparse table (combine keeps (M, S) = shared
  exponent + significand), which is exact to fp precision even when P
  underflows along deep paths.

Downward pass (F[v] = A[v](1 - w_v^2) + w_v F[parent]):
  A first-order linear recurrence along every root-to-leaf path, solved with
  affine-map binary lifting: each node carries (mult, add) with
  F[v] = add + mult * F[anc]; log2(V) composition rounds reach the root.

The custom VJP reproduces refine_backward_feature / refine_backward_weight
(refine.cu:251-370): dL/dx = M (g / z); dL/dw decomposes over the pairs whose
path crosses each edge into products of the saved A/F aggregates of x and 1
and freshly filtered a = g/z and t = g*y/z.

All functions operate on a single tree (vmap over batch outside).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import TreeStructure

Array = jax.Array


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


def _log_path_products(logw: Array, parent_pos: Array) -> Array:
    """logP[i] = sum of logw along the path root..i (root entry must be 0)."""
    V = logw.shape[0]
    lp = logw
    anc = parent_pos
    for _ in range(_ceil_log2(V)):
        lp = lp + lp[anc]
        anc = anc[anc]
    return lp


def _subtree_range_sums(vals: Array, logp: Array, size: Array) -> Array:
    """A[i] = sum_{j in [i, i+size_i)} vals[j] * exp(logp[j] - logp[i]).

    vals: [V, C]; logp: [V]; size: [V]. Stabilized sparse-table evaluation.
    """
    V, C = vals.shape
    K = _ceil_log2(V)
    arange = jnp.arange(V, dtype=jnp.int32)
    neg_inf = jnp.asarray(-jnp.inf, dtype=logp.dtype)

    def build_level(carry, k):
        m_prev, s_prev = carry
        half = jnp.left_shift(jnp.int32(1), k)
        idx = jnp.minimum(arange + half, V - 1)
        in_bounds = (arange + half) < V
        m2 = jnp.where(in_bounds, m_prev[idx], neg_inf)
        s2 = jnp.where(in_bounds[:, None], s_prev[idx], 0.0)
        m = jnp.maximum(m_prev, m2)
        e1 = jnp.exp(m_prev - m)
        e2 = jnp.where(jnp.isfinite(m2), jnp.exp(m2 - m), 0.0)
        s = s_prev * e1[:, None] + s2 * e2[:, None]
        return (m, s), (m, s)

    (_, _), (ms, ss) = jax.lax.scan(
        build_level, (logp, vals), jnp.arange(K, dtype=jnp.int32)
    )
    # tables level 0..K : [K+1, V]
    t_m = jnp.concatenate([logp[None], ms], axis=0)
    t_s = jnp.concatenate([vals[None], ss], axis=0)

    # greedy binary decomposition of each interval [i, i+size_i)
    acc_m = jnp.full((V,), neg_inf, dtype=logp.dtype)
    acc_s = jnp.zeros((V, C), dtype=vals.dtype)
    cur = arange
    rem = size

    def step(carry, _):
        acc_m, acc_s, cur, rem = carry
        valid = rem > 0
        rem_safe = jnp.maximum(rem, 1)
        k = 31 - jax.lax.clz(rem_safe)  # floor(log2(rem))
        cur_safe = jnp.minimum(cur, V - 1)
        seg_m = t_m[k, cur_safe]
        seg_s = t_s[k, cur_safe]
        m = jnp.maximum(acc_m, seg_m)
        e_acc = jnp.where(jnp.isfinite(acc_m), jnp.exp(acc_m - m), 0.0)
        e_seg = jnp.where(jnp.isfinite(seg_m), jnp.exp(seg_m - m), 0.0)
        s = acc_s * e_acc[:, None] + seg_s * e_seg[:, None]
        take = jnp.left_shift(jnp.int32(1), k)
        new = (
            jnp.where(valid, m, acc_m),
            jnp.where(valid[:, None], s, acc_s),
            jnp.where(valid, cur + take, cur),
            jnp.where(valid, rem - take, rem),
        )
        return new, None

    (acc_m, acc_s, _, _), _ = jax.lax.scan(
        step, (acc_m, acc_s, cur, rem), None, length=K + 1
    )
    return acc_s * jnp.exp(acc_m - logp)[:, None]


def _downward(a_coef: Array, b_add: Array, parent_pos: Array) -> Array:
    """Solve F[i] = b[i] + a[i] * F[parent(i)] (root has a=0) by lifting."""
    V = a_coef.shape[0]
    anc = parent_pos
    a = a_coef[:, None]
    b = b_add
    for _ in range(_ceil_log2(V)):
        b = b + a * b[anc]
        a = a * a[anc]
        anc = anc[anc]
    return b


def _filter_core(
    x: Array, logw: Array, parent_pos: Array, size: Array
) -> Tuple[Array, Array]:
    """Return (A, F): upward aggregates and full unnormalized filter of x.

    x: [V, C] in DFS order; logw: [V] log edge weight to parent, logw[0]
    ignored (root weight forced to 0).
    """
    logw = logw.at[0].set(0.0)
    logp = _log_path_products(logw, parent_pos)
    A = _subtree_range_sums(x, logp, size)
    w = jnp.exp(logw)
    w = w.at[0].set(0.0)
    c = A * (1.0 - w * w)[:, None]
    c = c.at[0].set(A[0])
    F = _downward(w, c, parent_pos)
    return A, F


@partial(jax.custom_vjp, nondiff_argnums=())
def tree_filter_refine(
    x: Array, logw: Array, parent_pos: Array, size: Array
) -> Array:
    """Normalized tree filter y = (M x) / (M 1) over DFS-ordered nodes."""
    y, _ = _refine_fwd(x, logw, parent_pos, size)
    return y


def _refine_fwd(x, logw, parent_pos, size):
    V, C = x.shape
    ones = jnp.ones((V, 1), dtype=x.dtype)
    xs = jnp.concatenate([x, ones], axis=1)
    A, F = _filter_core(xs, logw, parent_pos, size)
    A_x, A_1 = A[:, :C], A[:, C:]
    F_x, F_1 = F[:, :C], F[:, C:]
    y = F_x / F_1
    return y, (x, logw, parent_pos, size, A_x, A_1, F_x, F_1, y)


def _refine_bwd(res, g):
    x, logw, parent_pos, size, A_x, A_1, F_x, F_1, y = res
    V, C = x.shape
    a = g / F_1  # dL/d(unnormalized filtered x)
    t = g * y / F_1  # feeds the normalizer gradient
    at = jnp.concatenate([a, t], axis=1)
    A_at, F_at = _filter_core(at, logw, parent_pos, size)
    A_a, A_t = A_at[:, :C], A_at[:, C:]
    F_a, F_t = F_at[:, :C], F_at[:, C:]

    dx = F_a  # M (g/z); matches refine_backward_feature

    w = jnp.exp(logw.at[0].set(0.0)).at[0].set(0.0)
    p = parent_pos
    wc = w[:, None]
    s1 = jnp.sum(
        A_a * (F_x[p] - wc * A_x) + A_x * (F_a[p] - wc * A_a), axis=1
    )
    s2 = jnp.sum(
        A_t * (F_1[p] - wc * A_1) + A_1 * (F_t[p] - wc * A_t), axis=1
    )
    dw = s1 - s2
    dlogw = (w * dw).at[0].set(0.0)

    zero_i32 = np.zeros((), dtype=jax.dtypes.float0)
    d_parent = np.broadcast_to(zero_i32, parent_pos.shape)
    d_size = np.broadcast_to(zero_i32, size.shape)
    return dx, dlogw, d_parent, d_size


tree_filter_refine.defvjp(_refine_fwd, _refine_bwd)


def tree_filter(
    feature: Array,
    embed: Array,
    struct: TreeStructure,
    *,
    sigma: float = 0.02,
    low_tree: bool = True,
) -> Array:
    """TreeFilter2D.forward parity (modules/tree_filter.py:133-151).

    feature: [V, C] signal in *original* vertex order; embed: [V, D] guide
    features in original order. Edge weight between a node and its parent is
    exp(-||d||^2 / sigma) for the low-level tree, exp(-||d||^2) for high-level
    trees (build_edge_weight, modules/tree_filter.py:91-108). Gradients flow
    to ``feature`` always and to ``embed`` only when ``low_tree=False``
    (functions/refine.py:32-38).
    """
    embed_dfs = embed[struct.dfs_vertices]
    dist = jnp.sum(
        (embed_dfs - embed_dfs[struct.parent_pos]) ** 2, axis=-1
    )
    logw = -dist / sigma if low_tree else -dist
    if low_tree:
        logw = jax.lax.stop_gradient(logw)
    x_dfs = feature[struct.dfs_vertices]
    y_dfs = tree_filter_refine(x_dfs, logw, struct.parent_pos, struct.size)
    return y_dfs[struct.dfs_pos]
