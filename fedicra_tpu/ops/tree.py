"""Rooted-tree structure from an MST edge list, via a parallel Euler tour.

TPU-native replacement for the reference's CUDA BFS ordering
(/root/reference/code/utils/TreeEnergyLoss/kernels/lib_tree_filter/src/bfs/
bfs.cu: adjacency build + busy-wait frontier BFS producing sorted_index /
sorted_parent / sorted_child). Instead of a BFS order + child lists, we
produce a DFS (Euler) order in which every subtree is a *contiguous
interval* — the key property that lets the tree filter run as dense range
queries and pointer-doubling instead of a dependency-ordered sequential scan.

Algorithm (classic PRAM, fully vectorized):
1. Each of the V-1 tree edges becomes two arcs; arcs are grouped by source
   vertex with a stable sort.
2. Euler circuit successor: succ(u->v) = the arc after (v->u) in v's cyclic
   arc list.
3. The circuit is cut at the first arc out of the root and list-ranked with
   Wyllie pointer doubling (log2(2E) gather rounds).
4. Arc ranks give, per vertex: discovery (in) time, finish (out) time, parent,
   subtree size; vertices sorted by in-time give the DFS order.

Everything is static-shape: the edge list stays padded to the full grid edge
count E with a selection mask.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class TreeStructure(NamedTuple):
    """Rooted tree in DFS indexing (all arrays [V]).

    dfs_vertices[i] = original vertex id at DFS position i
    dfs_pos[v]      = DFS position of original vertex v
    parent_pos[i]   = DFS position of the parent of the node at position i
                      (root points to itself)
    size[i]         = subtree size of the node at DFS position i
    """

    dfs_vertices: Array
    dfs_pos: Array
    parent_pos: Array
    size: Array


def _ceil_log2(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2))))


@partial(jax.jit, static_argnums=(3,))
def build_tree(eu: Array, ev: Array, selected: Array, num_vertices: int) -> TreeStructure:
    """Root the selected spanning tree at vertex 0 and build DFS structure."""
    E = eu.shape[0]
    V = num_vertices
    A = 2 * E
    arange_a = jnp.arange(A, dtype=jnp.int32)

    # arc 2i = (u->v), arc 2i+1 = (v->u)
    arc_src = jnp.stack([eu, ev], axis=1).reshape(-1)
    arc_dst = jnp.stack([ev, eu], axis=1).reshape(-1)
    act = jnp.repeat(selected, 2)

    # group active arcs by source vertex (stable => by arc id within a group)
    sortkey = jnp.where(act, arc_src, V).astype(jnp.int32)
    order = jnp.argsort(sortkey, stable=True).astype(jnp.int32)  # sorted pos -> arc
    rank = jnp.zeros((A,), jnp.int32).at[order].set(arange_a)  # arc -> sorted pos

    deg = jnp.zeros((V,), jnp.int32).at[arc_src].add(act.astype(jnp.int32))
    group_start = jnp.cumsum(deg) - deg  # [V]

    # next arc (cyclically) within the source group
    src = arc_src
    gs = group_start[src]
    d = jnp.maximum(deg[src], 1)
    next_pos = gs + (rank - gs + 1) % d
    next_in_group = order[next_pos]

    # Euler successor: succ(u->v) = next arc after (v->u) around v
    twin = arange_a ^ 1
    succ = next_in_group[twin]

    # cut the circuit at the first arc out of the root (vertex 0)
    start_arc = order[group_start[0]]
    pred = jnp.zeros((A,), jnp.int32).at[jnp.where(act, succ, A)].set(
        arange_a, mode="drop"
    )
    last_arc = pred[start_arc]

    # Wyllie list ranking: dist[a] = #steps from a to last_arc
    nxt = jnp.where(arange_a == last_arc, arange_a, succ)
    dist = jnp.where(arange_a == last_arc, 0, 1).astype(jnp.int32)
    for _ in range(_ceil_log2(A) + 1):
        dist = dist + dist[nxt]
        nxt = nxt[nxt]
    n_arcs = 2 * (V - 1)
    pos = (n_arcs - 1) - dist  # position of each arc in the Euler sequence

    # discovery arcs: first traversal of the edge
    is_down = act & (pos < pos[twin])

    parent = jnp.zeros((V,), jnp.int32)
    parent = parent.at[jnp.where(is_down, arc_dst, V)].set(arc_src, mode="drop")
    in_time = jnp.full((V,), -1, jnp.int32)
    in_time = in_time.at[jnp.where(is_down, arc_dst, V)].set(pos, mode="drop")
    out_time = jnp.full((V,), n_arcs, jnp.int32)
    out_time = out_time.at[jnp.where(is_down, arc_dst, V)].set(
        pos[twin], mode="drop"
    )

    size = jnp.where(
        jnp.arange(V) == 0, V, (out_time - in_time + 1) // 2
    ).astype(jnp.int32)

    dfs_vertices = jnp.argsort(in_time, stable=True).astype(jnp.int32)
    dfs_pos = jnp.zeros((V,), jnp.int32).at[dfs_vertices].set(
        jnp.arange(V, dtype=jnp.int32)
    )

    parent_pos = dfs_pos[parent[dfs_vertices]]
    parent_pos = parent_pos.at[0].set(0)  # root self-loop
    size_dfs = size[dfs_vertices]

    return TreeStructure(
        dfs_vertices=dfs_vertices,
        dfs_pos=dfs_pos,
        parent_pos=parent_pos,
        size=size_dfs,
    )
