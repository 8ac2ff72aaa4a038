from .mst import boruvka_mst, grid_edges
from .tree import TreeStructure, build_tree
from .tree_filter import tree_filter, tree_filter_refine

__all__ = [
    "boruvka_mst",
    "grid_edges",
    "TreeStructure",
    "build_tree",
    "tree_filter",
    "tree_filter_refine",
]
