"""Server aggregation strategies: FedAvg / FedAdagrad / FedAdam / FedYogi /
FedICRA.

Reference: get_strategy (flower_common.py:433-448) exposes flwr's FedAvg and
the FedOpt family; FedICRA *is* FedAvg server-side (flower_common.py:451-455)
— all personalization is client-side. Weighted aggregation uses each client's
``num_examples`` which the reference sets to the *batch count*
len(trainloader), not the sample count (flower_common.py:72) — reproduced.

TPU-native: aggregation is a weighted tree-mean that runs on device; in the
sharded simulation it lowers to a single psum over the client mesh axis. The
FedOpt server optimizers (Reddi et al., Adaptive Federated Optimization;
flwr 1.0 defaults eta=1e-1, beta_1=0.9, beta_2=0.99, tau=1e-9) act on the
aggregate delta in weight space.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

PERSONALIZED_FL = ("FedICRA",)
CENTRALIZED_FL = ("FedAvg", "FedAdagrad", "FedAdam", "FedYogi")


def weighted_tree_mean(trees: Sequence[Any], weights: Sequence[float]) -> Any:
    """Weighted average of pytrees (the FedAvg aggregate)."""
    w = jnp.asarray(weights, dtype=jnp.float32)
    w = w / jnp.sum(w)

    def avg(*leaves):
        stacked = jnp.stack(leaves)
        return jnp.tensordot(w, stacked, axes=1).astype(leaves[0].dtype)

    return jax.tree.map(avg, *trees)


def stacked_weighted_mean(stacked_tree: Any, weights: Array) -> Any:
    """Weighted mean over a leading client axis (for the vmapped/sharded sim).

    In a client-sharded mesh this contraction lowers to a psum over ICI.
    """
    w = weights / jnp.sum(weights)

    def avg(leaf):
        return jnp.tensordot(w, leaf, axes=1).astype(leaf.dtype)

    return jax.tree.map(avg, stacked_tree)


class Strategy:
    """Server strategy: aggregates client results into new global weights."""

    name = "base"

    def __init__(self):
        self._state = None

    def aggregate(self, global_tree: Any, client_trees: Sequence[Any],
                  weights: Sequence[float]) -> Any:
        raise NotImplementedError


class FedAvg(Strategy):
    name = "FedAvg"

    def aggregate(self, global_tree, client_trees, weights):
        return weighted_tree_mean(client_trees, weights)


class FedICRA(FedAvg):
    """Server-side identical to FedAvg (flower_common.py:451-455)."""

    name = "FedICRA"

    def __repr__(self):
        return "FedICRA(server_side=FedAvg)"


class _FedOpt(Strategy):
    def __init__(self, eta: float = 1e-1, beta_1: float = 0.9,
                 beta_2: float = 0.99, tau: float = 1e-9):
        super().__init__()
        self.eta = eta
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.tau = tau
        self._m = None
        self._v = None

    def _update_v(self, v, delta):
        raise NotImplementedError

    def aggregate(self, global_tree, client_trees, weights):
        y = weighted_tree_mean(client_trees, weights)
        delta = jax.tree.map(lambda a, b: a - b, y, global_tree)
        if self._m is None:
            self._m = jax.tree.map(jnp.zeros_like, delta)
            self._v = jax.tree.map(jnp.zeros_like, delta)
        self._m = jax.tree.map(
            lambda m, d: self.beta_1 * m + (1 - self.beta_1) * d, self._m, delta
        )
        self._v = jax.tree.map(self._update_v, self._v, delta)
        return jax.tree.map(
            lambda x, m, v: x + self.eta * m / (jnp.sqrt(v) + self.tau),
            global_tree,
            self._m,
            self._v,
        )


class FedAdagrad(_FedOpt):
    name = "FedAdagrad"

    def __init__(self, **kw):
        kw.setdefault("beta_1", 0.0)
        super().__init__(**kw)

    def _update_v(self, v, d):
        return v + d * d


class FedAdam(_FedOpt):
    name = "FedAdam"

    def _update_v(self, v, d):
        return self.beta_2 * v + (1 - self.beta_2) * d * d


class FedYogi(_FedOpt):
    name = "FedYogi"

    def _update_v(self, v, d):
        d2 = d * d
        return v - (1 - self.beta_2) * d2 * jnp.sign(v - d2)


def get_strategy(name: str, **kwargs) -> Strategy:
    table = {c.name: c for c in (FedAvg, FedICRA, FedAdagrad, FedAdam, FedYogi)}
    if name not in table:
        raise ValueError(f"unknown strategy {name!r}")
    return table[name](**kwargs)
