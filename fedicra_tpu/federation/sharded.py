"""Single-program SPMD federated round over a (client, data) mesh.

The whole federated round — per-client ALA merge, K local training
iterations per client, and the server's weighted aggregation — is ONE jitted
XLA program:

- client states and batches carry a leading client axis, sharded over the
  mesh's 'client' axis (GSPMD keeps each client's update on its own devices);
- each client's batch dimension is additionally sharded over the 'data' axis
  (pure data parallelism; XLA inserts the cross-device reductions for BN
  batch statistics and loss means automatically, so semantics match the
  unsharded program);
- the FedAvg aggregate is a weighted mean over the client axis, lowering to
  an ICI psum — per-round aggregation overhead is a collective, not a gRPC
  transfer of the full state_dict (reference: flower_common.py:63-71).

ALA inside this program uses the steady-state regime (single gate-learning
epoch, lax.cond-gated on iter_global > 50); the first-round
converge-until-std loop exists only in the host-driven simulator
(federation/ala.py), matching the reference's behaviour after round one.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util
from jax.sharding import NamedSharding, PartitionSpec as P

from ..engine.config import TrainConfig
from ..engine.trainer import ClientState, make_round_fn
from ..losses.partial import partial_cross_entropy
from ..models.params_filters import is_ala_gated_path
from .ala import ALA_ETA, ALA_SKIP_ITERS
from .strategies import stacked_weighted_mean

Array = jax.Array


def _ala_merge_one_epoch(model, cfg, local_params, global_params, stats,
                         ala_batches, rng, cid):
    """One fixed-shape gate-learning epoch (steady-state ALA)."""
    flat_local = traverse_util.flatten_dict(local_params)
    flat_global = traverse_util.flatten_dict(global_params)
    gated_keys = [k for k in flat_local if is_ala_gated_path(k)]
    local_g = {k: flat_local[k] for k in gated_keys}
    global_g = {k: flat_global[k] for k in gated_keys}
    rest = {k: flat_global[k] for k in flat_global if k not in local_g}
    gates = {k: jnp.ones_like(v) for k, v in local_g.items()}

    def step(carry, batch):
        gates, rng = carry
        rng, kd = jax.random.split(rng)
        merged = traverse_util.unflatten_dict(
            {**rest, **{k: global_g[k] + (local_g[k] - global_g[k]) * gates[k]
                        for k in gates}}
        )

        def ce(p):
            out = model.apply(
                {"params": p, "batch_stats": stats},
                batch["image"],
                train=True,
                emb_idx=jnp.broadcast_to(cid, (batch["image"].shape[0],)),
                rngs={"dropout": kd},
                mutable=["batch_stats"],
            )[0]
            return partial_cross_entropy(out["logits"], batch["label"],
                                         cfg.num_classes)

        grads = jax.grad(ce)(merged)
        flat_grads = traverse_util.flatten_dict(grads)
        gates = {
            k: jnp.clip(
                gates[k] - ALA_ETA * flat_grads[k] * (local_g[k] - global_g[k]),
                0.0, 1.0,
            )
            for k in gates
        }
        return (gates, rng), None

    (gates, _), _ = jax.lax.scan(step, (gates, rng), ala_batches)
    merged = traverse_util.unflatten_dict(
        {**rest, **{k: global_g[k] + (local_g[k] - global_g[k]) * gates[k]
                    for k in gates}}
    )
    return merged


def make_sharded_round_fn(model, cfg: TrainConfig, mesh):
    """Build the fully-sharded federated round.

    Returns fn(stacked_states, global_payload, batches, ala_batches,
               iter_global, weights) -> (stacked_states, global_payload, metrics)

    stacked_states: ClientState with leading client axis K
    batches: {'image': [K, iters, B, H, W, C], 'label': [K, iters, B, H, W]}
    ala_batches: same structure with the ALA epoch's batch count (or None)
    weights: [K] float (client batch counts — the FedAvg weighting)
    """
    round_fn = make_round_fn(model, cfg)

    def client_step(state: ClientState, global_payload, batches, ala_batches,
                    iter_global, cid):
        gp, gs = global_payload["params"], global_payload["batch_stats"]
        if cfg.fedicra and ala_batches is not None:
            def do_ala(operand):
                lp, rng = operand
                return _ala_merge_one_epoch(
                    model, cfg, lp, gp, gs, ala_batches, rng, cid
                )

            def skip(operand):
                return gp

            rng, k_ala = jax.random.split(state.rng)
            params = jax.lax.cond(
                iter_global > ALA_SKIP_ITERS, do_ala, skip,
                (state.params, k_ala),
            )
            state = state._replace(params=params, batch_stats=gs, rng=rng)
        else:
            state = state._replace(params=gp, batch_stats=gs)
        new_state, metrics = round_fn(state, batches, cid)
        last_metrics = jax.tree.map(lambda m: m[-1], metrics)
        return new_state, last_metrics

    has_ala = cfg.fedicra

    def shard_body(states, payload, batches_l, ala_l, iter_global, cids_l,
                   weights_l, total_weight):
        """Runs on one 'client'-axis shard; local_K clients live here.

        The 'data' mesh axis is NOT named here — it stays under automatic
        GSPMD partitioning, so per-client batch maths (BN statistics, loss
        means) keep exact unsharded semantics.
        """
        local_K = cids_l.shape[0]

        def one(i):
            st = jax.tree.map(lambda x: x[i], states)
            bt = jax.tree.map(lambda x: x[i], batches_l)
            al = (
                jax.tree.map(lambda x: x[i], ala_l) if ala_l is not None else None
            )
            return client_step(st, payload, bt, al, iter_global, cids_l[i])

        results = [one(i) for i in range(local_K)]
        new_states = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[r[0] for r in results]
        )
        metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *[r[1] for r in results])

        # partial weighted sums -> psum over the client axis = FedAvg over ICI
        def wavg(leaf):
            part = jnp.tensordot(weights_l, leaf, axes=1)
            return jax.lax.psum(part, "client") / total_weight

        payload_tree = {
            "params": new_states.params,
            "batch_stats": new_states.batch_stats,
        }
        new_global = jax.tree.map(wavg, payload_tree)
        return new_states, new_global, metrics

    from jax import shard_map

    ala_spec = P("client") if has_ala else None

    def fed_round(stacked_states, global_payload, batches, ala_batches,
                  iter_global, weights):
        total_weight = jnp.sum(weights)
        K = weights.shape[0]
        cids = jnp.arange(K, dtype=jnp.int32)
        body = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(
                P("client"), P(), P("client"), ala_spec, P(), P("client"),
                P("client"), P(),
            ),
            out_specs=(P("client"), P(), P("client")),
            axis_names={"client"},
            check_vma=False,
        )
        return body(
            stacked_states, global_payload, batches,
            ala_batches if has_ala else None, iter_global, cids, weights,
            total_weight,
        )

    # sharding layout for caller-side placement
    state_sh = NamedSharding(mesh, P("client"))
    batch_sh = NamedSharding(mesh, P("client", None, "data"))
    repl = NamedSharding(mesh, P())

    jitted = jax.jit(fed_round)
    return jitted, dict(state=state_sh, batch=batch_sh, replicated=repl)


def place_stacked(tree, sharding):
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
