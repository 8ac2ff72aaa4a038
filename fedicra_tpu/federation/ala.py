"""ALA-style adaptive local aggregation (the FedICRA client-side merge).

Reference: MyModel.set_weights (flower_common.py:491-633). On receiving the
server's global weights, a FedICRA client:

1. adopts the global weights wholesale when (a) they equal the local weights
   (first round) or (b) ``iter_global <= 50`` (flower_common.py:520-526);
2. otherwise loads the global weights into the "lower" layers, and for the
   "higher" layers (names containing out_conv/up4/up3/up2/up1,
   flower_common.py:506) learns per-element gates w in [0,1] blending
       merged = global + (local - global) * w
   by CE loss on the local train data: one forward/backward per batch, then
       w <- clamp(w - eta * grad_merged * (local - global), 0, 1),  eta = 1
   (flower_common.py:596-597). The first time ALA runs it loops whole epochs
   until the std of the last 10 per-epoch losses drops below 0.1; afterwards
   a single epoch per round (flower_common.py:604-620).

Faithfully reproduced quirks (SURVEY §2.6):
- #3 gates re-initialize to ones every round (the reference's hasattr guard
  checks the wrong attribute name);
- #4 the blend anchors at the *local* weights (w=1 -> local) because of the
  reference's inverted server/local naming;
- the gate-learning forward runs in train mode (dropout active, BN batch
  statistics used) but its BN running-stat updates are discarded — only the
  gated parameters are copied back; the model's BN stats remain the global
  ones.

TPU-native: a whole gate-learning epoch is one jitted lax.scan; the
convergence criterion of the first round is driven from the host (the
federation simulator) or by a bounded lax.while_loop in the SPMD path.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..losses.partial import partial_cross_entropy
from ..models.params_filters import is_ala_gated_path
from ..engine.config import TrainConfig

Array = jax.Array

ALA_SKIP_ITERS = 50  # flower_common.py:524
ALA_ETA = 1.0
ALA_NUM_PRE_LOSS = 10
ALA_STD_THRESHOLD = 0.1
ALA_MAX_EPOCHS = 50  # safety bound for the first-round convergence loop


def _split_gated(params):
    flat = traverse_util.flatten_dict(params)
    gated = {k: v for k, v in flat.items() if is_ala_gated_path(k)}
    rest = {k: v for k, v in flat.items() if not is_ala_gated_path(k)}
    return gated, rest


def _merge(gated, rest):
    return traverse_util.unflatten_dict({**gated, **rest})


def init_gates(params) -> Dict:
    gated, _ = _split_gated(params)
    return {k: jnp.ones_like(v) for k, v in gated.items()}


def make_ala_epoch_fn(model, cfg: TrainConfig):
    """Build the jitted single-epoch gate-learning function.

    ala_epoch(gates, local_g, global_g, rest, stats, batches, rng, cid)
      -> (gates, last_batch_loss)
    where local_g/global_g are the gated leaves (flat dicts), rest the
    non-gated leaves taken from the global weights.
    """

    def loss_on_batch(gates, local_g, global_g, rest, stats, batch, rng, cid):
        merged_g = {
            k: global_g[k] + (local_g[k] - global_g[k]) * gates[k] for k in gates
        }
        params = _merge(merged_g, rest)

        # rematerialized: inside the epoch scan the fwd activations of a
        # 384^2 bs-12 U-Net would otherwise sit live through the backward,
        # on top of the (already near-HBM-ceiling) resident training step
        @jax.checkpoint
        def ce(params_):
            out = model.apply(
                {"params": params_, "batch_stats": stats},
                batch["image"],
                train=True,
                emb_idx=jnp.broadcast_to(cid, (batch["image"].shape[0],)),
                rngs={"dropout": rng},
                mutable=["batch_stats"],  # updates discarded (quirk)
            )[0]
            return partial_cross_entropy(
                out["logits"], batch["label"], cfg.num_classes
            )

        loss, grads = jax.value_and_grad(ce)(params)
        grads_g = {
            k: v
            for k, v in traverse_util.flatten_dict(grads).items()
            if k in gates
        }
        return loss, grads_g

    def ala_epoch(gates, local_g, global_g, rest, stats, batches, rng, cid):
        def step(carry, batch):
            gates, rng = carry
            rng, k = jax.random.split(rng)
            loss, grads_g = loss_on_batch(
                gates, local_g, global_g, rest, stats, batch, k, cid
            )
            gates = {
                k2: jnp.clip(
                    gates[k2] - ALA_ETA * grads_g[k2] * (local_g[k2] - global_g[k2]),
                    0.0,
                    1.0,
                )
                for k2 in gates
            }
            return (gates, rng), loss

        (gates, rng), losses = jax.lax.scan(step, (gates, rng), batches)
        return gates, losses[-1]

    return jax.jit(ala_epoch)


class AlaClientState(NamedTuple):
    start_phase: bool  # True until the first converged ALA run


@jax.jit
def _tree_abs_diff(a, b):
    return sum(
        jnp.sum(jnp.abs(x - y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def ala_set_weights(
    model,
    cfg: TrainConfig,
    ala_epoch_fn,
    local_params,
    global_params,
    global_stats,
    batch_provider,
    rng: Array,
    cid: int,
    iter_global: int,
    start_phase: bool,
) -> Tuple[Any, Any, bool]:
    """The full client-side merge. Returns (params, batch_stats, start_phase).

    ``batch_provider(epoch_idx)`` yields a freshly shuffled+augmented epoch of
    batches {'image': [nb,B,H,W,C], 'label': [nb,B,H,W]} — like the
    reference's re-iterated DataLoader.
    """
    # skip conditions (flower_common.py:520-526): identical weights or early.
    # The reference checks only its first parameter (the encoder in_conv
    # kernel, which always trains); our pytree's first leaf can be a
    # gradient-free one, so compare the whole tree to carry the same intent.
    identical = float(_tree_abs_diff(global_params, local_params)) == 0.0
    skip_iters = getattr(cfg, "ala_skip_iters", ALA_SKIP_ITERS)
    if identical or iter_global <= skip_iters:
        return global_params, global_stats, start_phase

    local_g, _ = _split_gated(local_params)
    global_g, global_rest = _split_gated(global_params)
    gates = {k: jnp.ones_like(v) for k, v in local_g.items()}  # quirk #3

    losses = []
    epoch = 0
    cid_arr = jnp.asarray(cid, jnp.int32)
    while True:
        rng, k = jax.random.split(rng)
        batches = batch_provider(epoch)
        gates, last_loss = ala_epoch_fn(
            gates, local_g, global_g, global_rest, global_stats, batches, k, cid_arr
        )
        losses.append(float(last_loss))
        epoch += 1
        if not start_phase:
            break
        if (
            len(losses) > ALA_NUM_PRE_LOSS
            and float(np.std(losses[-ALA_NUM_PRE_LOSS:])) < ALA_STD_THRESHOLD
        ):
            break
        if epoch >= ALA_MAX_EPOCHS:
            break

    merged_g = {
        k: global_g[k] + (local_g[k] - global_g[k]) * gates[k] for k in gates
    }
    params = _merge(merged_g, global_rest)
    return params, global_stats, False
