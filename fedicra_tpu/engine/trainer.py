"""Local training: compiled multi-iteration rounds with head/body phases.

Reference semantics reproduced (…_Ours.py:52-206):
- AdamW(lr, betas=(0.9,0.999), eps=1e-8, wd=1e-2) *recreated every round* at
  the current poly-decayed LR, so first/second moments reset each round; the
  per-iteration LR is base_lr * (1 - global_iter / max_iterations)^0.9.
- FedICRA head/body alternation: the first (iters - rep_iters) local steps
  update only decoder.out_conv.{kernel,bias}; the remaining rep_iters steps
  update everything else (:90-107). torch's requires_grad gating skips both
  the moment updates and the weight decay of frozen params — we reproduce
  that with two optax.masked AdamW chains, one per phase.
- PCS parameters are never updated (they are invisible to the reference's
  optimizer); gradients still flow through them into the encoder.

The whole round (iters steps) is one jitted lax.scan; the client id is a
traced scalar so a single compiled round serves every client.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ..models.params_filters import is_head_path, is_pcs_path, path_mask
from .config import TrainConfig
from .objective import get_objective

Array = jax.Array


class ClientState(NamedTuple):
    """Per-client training state carried across federated rounds."""

    params: Any
    batch_stats: Any
    current_iter: Array  # global iteration count (int32 scalar)
    rng: Array


def poly_lr(base_lr: float, it, max_iterations: int):
    return base_lr * (1.0 - it / max_iterations) ** 0.9


def _adamw(schedule):
    return optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=1e-2,
    )


def _masked_opt(inner, mask):
    """Apply ``inner`` to masked leaves and zero all other updates
    (optax.masked alone passes unmasked gradients through unchanged)."""
    inv = jax.tree.map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv),
    )


def make_round_fn(model, cfg: TrainConfig):
    """Build the jitted federated-round local-update function.

    Returns round_fn(state: ClientState, batches, cid) -> (state, metrics)
    where batches = {'image': [iters,B,H,W,C], 'label': [iters,B,H,W]}.
    """
    objective = get_objective(cfg)

    def loss_fn(params, batch_stats, rng, batch, cid):
        # AMP (reference --amp): conv compute in bf16, BN + losses fp32.
        # read at trace time by the conv blocks
        from ..models.blocks import set_compute_dtype

        set_compute_dtype(jnp.bfloat16 if cfg.amp else None)
        try:
            return objective(model, params, batch_stats, rng, batch, cid, cfg)
        finally:
            set_compute_dtype(None)

    def phase_scan(opt, carry, batches, cid):
        """Scan over one contiguous phase with a single optimizer."""

        def step(carry, batch):
            params, stats, opt_state, it, rng = carry
            rng, k = jax.random.split(rng)
            (loss, (new_stats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, k, batch, cid)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["lr"] = poly_lr(cfg.base_lr, it, cfg.max_iterations)
            return (params, new_stats, opt_state, it + 1, rng), metrics

        return jax.lax.scan(step, carry, batches)

    def round_fn(state: ClientState, batches: Dict[str, Array], cid: Array):
        params, stats = state.params, state.batch_stats
        start = state.current_iter
        rng = state.rng

        def trainable(p):
            if is_pcs_path(p):
                return False
            # torch AdamW skips parameters whose grad is None; under the
            # pCE-only objective — and under 'ours' with the tree term
            # ablated to weight 0 (oracle configs) — the DSN aux heads
            # receive no gradient, so excluding them here reproduces
            # "no update, no weight decay"
            if any(s.startswith("dsn_head") for s in p) and (
                cfg.procedure == "pce"
                or (cfg.procedure == "ours" and cfg.tree_loss_weight == 0.0)
            ):
                return False
            return True

        head_mask = path_mask(params, is_head_path)
        body_mask = path_mask(
            params, lambda p: (not is_head_path(p)) and trainable(p)
        )
        full_mask = path_mask(params, trainable)

        if cfg.fedicra:
            n_head = cfg.iters - cfg.rep_iters
            n_body = cfg.rep_iters
            sched_head = lambda count: poly_lr(
                cfg.base_lr, start + count, cfg.max_iterations
            )
            sched_body = lambda count: poly_lr(
                cfg.base_lr, start + n_head + count, cfg.max_iterations
            )
            opt_h = _masked_opt(_adamw(sched_head), head_mask)
            opt_b = _masked_opt(_adamw(sched_body), body_mask)

            head_batches = jax.tree.map(lambda x: x[:n_head], batches)
            body_batches = jax.tree.map(lambda x: x[n_head:], batches)

            carry = (params, stats, opt_h.init(params), start, rng)
            carry, m1 = phase_scan(opt_h, carry, head_batches, cid)
            params, stats, _, it, rng = carry
            carry = (params, stats, opt_b.init(params), it, rng)
            carry, m2 = phase_scan(opt_b, carry, body_batches, cid)
            params, stats, _, it, rng = carry
            metrics = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), m1, m2
            )
        else:
            sched = lambda count: poly_lr(cfg.base_lr, start + count, cfg.max_iterations)
            opt = _masked_opt(_adamw(sched), full_mask)
            carry = (params, stats, opt.init(params), start, rng)
            carry, metrics = phase_scan(opt, carry, batches, cid)
            params, stats, _, it, rng = carry

        new_state = ClientState(
            params=params, batch_stats=stats, current_iter=it, rng=rng
        )
        return new_state, metrics

    return round_fn


def init_client_state(model, cfg: TrainConfig, seed: int = None) -> ClientState:
    """Initialize parameters/batch_stats (shared init across clients, like the
    reference where every process seeds torch with 2022)."""
    seed = cfg.seed if seed is None else seed
    k = jax.random.PRNGKey(seed)
    kp, kd, kr = jax.random.split(k, 3)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.in_chns))
    variables = model.init({"params": kp, "dropout": kd}, x, train=False)
    if cfg.model == "efficient_unet" and getattr(cfg, "encoder_weights", None):
        from ..models.efficientunet import load_pretrained_encoder

        variables = load_pretrained_encoder(variables, cfg.encoder_weights)
    return ClientState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        current_iter=jnp.zeros((), jnp.int32),
        rng=kr,
    )
