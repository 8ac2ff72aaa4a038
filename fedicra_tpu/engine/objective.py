"""The training objectives of the reference procedures, assembled in JAX.

"Ours" (FedICRA full; flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours.py:52-206):
    loss = pCE + MScaleRecurveTree(weight=tree_loss_weight)
           + 0.1 * GatedCRF + alpha * loss_lc
with loss_lc = -(1/(K-1)) sum_{k != cid} MSE(own bottleneck PCS heatmap,
stop_grad(heatmap under client k's embedding)).

Faithfully reproduced quirks:
- the k=0 foreign forward uses the *own* client embedding (emb_idx falsy
  fallback, unet.py:186);
- the foreign forwards run in train mode under no_grad, so they perturb the
  BatchNorm running statistics sequentially (torch semantics); we thread
  batch_stats through the K forwards, skipping the masked k == cid step.

"pce" (flower_pCE_2D.py:51-181): loss = pCE (+ alpha * loss_lc under FedICRA).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..losses.gated_crf import gated_crf_loss_auto
from ..losses.partial import partial_cross_entropy
from ..losses.tree_energy import multi_scale_tree_energy_loss
from .config import TrainConfig

Array = jax.Array

# flax BatchNorm decay of the UNet family (models/blocks.py:102, torch
# momentum 0.1 parity). Used to replay the sequential running-stat threading
# after the vmapped contrast forwards; tests/test_objective_contrast.py
# asserts equality with the sequential-loop semantics.
_BN_DECAY = 0.9


def _contrast_loss(
    model,
    params,
    batch_stats,
    images: Array,
    hm_own: Array,
    cid: Array,
    rng: Array,
    cfg: TrainConfig,
):
    """FedICRA cross-client heatmap contrast; returns (loss_lc, new_stats).

    All K foreign forwards run as ONE vmapped (batched) forward — a single
    conv stack over an effective batch of K*B images on the MXU — instead of
    a Python-unrolled loop of K forwards (reference: ..._Ours.py:153-163 does
    the torch loop). In train mode the forward outputs depend only on batch
    statistics, never on the running stats, so the torch-sequential
    running-stat threading s <- d*s + (1-d)*b_k is replayed exactly from the
    vmapped per-k results mut_k = d*s0 + (1-d)*b_k via s <- mut_k + d*(s-s0).
    """
    K = cfg.num_clients
    sg_params = jax.lax.stop_gradient(params)
    # identical dropout-key chain as the sequential reference loop
    keys = []
    for _ in range(K):
        rng, kd = jax.random.split(rng)
        keys.append(kd)
    keys = jnp.stack(keys)
    ks = jnp.arange(K, dtype=jnp.int32)
    # quirk: foreign index 0 falls back to the *own* cid (unet.py:186)
    embs = jnp.where(ks == 0, cid, ks)

    def one(emb, kd):
        out_k, mut = model.apply(
            {"params": sg_params, "batch_stats": batch_stats},
            images,
            train=True,
            emb_idx=jnp.broadcast_to(emb, (images.shape[0],)),
            rngs={"dropout": kd},
            mutable=["batch_stats"],
        )
        return jax.lax.stop_gradient(out_k["heatmaps"][-1]), mut["batch_stats"]

    hms, muts = jax.vmap(one)(embs, keys)
    include = ks != cid
    mses = jax.vmap(lambda hm: jnp.mean((hm_own - hm) ** 2))(hms)
    loss_lc = -jnp.sum(jnp.where(include, mses, 0.0)) / (K - 1)

    # BN running stats advance only for the K-1 included forwards, in order
    def thread(s, xs):
        mut_k, inc = xs
        advanced = jax.tree.map(
            lambda m, s_, s0: m + _BN_DECAY * (s_ - s0), mut_k, s, batch_stats
        )
        s = jax.tree.map(lambda n, s_: jnp.where(inc, n, s_), advanced, s)
        return s, None

    stats, _ = jax.lax.scan(thread, batch_stats, (muts, include))
    return loss_lc, stats


def ours_loss(
    model,
    params,
    batch_stats,
    rng: Array,
    batch: Dict[str, Array],
    cid: Array,
    cfg: TrainConfig,
) -> Tuple[Array, Tuple[Any, Dict[str, Array]]]:
    """Full FedICRA objective. Returns (loss, (new_batch_stats, metrics))."""
    images, labels = batch["image"], batch["label"]
    rng, kd = jax.random.split(rng)
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images,
        train=True,
        emb_idx=jnp.broadcast_to(cid, (images.shape[0],)),
        rngs={"dropout": kd},
        mutable=["batch_stats"],
    )
    new_stats = mut["batch_stats"]
    logits = out["logits"]
    probs = jax.nn.softmax(logits, axis=-1)

    loss_ce = partial_cross_entropy(logits, labels, cfg.num_classes)

    unlabeled_rois = (labels == cfg.num_classes).astype(jnp.float32)
    three_channel = images
    if images.shape[-1] == 1:
        three_channel = jnp.repeat(images, 3, axis=-1)
    aux1, aux2, aux3 = out["aux"]
    if cfg.tree_loss_weight == 0.0:
        # ablation / oracle configs: skip the tree computation entirely (the
        # weighted term and its gradients are identically zero). Grads for
        # the aux heads stay exact zeros, so masked-AdamW semantics —
        # including decoupled weight decay on the heads — are unchanged.
        loss_tree = jnp.float32(0.0)
    else:
        loss_tree, _, _, _ = multi_scale_tree_energy_loss(
            logits,
            three_channel,
            aux1,
            aux2,
            aux3,
            unlabeled_rois,
            cfg.tree_loss_weight,
            recursive=True,
        )

    loss_crf = gated_crf_loss_auto(probs, images, radius=cfg.gatecrf_radius)

    loss = loss_ce + loss_tree + cfg.gatecrf_weight * loss_crf

    metrics = {
        "loss_ce": loss_ce,
        "loss_tree": loss_tree,
        "loss_crf": loss_crf,
    }

    if cfg.fedicra:
        hm_own = out["heatmaps"][-1]
        loss_lc, new_stats = _contrast_loss(
            model, params, new_stats, images, hm_own, cid, rng, cfg
        )
        loss = loss + cfg.alpha * loss_lc
        metrics["loss_lc"] = loss_lc

    metrics["total_loss"] = loss
    # visualization parity (…_Ours.py:185-199): prediction of sample index 1
    vis_idx = min(1, logits.shape[0] - 1)
    metrics["vis_pred"] = jnp.argmax(logits[vis_idx], axis=-1).astype(jnp.int32)
    return loss, (new_stats, metrics)


def pce_loss(
    model,
    params,
    batch_stats,
    rng: Array,
    batch: Dict[str, Array],
    cid: Array,
    cfg: TrainConfig,
) -> Tuple[Array, Tuple[Any, Dict[str, Array]]]:
    """pCE-only objective (flower_pCE_2D.py), + contrast term under FedICRA."""
    images, labels = batch["image"], batch["label"]
    rng, kd = jax.random.split(rng)
    apply_kwargs = dict(train=True, rngs={"dropout": kd}, mutable=["batch_stats"])
    if cfg.model.startswith("unet_lc"):
        apply_kwargs["emb_idx"] = jnp.broadcast_to(cid, (images.shape[0],))
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, images, **apply_kwargs
    )
    new_stats = mut["batch_stats"]
    logits = out["logits"]
    loss_ce = partial_cross_entropy(logits, labels, cfg.num_classes)
    loss = loss_ce
    metrics = {"loss_ce": loss_ce}
    if cfg.fedicra and cfg.model.startswith("unet_lc"):
        hm_own = out["heatmaps"][-1]
        loss_lc, new_stats = _contrast_loss(
            model, params, new_stats, images, hm_own, cid, rng, cfg
        )
        loss = loss + cfg.alpha * loss_lc
        metrics["loss_lc"] = loss_lc
    metrics["total_loss"] = loss
    return loss, (new_stats, metrics)


def get_objective(cfg: TrainConfig):
    if cfg.procedure == "ours":
        return ours_loss
    if cfg.procedure == "pce":
        return pce_loss
    if cfg.procedure == "treeenergy_add":
        # the launcher accepts this procedure but its script is absent from
        # the reference; we provide it using the additive multi-scale loss.
        def add_loss(model, params, batch_stats, rng, batch, cid, cfg2):
            return _treeenergy_add(model, params, batch_stats, rng, batch, cid, cfg2)

        return add_loss
    raise ValueError(cfg.procedure)


def _treeenergy_add(model, params, batch_stats, rng, batch, cid, cfg):
    images, labels = batch["image"], batch["label"]
    rng, kd = jax.random.split(rng)
    apply_kwargs = dict(train=True, rngs={"dropout": kd}, mutable=["batch_stats"])
    if cfg.model.startswith("unet_lc"):
        apply_kwargs["emb_idx"] = jnp.broadcast_to(cid, (images.shape[0],))
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, images, **apply_kwargs
    )
    logits = out["logits"]
    loss_ce = partial_cross_entropy(logits, labels, cfg.num_classes)
    unlabeled_rois = (labels == cfg.num_classes).astype(jnp.float32)
    three = images if images.shape[-1] != 1 else jnp.repeat(images, 3, axis=-1)
    aux1, aux2, aux3 = out["aux"]
    loss_tree, _, _, _ = multi_scale_tree_energy_loss(
        logits, three, aux1, aux2, aux3, unlabeled_rois,
        cfg.tree_loss_weight, recursive=False,
    )
    loss = loss_ce + loss_tree
    metrics = {"loss_ce": loss_ce, "loss_tree": loss_tree, "total_loss": loss}
    return loss, (mut["batch_stats"], metrics)
