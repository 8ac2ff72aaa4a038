"""Split-step trainer: device forward -> host tree loss -> device backward.

Some PJRT runtimes (notably tunneled dev TPUs) cannot run host callbacks
inside jit, which blocks the pure_callback tree-filter offload. This trainer
achieves the same computation with an explicit three-phase step:

  part1 (jit): the main forward; returns softmax probs + full-res-resized
          aux heads (same rng as part2's forward, so activations match).
  host:   the native C++ multi-scale tree loss forward + analytic cotangents
          (losses/tree_energy_host.py) on (prob, image, aux, ROI).
  part2 (jit): the full objective where the tree term is *injected linearly*
          — lin - stop_grad(lin) + const — so its gradient is exactly the
          host cotangents while CE/GatedCRF/contrast differentiate natively;
          then the masked-AdamW phase update, all in one dispatch.

Gradient equality with the monolithic device path is exact up to float
order; verified in tests/test_split_trainer.py.

The FedICRA head/body phase structure, per-round optimizer reset, poly LR,
and rng derivation mirror engine/trainer.py so trajectories agree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.gated_crf import gated_crf_loss
from ..losses.partial import partial_cross_entropy
from ..losses.tree_energy import _resize_bilinear
from ..models.params_filters import is_head_path, is_pcs_path, path_mask
from .config import TrainConfig
from .objective import _contrast_loss
from .trainer import ClientState, _adamw, _masked_opt, poly_lr

Array = jax.Array


def supports_host_callbacks() -> bool:
    """Probe whether the default backend can run pure_callback under jit."""
    try:
        @jax.jit
        def f(x):
            return jax.pure_callback(
                lambda v: np.asarray(v) + 1.0,
                jax.ShapeDtypeStruct((), jnp.float32),
                x,
            )

        return bool(np.isfinite(float(f(jnp.float32(1.0)))))
    except Exception:
        return False


def make_split_round_fn(model, cfg: TrainConfig):
    """Round function with the same (state, batches, cid) contract as
    trainer.make_round_fn, executed as a host-orchestrated python loop."""
    H = W = cfg.img_size

    @jax.jit
    def part1(params, batch_stats, k, images, cid):
        _, kd = jax.random.split(k)
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            emb_idx=jnp.broadcast_to(cid, (images.shape[0],)),
            rngs={"dropout": kd},
            mutable=["batch_stats"],
        )
        probs = jax.nn.softmax(out["logits"], axis=-1)
        aux_r = [_resize_bilinear(a, (H, W)) for a in out["aux"]]
        return probs, aux_r[0], aux_r[1], aux_r[2]

    def loss_fn(params, batch_stats, k, batch, cid, tree_val, dp, d1, d2, d3):
        images, labels = batch["image"], batch["label"]
        rng, kd = jax.random.split(k)

        # remat the main forward: its activations (~GBs at 384^2 bs12) are
        # recomputed in the backward pass instead of held in HBM
        @jax.checkpoint
        def fwd(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                emb_idx=jnp.broadcast_to(cid, (images.shape[0],)),
                rngs={"dropout": kd},
                mutable=["batch_stats"],
            )
            return (
                out["logits"],
                tuple(out["aux"]),
                out["heatmaps"][-1],
                mut["batch_stats"],
            )

        logits, aux, hm_own, new_stats = fwd(params)
        out = {"logits": logits, "aux": list(aux), "heatmaps": [hm_own]}
        probs = jax.nn.softmax(logits, axis=-1)

        loss_ce = partial_cross_entropy(logits, labels, cfg.num_classes)
        loss_crf = gated_crf_loss(probs, images, radius=cfg.gatecrf_radius)

        # injected tree term: value = host scalar, gradient = host cotangents
        aux_r = [_resize_bilinear(a, (H, W)) for a in out["aux"]]
        lin = (
            jnp.sum(probs * jax.lax.stop_gradient(dp))
            + jnp.sum(aux_r[0] * jax.lax.stop_gradient(d1))
            + jnp.sum(aux_r[1] * jax.lax.stop_gradient(d2))
            + jnp.sum(aux_r[2] * jax.lax.stop_gradient(d3))
        )
        loss_tree = lin - jax.lax.stop_gradient(lin) + tree_val

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
        vis_idx = min(1, logits.shape[0] - 1)
        metrics["vis_pred"] = jnp.argmax(logits[vis_idx], -1).astype(jnp.int32)
        return loss, (new_stats, metrics)

    def make_part2(mask_predicate):
        @jax.jit
        def part2(params, stats, opt_state, lr, k, batch, cid,
                  tree_val, dp, d1, d2, d3):
            mask = path_mask(params, mask_predicate)
            opt = _masked_opt(_adamw(lr), mask)
            (loss, (new_stats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, k, batch, cid, tree_val, dp, d1, d2, d3)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, metrics

        return part2

    part2_head = make_part2(is_head_path)
    part2_body = make_part2(
        lambda p: (not is_head_path(p)) and (not is_pcs_path(p))
    )
    part2_full = make_part2(lambda p: not is_pcs_path(p))

    def _opt_init(params, predicate):
        mask = path_mask(params, predicate)
        return _masked_opt(_adamw(0.0), mask).init(params)

    def round_fn(state: ClientState, batches: Dict[str, Array], cid):
        from ..losses.tree_energy_host import multi_scale_tree_loss_host

        params, stats = state.params, state.batch_stats
        it = int(state.current_iter)
        rng = state.rng
        cid_arr = jnp.asarray(cid, jnp.int32)
        n_iters = batches["image"].shape[0]
        n_head = cfg.iters - cfg.rep_iters if cfg.fedicra else 0

        if cfg.fedicra:
            opt_state_h = _opt_init(params, is_head_path)
            opt_state_b = _opt_init(
                params, lambda p: (not is_head_path(p)) and (not is_pcs_path(p))
            )
        else:
            opt_state_f = _opt_init(params, lambda p: not is_pcs_path(p))

        labels_np = np.asarray(batches["label"])
        images_np = np.asarray(batches["image"])
        all_metrics = []
        for i in range(n_iters):
            batch = {
                "image": batches["image"][i],
                "label": batches["label"][i],
            }
            rng, k = jax.random.split(rng)
            probs, a1, a2, a3 = part1(params, stats, k, batch["image"], cid_arr)

            img_np = images_np[i]
            low = img_np if img_np.shape[-1] == 3 else np.repeat(img_np, 3, -1)
            rois = (labels_np[i] == cfg.num_classes).astype(np.float32)
            tree_val, dpn, d1n, d2n, d3n = multi_scale_tree_loss_host(
                np.asarray(probs), low, np.asarray(a1), np.asarray(a2),
                np.asarray(a3), rois, cfg.tree_loss_weight,
            )
            lr = poly_lr(cfg.base_lr, it, cfg.max_iterations)
            args = (
                lr, k, batch, cid_arr,
                jnp.float32(tree_val), jnp.asarray(dpn), jnp.asarray(d1n),
                jnp.asarray(d2n), jnp.asarray(d3n),
            )
            if cfg.fedicra:
                if i < n_head:
                    params, stats, opt_state_h, m = part2_head(
                        params, stats, opt_state_h, *args
                    )
                else:
                    params, stats, opt_state_b, m = part2_body(
                        params, stats, opt_state_b, *args
                    )
            else:
                params, stats, opt_state_f, m = part2_full(
                    params, stats, opt_state_f, *args
                )
            m = dict(m)
            m["lr"] = jnp.float32(lr)
            all_metrics.append(m)
            it += 1

        metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *all_metrics)
        new_state = ClientState(
            params=params,
            batch_stats=stats,
            current_iter=jnp.asarray(it, jnp.int32),
            rng=rng,
        )
        return new_state, metrics

    return round_fn


def build_round_fn(model, cfg: TrainConfig):
    """Select the execution strategy for local rounds:

    - 'ours' on an accelerator whose runtime lacks host callbacks (and with
      the native library present): the split-step trainer;
    - otherwise: the monolithic jitted round (whose tree loss itself
      auto-selects pure_callback host offload when available).
    """
    from .trainer import make_round_fn

    if cfg.procedure == "ours" and jax.default_backend() in ("tpu", "axon"):
        try:
            from .. import native

            native_ok = native.available()
        except Exception:
            native_ok = False
        if native_ok and not supports_host_callbacks():
            return make_split_round_fn(model, cfg)
    return jax.jit(make_round_fn(model, cfg))
