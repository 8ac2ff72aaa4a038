"""Federated client: the in-process counterpart of the reference BaseClient.

fit  = set_weights (ALA merge for FedICRA) -> local train round -> weights
       (flower_common.py:60-81)
evaluate = set_weights -> per-client validation (+ best-checkpoint tracking)
       (flower_common.py:83-118). Note the reference runs the *full*
       set_weights — including another ALA merge — on every evaluate call,
       and the merged weights persist into the next fit; reproduced here.

num_examples in FitRes is the client's batch count (len(trainloader)), the
reference's FedAvg weighting quirk (flower_common.py:72).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batcher import EpochBatcher
from ..data.h5io import ClientSplit
from ..engine.config import TrainConfig
from ..engine.trainer import ClientState
from ..evaluation.evaluate import evaluate_client
from .ala import ala_set_weights
from .api import EvaluateIns, EvaluateRes, FitIns, FitRes


class FederatedClient:
    def __init__(
        self,
        cid: int,
        cfg: TrainConfig,
        model,
        train_split: ClientSplit,
        val_split: ClientSplit,
        round_fn: Callable,
        ala_epoch_fn: Optional[Callable],
        init_state: ClientState,
        ckpt=None,
    ):
        self.cid = cid
        self.cfg = cfg
        self.model = model
        self.round_fn = round_fn
        self.ala_epoch_fn = ala_epoch_fn
        self.state = init_state
        self.batcher = EpochBatcher(
            train_split,
            cfg.batch_size,
            cfg.num_classes,
            cfg.img_class,
            seed=cfg.seed * 1000 + cid,
        )
        # ALA iterates the dataloader afresh (new shuffle+augmentation per
        # epoch), separate stream from the training batches; shares the
        # device-resident dataset with the train batcher (one HBM copy)
        self._ala_batcher = EpochBatcher(
            train_split,
            cfg.batch_size,
            cfg.num_classes,
            cfg.img_class,
            seed=cfg.seed * 1000 + 500 + cid,
            source=self.batcher,
        )
        self._ala_epoch_counter = 0
        self.val_split = val_split
        self.start_phase = True
        self.best_performance = 0.0
        # client-side own-best checkpointing (flower_common.py:106-114):
        # saved from evaluate() whenever THIS client's val_mean_dice improves
        self.ckpt = ckpt
        self._rng = jax.random.PRNGKey(cfg.seed * 7919 + cid)

    @property
    def num_batches(self) -> int:
        return self.batcher.num_batches

    def _set_weights(self, payload, config):
        """ALA merge under FedICRA; plain adoption otherwise."""
        if self.cfg.fedicra and self.ala_epoch_fn is not None:
            def batch_provider(_epoch):
                self._ala_epoch_counter += 1
                imgs, labs = self._ala_batcher.epoch_arrays(self._ala_epoch_counter)
                return {"image": imgs, "label": labs}

            self._rng, k = jax.random.split(self._rng)
            params, stats, self.start_phase = ala_set_weights(
                self.model,
                self.cfg,
                self.ala_epoch_fn,
                self.state.params,
                payload["params"],
                payload["batch_stats"],
                batch_provider,
                k,
                self.cid,
                int(config.get("iter_global", 0)),
                self.start_phase,
            )
            # free the ALA stream's augmented-epoch device arrays until next
            # round (rebuilt deterministically; keeps peak HBM down — at
            # ALA activation every client would otherwise pin a second
            # epoch-sized buffer for the rest of the run)
            self._ala_batcher.drop_epoch_cache()
        else:
            params, stats = payload["params"], payload["batch_stats"]
        self.state = self.state._replace(params=params, batch_stats=stats)

    def fit(self, ins: FitIns) -> FitRes:
        t0 = time.perf_counter()
        self._set_weights(ins.payload, ins.config)
        start_iter = int(self.state.current_iter)
        batches = self.batcher.batches_for_round(start_iter, self.cfg.iters)
        self.state, metrics = self.round_fn(
            self.state, batches, jnp.asarray(self.cid, jnp.int32)
        )
        scalar_metrics = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim <= 1:
                scalar_metrics[f"client_{self.cid}_{k}"] = float(arr[-1])
            else:  # per-iter arrays (e.g. vis_pred): keep the last iteration
                scalar_metrics[f"client_{self.cid}_{k}"] = arr[-1]
        # visualization parity: ship input/GT of the logged sample alongside
        vis_idx = min(1, self.cfg.batch_size - 1)
        scalar_metrics[f"client_{self.cid}_vis_image"] = np.asarray(
            batches["image"][-1, vis_idx]
        )
        scalar_metrics[f"client_{self.cid}_vis_gt"] = np.asarray(
            batches["label"][-1, vis_idx]
        )
        # keep only one client's epoch cache resident at a time (rebuilt
        # deterministically next round); with 5 clients on one chip the
        # caches would otherwise stack up beside the training step's peak
        del batches
        self.batcher.drop_epoch_cache()
        return FitRes(
            payload={
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            },
            num_examples=self.num_batches,
            metrics=scalar_metrics,
            fit_duration=time.perf_counter() - t0,
        )

    def evaluate(self, ins: EvaluateIns) -> EvaluateRes:
        self._set_weights(ins.payload, ins.config)
        m = evaluate_client(
            self.model,
            self.state.params,
            self.state.batch_stats,
            self.val_split.images,
            self.val_split.labels,
            self.cfg.num_classes,
            emb_idx=self.cid,
        )
        # reference naming: val_{class}_{metric} / val_mean_{metric}
        val_metrics = {}
        for k, v in m.items():
            if k.startswith("mean_"):
                val_metrics[f"val_mean_{k[5:]}"] = v
            else:  # classN_metric
                cls, name = k.split("_", 1)
                val_metrics[f"val_{cls[5:]}_{name}"] = v

        new_best = val_metrics["val_mean_dice"] > self.best_performance
        if new_best:
            self.best_performance = val_metrics["val_mean_dice"]
            if self.ckpt is not None:
                # reference semantics: the client persists ITS OWN state at
                # ITS OWN best val dice, right after set_weights+validate —
                # self.state holds exactly the evaluated (ALA-merged) model
                self.ckpt.save_client_best(
                    self.cid,
                    self.state,
                    int(ins.config.get("iter_global", 0)),
                    self.best_performance,
                )
        prefixed = {f"client_{self.cid}_{k}": v for k, v in val_metrics.items()}
        prefixed[f"client_{self.cid}_new_best"] = float(new_best)
        return EvaluateRes(
            loss=0.0, num_examples=len(self.val_split), metrics=prefixed
        )
