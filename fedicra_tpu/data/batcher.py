"""Epoch-cached batch sampling with on-device augmentation.

Reproduces the reference's sampling discipline (…_Ours.py:71-79 + torch
DataLoader(shuffle=True)): an epoch's batches are materialized once — each
sample augmented once per epoch — and replayed by ``global_iter % n_batches``
until the next epoch boundary regenerates them.

Deviation from the reference (documented): the torch DataLoader keeps a
smaller final partial batch (drop_last=False); static-shape compilation wants
fixed batch sizes, so the tail batch is padded by wrapping to the start of
the epoch's permutation. With N % batch_size == 0 the two match exactly.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .augment import augment_batch, image_cval_for
from .h5io import ClientSplit


class EpochBatcher:
    def __init__(
        self,
        split: ClientSplit,
        batch_size: int,
        num_classes: int,
        img_class: str,
        seed: int = 2022,
        augment: bool = True,
        source: Optional["EpochBatcher"] = None,
    ):
        self.split = split
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.img_class = img_class
        self.augment = augment
        self.base_key = jax.random.PRNGKey(seed)
        self.n = len(split)
        self.num_batches = math.ceil(self.n / batch_size)
        self._epoch_cache: Optional[int] = None
        self._epoch_images = None
        self._epoch_labels = None
        if source is not None:
            # share the device-resident dataset of another batcher over the
            # same split (e.g. the ALA stream): HBM holds ONE copy
            self._images_dev = source._images_dev
            self._labels_dev = source._labels_dev
        else:
            self._images_dev = jnp.asarray(split.images)
            self._labels_dev = jnp.asarray(split.labels)

    def drop_epoch_cache(self) -> None:
        """Free the device-resident epoch arrays. Safe anytime:
        _materialize_epoch(epoch) is a pure function of (base_key, epoch), so
        a later rebuild reproduces the identical epoch — replay semantics
        (reference quirk #9) are unaffected, only HBM residency shrinks."""
        self._epoch_cache = None
        self._epoch_images = None
        self._epoch_labels = None

    def _materialize_epoch(self, epoch: int):
        key = jax.random.fold_in(self.base_key, epoch)
        kperm, kaug = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(kperm, self.n))
        pad = self.num_batches * self.batch_size - self.n
        if pad:
            perm = np.concatenate([perm, perm[:pad]])
        images = self._images_dev[perm]
        labels = self._labels_dev[perm]
        if self.augment:
            images, labels = augment_batch(
                kaug,
                images,
                labels,
                num_classes=self.num_classes,
                image_cval=image_cval_for(self.img_class),
            )
        nb, bs = self.num_batches, self.batch_size
        self._epoch_images = images.reshape(nb, bs, *images.shape[1:])
        self._epoch_labels = labels.reshape(nb, bs, *labels.shape[1:])
        self._epoch_cache = epoch

    def batch_at(self, global_iter: int) -> Dict[str, jax.Array]:
        """Batch for a global iteration index (reference replay semantics)."""
        epoch = global_iter // self.num_batches
        idx = global_iter % self.num_batches
        if self._epoch_cache != epoch:
            self._materialize_epoch(epoch)
        return {
            "image": self._epoch_images[idx],
            "label": self._epoch_labels[idx],
        }

    def batches_for_round(self, start_iter: int, iters: int) -> Dict[str, jax.Array]:
        """Stacked batches [iters, B, ...] for one local round."""
        bs = [self.batch_at(start_iter + i) for i in range(iters)]
        return {
            "image": jnp.stack([b["image"] for b in bs]),
            "label": jnp.stack([b["label"] for b in bs]),
        }

    def epoch_arrays(self, epoch: int):
        """All batches of one epoch: ([nb,B,H,W,C], [nb,B,H,W])."""
        if self._epoch_cache != epoch:
            self._materialize_epoch(epoch)
        return self._epoch_images, self._epoch_labels
