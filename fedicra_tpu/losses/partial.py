"""Partial (sparse-annotation) cross-entropy and Dice losses.

Reference parity:
- partial CE == torch ``CrossEntropyLoss(ignore_index=num_classes)``
  (flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours.py:58): mean over
  non-ignored pixels; label value ``num_classes`` marks "unlabeled".
- pDLoss == /root/reference/code/utils/losses.py:195-232: per-class soft Dice
  with an ignore mask, averaged over classes (including background),
  smooth=1e-5.

Logits are NHWC (B, H, W, C); labels are (B, H, W) int with values in
[0, num_classes] where ``num_classes`` is the ignore label.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def partial_cross_entropy(logits: Array, labels: Array, num_classes: int) -> Array:
    """Mean CE over pixels whose label != num_classes (the ignore index)."""
    valid = labels != num_classes
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def partial_dice_loss(probs: Array, labels: Array, num_classes: int) -> Array:
    """pDLoss: 1 - soft Dice per class under the ignore mask, class-averaged.

    ``probs`` are post-softmax probabilities (the reference applies it to
    softmax outputs when used).
    """
    smooth = 1e-5
    ignore_mask = (labels != num_classes).astype(probs.dtype)
    loss = 0.0
    for i in range(num_classes):
        target = (labels == i).astype(probs.dtype)
        score = probs[..., i]
        intersect = jnp.sum(score * target * ignore_mask)
        y_sum = jnp.sum(target * target * ignore_mask)
        z_sum = jnp.sum(score * score * ignore_mask)
        dice = (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
        loss = loss + (1.0 - dice)
    return loss / num_classes
