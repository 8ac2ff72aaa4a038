"""MC-dropout-style ensemble uncertainty (reference evaluate_uncertainty,
flower_common.py:155-188; present in the reference but not called by any
live procedure — provided for API completeness).

For each batch: rotate by a random multiple of 90 degrees, build T=8 noisy
copies (additive N(0, 0.1) clamped to [-0.2, 0.2]), run the model on each,
average the softmax across the ensemble, and report mean predictive entropy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("model", "num_samples"))
def batch_uncertainty(
    model, params, batch_stats, images: Array, key: Array, num_samples: int = 8
) -> Array:
    """Mean predictive entropy of the noisy-rotated ensemble for one batch.

    Jitted with the module static (same rationale as
    evaluate.predict_labels): one dispatch per batch instead of per-op."""
    k_rot, k_noise = jax.random.split(key)
    rot_times = jax.random.randint(k_rot, (), 0, 4)
    rotated = jax.lax.switch(
        rot_times,
        [lambda x: jnp.rot90(x, k, axes=(1, 2)) for k in range(4)],
        images,
    )

    def one_sample(k):
        noise = jnp.clip(
            jax.random.normal(k, rotated.shape) * 0.1, -0.2, 0.2
        )
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            rotated + noise,
            train=False,
        )
        return jax.nn.softmax(out["logits"], axis=-1)

    keys = jax.random.split(k_noise, num_samples)
    preds = jax.lax.map(one_sample, keys)  # [T, B, H, W, C]
    mean_pred = jnp.mean(preds, axis=0)
    entropy = -jnp.sum(mean_pred * jnp.log(mean_pred + 1e-6), axis=-1)
    return jnp.mean(entropy)


def evaluate_uncertainty(
    model, params, batch_stats, batches, key: Array, num_samples: int = 8
) -> float:
    """Mean uncertainty over an iterable of image batches."""
    vals = []
    for i, images in enumerate(batches):
        key, k = jax.random.split(key)
        vals.append(
            float(
                batch_uncertainty(
                    model, params, batch_stats, jnp.asarray(images), k, num_samples
                )
            )
        )
    return float(jnp.mean(jnp.asarray(vals)))
