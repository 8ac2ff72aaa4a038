"""On-device augmentation pipeline (jit/vmap-compiled, jax.random-keyed).

Reproduces the reference RandomGenerator
(/root/reference/code/dataloaders/dataset.py:186-251):
- with p=0.5: random rot90 (k in 0..3) + random flip over H or W;
- with p=0.5: random integer-angle rotation in [-45, 45), nearest-neighbour,
  reshape=False, constant fill: label cval = num_classes (faz 2 / odoc 3 /
  polyp 2), image cval = 0.8 for faz and 0.0 for odoc/polyp.

The whole batch augments in one fused XLA program on device — there is no
host-side worker pool (the reference uses 4 torch DataLoader workers).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _rot90_k(image: Array, label: Array, k: Array) -> Tuple[Array, Array]:
    """Rotate (H,W,C) image and (H,W) label by k*90 deg (requires H == W)."""
    def rot(i):
        return (
            jnp.rot90(image, i, axes=(0, 1)),
            jnp.rot90(label, i, axes=(0, 1)),
        )

    return jax.lax.switch(k, [lambda: rot(0), lambda: rot(1), lambda: rot(2), lambda: rot(3)])


def _flip(image: Array, label: Array, axis: Array) -> Tuple[Array, Array]:
    return jax.lax.cond(
        axis == 0,
        lambda: (jnp.flip(image, 0), jnp.flip(label, 0)),
        lambda: (jnp.flip(image, 1), jnp.flip(label, 1)),
    )


def _rotate_nearest(
    x: Array, angle_deg: Array, cval: float
) -> Array:
    """Nearest-neighbour rotation about the image centre, constant fill.

    x: (H, W) or (H, W, C); scipy.ndimage.rotate(order=0, reshape=False)
    parity: centre = (n-1)/2, output coord -> input coord via the inverse
    rotation, rounded to nearest, out-of-bounds filled with cval.
    """
    h, w = x.shape[0], x.shape[1]
    theta = -angle_deg * (jnp.pi / 180.0)  # inverse mapping
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    out = x[iy, ix]
    if x.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, jnp.asarray(cval, dtype=x.dtype))


def augment_sample(
    key: Array,
    image: Array,
    label: Array,
    *,
    num_classes: int,
    image_cval: float = 0.0,
) -> Tuple[Array, Array]:
    """Augment a single (H,W,C) image + (H,W) label pair."""
    k_do1, k_rot, k_flip, k_do2, k_ang = jax.random.split(key, 5)

    def do_rotflip(img, lab):
        k = jax.random.randint(k_rot, (), 0, 4)
        img, lab = _rot90_k(img, lab, k)
        axis = jax.random.randint(k_flip, (), 0, 2)
        return _flip(img, lab, axis)

    image, label = jax.lax.cond(
        jax.random.uniform(k_do1) > 0.5,
        do_rotflip,
        lambda i, l: (i, l),
        image,
        label,
    )

    def do_rotate(img, lab):
        ang = jax.random.randint(k_ang, (), -45, 45).astype(jnp.float32)
        img2 = _rotate_nearest(img, ang, image_cval)
        lab2 = _rotate_nearest(lab, ang, float(num_classes))
        return img2, lab2

    image, label = jax.lax.cond(
        jax.random.uniform(k_do2) > 0.5,
        do_rotate,
        lambda i, l: (i, l),
        image,
        label,
    )
    return image, label


@partial(jax.jit, static_argnames=("num_classes", "image_cval"))
def augment_batch(
    key: Array,
    images: Array,
    labels: Array,
    *,
    num_classes: int,
    image_cval: float = 0.0,
) -> Tuple[Array, Array]:
    """Vectorized augmentation of [N,H,W,C] images + [N,H,W] labels."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda k, i, l: augment_sample(
            k, i, l, num_classes=num_classes, image_cval=image_cval
        )
    )(keys, images, labels.astype(jnp.int32))


def image_cval_for(img_class: str) -> float:
    """FAZ rotations fill the image with 0.8 (dataset.py:208), others 0."""
    return 0.8 if img_class == "faz" else 0.0
