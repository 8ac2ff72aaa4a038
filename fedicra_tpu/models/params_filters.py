"""Path predicates over the parameter pytree.

These encode the reference's name-based parameter groupings:

- head params: ``decoder.out_conv.{weight,bias}`` — the "local" head trained
  alone during the head phase of FedICRA's alternating local update
  (flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours.py:90-107).
- ALA-gated params: names containing any of ``out_conv, up4, up3, up2, up1``
  — the "higher layers" blended by ALA (flower_common.py:506).
- PCS params: the personalized-channel-selection modules, which the reference
  accidentally leaves out of ``state_dict()``/``parameters()`` (unet.py:172-177)
  so they are frozen and not federated. We reproduce that behaviour explicitly
  with these filters.

A "path" here is the tuple of string keys from flax's
``flax.traverse_util.flatten_dict`` on the params tree, e.g.
``('decoder', 'out_conv', 'conv', 'kernel')``.
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax import traverse_util

Path = Tuple[str, ...]

ALA_GATED_KEYS = ("out_conv", "up4", "up3", "up2", "up1")


def is_pcs_path(path: Path) -> bool:
    return any(p.startswith("pcs") for p in path)


def is_head_path(path: Path) -> bool:
    """decoder.out_conv.* — the FedICRA 'local head'."""
    return "out_conv" in path and path[0] == "decoder"


def is_ala_gated_path(path: Path) -> bool:
    """Reference substring match against torch param names (flower_common.py:506).

    PCS params never appear in the reference's named_parameters, so they are
    excluded here as well.
    """
    if is_pcs_path(path):
        return False
    return any(any(k in p for k in ALA_GATED_KEYS) for p in path)


def path_mask(params, predicate) -> dict:
    """Build a bool pytree (same structure as params) from a path predicate."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: predicate(k) for k in flat}
    return traverse_util.unflatten_dict(mask)


def mask_tree(tree, predicate):
    """Zero out leaves whose path does not satisfy predicate."""
    flat = traverse_util.flatten_dict(tree)
    out = {k: (v if predicate(k) else jax.numpy.zeros_like(v)) for k, v in flat.items()}
    return traverse_util.unflatten_dict(out)
