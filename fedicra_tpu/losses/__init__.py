from .gated_crf import gated_crf_loss
from .partial import partial_cross_entropy, partial_dice_loss
from .tree_energy import multi_scale_tree_energy_loss, tree_energy_loss

__all__ = [
    "gated_crf_loss",
    "partial_cross_entropy",
    "partial_dice_loss",
    "multi_scale_tree_energy_loss",
    "tree_energy_loss",
]
