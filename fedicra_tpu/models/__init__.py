from .factory import LC_MODELS, MODEL_TYPES, net_factory
from .params_filters import is_head_path, is_ala_gated_path, is_pcs_path
from .pnet import PNet2D
from .unet import (
    UNet,
    UNetCCT,
    UNetCCT3H,
    UNetDS,
    UNetHead,
    UNetLC,
    UNetLCMultiHead,
    UNetLCMultiHeadTwo,
    UNetMultiHead,
)

__all__ = [
    "LC_MODELS",
    "MODEL_TYPES",
    "net_factory",
    "is_head_path",
    "is_ala_gated_path",
    "is_pcs_path",
    "PNet2D",
    "UNet",
    "UNetCCT",
    "UNetCCT3H",
    "UNetDS",
    "UNetHead",
    "UNetLC",
    "UNetLCMultiHead",
    "UNetLCMultiHeadTwo",
    "UNetMultiHead",
]
