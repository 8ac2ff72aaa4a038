"""Model factory mirroring the reference net_factory surface.

Reference: /root/reference/code/networks/net_factory.py:6-32. Same model-type
strings; returns a flax module. ``unet_lc_multihead`` is the FedICRA flagship
(asserted by the reference "Ours" procedure).
"""

from __future__ import annotations

from typing import Any

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

MODEL_TYPES = (
    "unet",
    "unet_cct",
    "unet_cct_3h",
    "unet_ds",
    "efficient_unet",
    "pnet",
    "unet_head",
    "unet_multihead",
    "unet_lc",
    "unet_lc_multihead",
    "unet_lc_multihead_two",
)

# Model types whose forward accepts/uses a client embedding index.
LC_MODELS = ("unet_lc", "unet_lc_multihead", "unet_lc_multihead_two")


def net_factory(
    net_type: str = "unet",
    in_chns: int = 1,
    class_num: int = 3,
    *,
    num_clients: int = 5,
    client_id: int = 0,
    pcs_num: int = 1,
    dropout=None,
    dsn_dropout=None,
) -> Any:
    if net_type == "unet":
        if dropout is not None:
            return UNet(
                in_chns=in_chns, num_classes=class_num, dropout=tuple(dropout)
            )
        return UNet(in_chns=in_chns, num_classes=class_num)
    if net_type == "unet_cct":
        return UNetCCT(in_chns=in_chns, num_classes=class_num)
    if net_type == "unet_cct_3h":
        return UNetCCT3H(in_chns=in_chns, num_classes=class_num)
    if net_type == "unet_ds":
        return UNetDS(in_chns=in_chns, num_classes=class_num)
    if net_type == "efficient_unet":
        from .efficientunet import EffiUNet

        return EffiUNet(in_chns=in_chns, num_classes=class_num)
    if net_type == "pnet":
        return PNet2D(in_chns=in_chns, num_classes=class_num)
    if net_type == "unet_head":
        return UNetHead(in_chns=in_chns, num_classes=class_num)
    if net_type == "unet_multihead":
        return UNetMultiHead(in_chns=in_chns, num_classes=class_num)
    if net_type == "unet_lc":
        kw = dict(dropout=tuple(dropout)) if dropout is not None else {}
        return UNetLC(
            in_chns=in_chns,
            num_classes=class_num,
            num_clients=num_clients,
            client_id=client_id,
            pcs_num=pcs_num,
            **kw,
        )
    if net_type == "unet_lc_multihead":
        kw = dict(dropout=tuple(dropout)) if dropout is not None else {}
        if dsn_dropout is not None:
            kw["dsn_dropout"] = float(dsn_dropout)
        return UNetLCMultiHead(
            in_chns=in_chns,
            num_classes=class_num,
            num_clients=num_clients,
            client_id=client_id,
            pcs_num=pcs_num,
            **kw,
        )
    if net_type == "unet_lc_multihead_two":
        kw = dict(dropout=tuple(dropout)) if dropout is not None else {}
        return UNetLCMultiHeadTwo(
            in_chns=in_chns,
            num_classes=class_num,
            num_clients=num_clients,
            client_id=client_id,
            pcs_num=pcs_num,
            **kw,
        )
    raise ValueError(f"unknown net_type {net_type!r}; expected one of {MODEL_TYPES}")
