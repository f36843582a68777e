"""BMCNet model family (NHWC Flax modules) + checkpoint conversion."""

from bmcnet_esr_tpu.models.bmcnet import BMCNet, BMCNetPlain, Backbone, PlainBackbone
from bmcnet_esr_tpu.models.layers import BIE, ChannelLayerNorm, ParallelBlk, ResidualBlock
from bmcnet_esr_tpu.models.quant import calibrate_act_scales
from bmcnet_esr_tpu.models.convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_torch_checkpoint,
    torch_key_manifest,
)

__all__ = [
    "BMCNet",
    "BMCNetPlain",
    "Backbone",
    "PlainBackbone",
    "BIE",
    "ChannelLayerNorm",
    "ParallelBlk",
    "ResidualBlock",
    "calibrate_act_scales",
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "torch_key_manifest",
    "load_torch_checkpoint",
]
