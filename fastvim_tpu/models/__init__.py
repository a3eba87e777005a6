from fastvim_tpu.models.blocks import Block, rotate_grid
from fastvim_tpu.models.channel import ChannelVisionMamba
from fastvim_tpu.models.detection import (
    CascadeMaskRCNN,
    FCNMaskHead,
    RPNHead,
    Shared2FCBBoxHead,
)
from fastvim_tpu.models.heads import ChannelLayerNorm, SimpleFPN
from fastvim_tpu.models.mae import MaskedAutoencoderVim
from fastvim_tpu.models.mixer import MambaMixer
from fastvim_tpu.models.patch_embed import PatchEmbed, resize_pos_embed
from fastvim_tpu.models.registry import (
    create_model,
    list_models,
    register_model,
)
from fastvim_tpu.models.upernet import FCNHead, UPerHead, UperNetSegmentor
from fastvim_tpu.models.vision_mamba import VisionMamba

__all__ = [
    "Block",
    "CascadeMaskRCNN",
    "ChannelLayerNorm",
    "ChannelVisionMamba",
    "FCNHead",
    "FCNMaskHead",
    "MambaMixer",
    "MaskedAutoencoderVim",
    "PatchEmbed",
    "RPNHead",
    "Shared2FCBBoxHead",
    "SimpleFPN",
    "UPerHead",
    "UperNetSegmentor",
    "VisionMamba",
    "create_model",
    "list_models",
    "register_model",
    "resize_pos_embed",
    "rotate_grid",
]
