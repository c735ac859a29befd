from txr.models.vit import ViTConfig, ViTEncoder, VIT_PRESETS
from txr.models.dpt import DPTConfig, DPTHead
from txr.models.depth_anything import (
    MODEL_CONFIGS,
    DepthAnythingFlax,
    DepthAnythingModel,
    build_model,
    hf_model_name,
)
from txr.models.convert import convert_state_dict, load_checkpoint

__all__ = [
    "ViTConfig",
    "ViTEncoder",
    "VIT_PRESETS",
    "DPTConfig",
    "DPTHead",
    "MODEL_CONFIGS",
    "DepthAnythingFlax",
    "DepthAnythingModel",
    "build_model",
    "hf_model_name",
    "convert_state_dict",
    "load_checkpoint",
]
