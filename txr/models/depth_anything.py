"""Depth Anything V1/V2/V3 in Flax: registry, model, and inference API.

Behavioral parity with the reference's DepthAnythingModel
(depth_processor.py:138-336):
- the same version/encoder registry MODEL_CONFIGS (v1 {vits,vitb,vitl},
  v2 {+vitg}, v3 {large}) with features/out_channels per entry,
- relative heads (ReLU disparity) and metric heads (sigmoid * max_depth,
  hypersim/vkitti operating points),
- infer() with the DA lower-bound multiple-of-14 resize, bilinear
  (align_corners=True) upsample back to source resolution, and the V3
  focal-length scaling depth *= ((fx+fy)/2)/300.0 (reference :306-309).

TPU-first: the whole forward (preprocess → ViT w/ Pallas flash attention →
DPT head → upsample) is one jitted program per input shape; frames batch
along the leading axis; params can be held in bfloat16.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from txr.core.intrinsics import CameraIntrinsics
from txr.models.vit import ViTConfig, ViTEncoder, VIT_PRESETS
from txr.models.dpt import DPTConfig, DPTHead
from txr.ops.resize import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    compute_da_resize,
    resize_bicubic,
    resize_bilinear,
)

logger = logging.getLogger(__name__)

# Mirror of the reference registry (depth_processor.py:141-156).
MODEL_CONFIGS: Dict[str, Dict[str, Dict[str, Any]]] = {
    "v1": {
        "vits": {"encoder": "vits", "features": 64, "out_channels": [48, 96, 192, 384]},
        "vitb": {"encoder": "vitb", "features": 128, "out_channels": [96, 192, 384, 768]},
        "vitl": {"encoder": "vitl", "features": 256, "out_channels": [256, 512, 1024, 1024]},
    },
    "v2": {
        "vits": {"encoder": "vits", "features": 64, "out_channels": [48, 96, 192, 384]},
        "vitb": {"encoder": "vitb", "features": 128, "out_channels": [96, 192, 384, 768]},
        "vitl": {"encoder": "vitl", "features": 256, "out_channels": [256, 512, 1024, 1024]},
        "vitg": {"encoder": "vitg", "features": 384, "out_channels": [1536, 1536, 1536, 1536]},
    },
    "v3": {
        "large": {"encoder": "vitl", "features": 256, "out_channels": [256, 512, 1024, 1024]},
    },
}

# HF hub names per (version, encoder), relative heads
# (reference depth_processor.py:257-285).
HF_MODEL_MAP = {
    ("v1", "vits"): "LiheYoung/depth-anything-small-hf",
    ("v1", "vitb"): "LiheYoung/depth-anything-base-hf",
    ("v1", "vitl"): "LiheYoung/depth-anything-large-hf",
    ("v2", "vits"): "depth-anything/Depth-Anything-V2-Small-hf",
    ("v2", "vitb"): "depth-anything/Depth-Anything-V2-Base-hf",
    ("v2", "vitl"): "depth-anything/Depth-Anything-V2-Large-hf",
}


def hf_model_name(version: str, encoder: str, metric: bool = False,
                  dataset: str = "hypersim") -> Optional[str]:
    """HF checkpoint name, incl. metric Hypersim/VKITTI variants
    (reference :270-275)."""
    if metric and version == "v2":
        ds = "Hypersim" if dataset == "hypersim" else "VKITTI"
        size = {"vits": "Small", "vitb": "Base", "vitl": "Large"}.get(encoder)
        if size is None:
            return None
        return f"depth-anything/Depth-Anything-V2-Metric-{ds}-{size}-hf"
    return HF_MODEL_MAP.get((version, encoder))


class DepthAnythingFlax(nn.Module):
    """ViT encoder + DPT head operating on preprocessed (B, H, W, 3) input."""

    vit: ViTConfig
    dpt: DPTConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        ph = pixels.shape[1] // self.vit.patch_size
        pw = pixels.shape[2] // self.vit.patch_size
        hidden = ViTEncoder(self.vit, name="encoder")(pixels)
        return DPTHead(self.dpt, name="head")(hidden, ph, pw, self.vit.patch_size)


def build_model(version: str = "v2", encoder: str = "vitl", metric: bool = False,
                max_depth: float = 20.0, use_flash: Optional[bool] = None,
                quant: str = "none",
                ) -> Tuple[DepthAnythingFlax, ViTConfig, DPTConfig]:
    """Construct the Flax model for a registry entry."""
    version = version.lower()
    # v3's registry keys its large model "large" (the reference alias);
    # accept both spellings for it.
    if version == "v3" and encoder == "vitl":
        encoder = "large"
    cfg = MODEL_CONFIGS.get(version, {}).get(encoder)
    if cfg is None:
        raise ValueError(f"Invalid version/encoder combination: {version}/{encoder}")
    from dataclasses import replace
    vit = VIT_PRESETS[cfg["encoder"]]
    if use_flash is not None:
        vit = replace(vit, use_flash=use_flash)
    if quant != "none":
        vit = replace(vit, quant=quant)
    # Perf-experiment env overrides for the fused head kernels (see
    # DPTConfig): "1"/"0" force on/off, unset = the config defaults.
    import os as _os
    _knob = {"1": True, "0": False}
    dpt = DPTConfig(
        features=cfg["features"],
        out_channels=tuple(cfg["out_channels"]),
        metric=metric,
        max_depth=max_depth,
        fused_head=_knob.get(_os.environ.get("TXR_FUSED_HEAD", "")),
        fused_convs=_knob.get(_os.environ.get("TXR_FUSED_CONVS", "")),
    )
    return DepthAnythingFlax(vit=vit, dpt=dpt), vit, dpt


class DepthAnythingModel:
    """Inference wrapper with the reference's API shape.

    infer(bgr_image, intrinsics) -> (H, W) float32 depth — relative disparity
    or metric meters — with per-input-shape jit caching.
    """

    def __init__(
        self,
        version: str = "v2",
        encoder: str = "vitl",
        checkpoint_path: Optional[str] = None,
        metric: bool = False,
        max_depth: float = 20.0,
        dataset: str = "hypersim",
        input_size: int = 518,
        focal_length_ref: float = 300.0,
        param_dtype: Any = jnp.bfloat16,
        use_flash: Optional[bool] = None,
        quant: str = "none",
        seed: int = 0,
    ):
        self.version = version.lower()
        self.encoder = encoder
        self.metric = metric
        self.max_depth = max_depth
        self.dataset = dataset
        self.input_size = input_size
        self.focal_length_ref = focal_length_ref

        self.model, self.vit_cfg, self.dpt_cfg = build_model(
            version, encoder, metric, max_depth, use_flash, quant=quant)

        if checkpoint_path:
            if os.path.isdir(checkpoint_path):  # native orbax checkpoint
                from txr.models.checkpoint import load_params
                self.params = load_params(checkpoint_path)
            else:  # torch .pth/.safetensors, converted once then orbax-cached
                from txr.models.checkpoint import load_params_cached
                self.params = load_params_cached(checkpoint_path, self.model)
            logger.info("Loaded checkpoint from %s", checkpoint_path)
        else:
            logger.warning(
                "No checkpoint provided or found, using uninitialized model")
            dummy = jnp.zeros((1, 14 * 4, 14 * 4, 3), jnp.float32)
            self.params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = jax.tree_util.tree_map(
            lambda x: x.astype(param_dtype) if x.dtype == jnp.float32 else x,
            self.params)
        self._jitted = {}

    # -- compiled forward per (in_h, in_w, out_h, out_w) --------------------

    def _batched_forward_fn(self, in_h, in_w, out_h, out_w):
        """ONE preprocess/forward/postprocess jit body for both the
        single-frame and batched paths (leading batch axis; infer() adds
        [None]/[0]) — a change to preprocessing must land in exactly one
        place."""
        key = (in_h, in_w, out_h, out_w)
        if key not in self._jitted:
            model = self.model

            @jax.jit
            def run(params, rgb_u8):
                x = rgb_u8.astype(jnp.float32) / 255.0
                x = resize_bicubic(x, in_h, in_w, align_corners=False)
                mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
                std = jnp.asarray(IMAGENET_STD, jnp.float32)
                x = (x - mean) / std
                depth = model.apply({"params": params}, x)  # (B, in_h, in_w)
                return resize_bilinear(depth[..., None], out_h, out_w,
                                       align_corners=True)[..., 0]

            self._jitted[key] = run
        return self._jitted[key]

    def infer(self, image: np.ndarray,
              intrinsics: Optional[CameraIntrinsics] = None) -> np.ndarray:
        """BGR uint8 (H, W, 3) → depth (H, W) float32 at source resolution."""
        h, w = image.shape[:2]
        in_h, in_w = compute_da_resize(h, w, self.input_size)
        rgb = jnp.asarray(np.ascontiguousarray(image[..., ::-1]))
        depth = self._batched_forward_fn(in_h, in_w, h, w)(
            self.params, rgb[None])[0]
        depth = np.asarray(depth, dtype=np.float32)

        # V3 focal-length scaling (reference depth_processor.py:306-309).
        if self.version == "v3" and intrinsics is not None:
            focal_pixels = (intrinsics.fx + intrinsics.fy) / 2.0
            depth = depth * (focal_pixels / self.focal_length_ref)
        return depth

    def infer_batch(self, images: np.ndarray,
                    intrinsics: Optional[CameraIntrinsics] = None) -> np.ndarray:
        """Batched inference: (B, H, W, 3) BGR uint8 → (B, H, W) depth.

        The real TPU win over the reference's per-frame loop
        (depth_enhanced_reconstruction.py:169-171)."""
        b, h, w = images.shape[:3]
        in_h, in_w = compute_da_resize(h, w, self.input_size)
        rgb = jnp.asarray(np.ascontiguousarray(images[..., ::-1]))
        depth = np.asarray(
            self._batched_forward_fn(in_h, in_w, h, w)(self.params, rgb),
            np.float32)
        if self.version == "v3" and intrinsics is not None:
            depth = depth * ((intrinsics.fx + intrinsics.fy) / 2.0 / self.focal_length_ref)
        return depth


class DepthEstimator:
    """Reference-named facade (depth_enhanced_reconstruction.py:87-171):
    estimate(bgr) / estimate_batch(list) on the DA-V2-Large operating point."""

    def __init__(self, model_name: Optional[str] = None, device: str = "auto",
                 **kwargs):
        # model_name kept for signature parity; the registry entry it mapped
        # to (Depth-Anything-V2-Large) is the default here.
        self.model = DepthAnythingModel(version="v2", encoder="vitl", **kwargs)

    def estimate(self, bgr: np.ndarray) -> np.ndarray:
        return self.model.infer(bgr)

    def estimate_batch(self, images) -> list:
        if len({im.shape for im in images}) == 1:
            return list(self.model.infer_batch(np.stack(images)))
        return [self.model.infer(im) for im in images]
