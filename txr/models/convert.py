"""Checkpoint conversion: PyTorch Depth Anything weights → Flax params.

Supports both naming schemes the reference can load
(depth_processor.py:209-285):
- Hugging Face `DepthAnythingForDepthEstimation` state dicts
  (backbone.embeddings..., neck.reassemble_stage..., head.conv1...),
- original Depth-Anything repo .pth state dicts
  (pretrained.blocks..., depth_head.scratch...).

Accepts .pth/.pt/.bin (torch.load) and .safetensors files. Conversion is pure
numpy once tensors are materialized — no torch on the device path.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def _dense(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) → flax Conv kernel (kh, kw, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) → flax ConvTranspose (kh, kw, I, O).

    flax nn.ConvTranspose (transpose_kernel=False) applies the kernel
    spatially FLIPPED relative to torch's gradient-of-conv convention, so the
    spatial dims must be reversed — verified empirically against
    torch.nn.ConvTranspose2d (exact match with the flip, 0.7 max error
    without)."""
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _normalize_names(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rewrite original-DA-repo names to the HF scheme so one mapping serves
    both. Original names: pretrained.* (DINOv2) + depth_head.* (DPT)."""
    if not any(k.startswith("pretrained.") for k in sd):
        return sd
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        nk = None
        if k == "pretrained.cls_token":
            nk = "backbone.embeddings.cls_token"
        elif k == "pretrained.pos_embed":
            nk = "backbone.embeddings.position_embeddings"
        elif k.startswith("pretrained.patch_embed.proj."):
            nk = k.replace("pretrained.patch_embed.proj.",
                           "backbone.embeddings.patch_embeddings.projection.")
        elif k.startswith("pretrained.norm."):
            nk = k.replace("pretrained.norm.", "backbone.layernorm.")
        elif k.startswith("pretrained.blocks."):
            rest = k[len("pretrained.blocks."):]
            i, sub = rest.split(".", 1)
            base = f"backbone.encoder.layer.{i}."
            sub = (sub
                   .replace("attn.qkv.", "attention.attention.qkv.")
                   .replace("attn.proj.", "attention.output.dense.")
                   .replace("ls1.gamma", "layer_scale1.lambda1")
                   .replace("ls2.gamma", "layer_scale2.lambda1"))
            nk = base + sub
        elif k.startswith("depth_head.projects."):
            i, rest = k[len("depth_head.projects."):].split(".", 1)
            nk = f"neck.reassemble_stage.layers.{i}.projection.{rest}"
        elif k.startswith("depth_head.resize_layers."):
            i, rest = k[len("depth_head.resize_layers."):].split(".", 1)
            nk = f"neck.reassemble_stage.layers.{i}.resize.{rest}"
        elif k.startswith("depth_head.scratch.layer"):
            # depth_head.scratch.layer{n}_rn.weight, n 1-based
            n = int(k.split("layer")[1].split("_")[0])
            nk = f"neck.convs.{n - 1}.weight"
        elif k.startswith("depth_head.scratch.refinenet"):
            # refinenet{n} n in 1..4; HF fusion layers are reversed:
            # refinenet4 ↔ fusion layer 0, refinenet1 ↔ layer 3.
            n = int(k.split("refinenet")[1].split(".")[0])
            sub = k.split(f"refinenet{n}.")[1]
            sub = (sub
                   .replace("resConfUnit1.", "residual_layer1.")
                   .replace("resConfUnit2.", "residual_layer2.")
                   .replace("conv1.", "convolution1.")
                   .replace("conv2.", "convolution2.")
                   .replace("out_conv.", "projection."))
            nk = f"neck.fusion_stage.layers.{4 - n}.{sub}"
        elif k.startswith("depth_head.scratch.output_conv1."):
            nk = k.replace("depth_head.scratch.output_conv1.", "head.conv1.")
        elif k.startswith("depth_head.scratch.output_conv2.0."):
            nk = k.replace("depth_head.scratch.output_conv2.0.", "head.conv2.")
        elif k.startswith("depth_head.scratch.output_conv2.2."):
            nk = k.replace("depth_head.scratch.output_conv2.2.", "head.conv3.")
        if nk is not None:
            out[nk] = v
    return out


def convert_state_dict(sd: Dict[str, np.ndarray], num_layers: int) -> Dict[str, Any]:
    """HF-named torch state dict → nested Flax params for DepthAnythingFlax."""
    sd = _normalize_names(sd)
    p: Dict[str, Any] = {"encoder": {}, "head": {}}
    enc = p["encoder"]
    head = p["head"]

    enc["cls_token"] = sd["backbone.embeddings.cls_token"].reshape(1, 1, -1)
    enc["pos_embed"] = sd["backbone.embeddings.position_embeddings"]
    enc["patch_embed"] = {
        "kernel": _conv(sd["backbone.embeddings.patch_embeddings.projection.weight"]),
        "bias": sd["backbone.embeddings.patch_embeddings.projection.bias"],
    }
    enc["norm"] = {
        "scale": sd["backbone.layernorm.weight"],
        "bias": sd["backbone.layernorm.bias"],
    }

    for i in range(num_layers):
        b = f"backbone.encoder.layer.{i}."
        blk: Dict[str, Any] = {}
        blk["norm1"] = {"scale": sd[b + "norm1.weight"], "bias": sd[b + "norm1.bias"]}
        blk["norm2"] = {"scale": sd[b + "norm2.weight"], "bias": sd[b + "norm2.bias"]}
        if b + "attention.attention.qkv.weight" in sd:  # original fused qkv
            qkv_w = _dense(sd[b + "attention.attention.qkv.weight"])
            qkv_b = sd[b + "attention.attention.qkv.bias"]
        else:  # HF separate q/k/v
            qkv_w = np.concatenate(
                [_dense(sd[b + f"attention.attention.{n}.weight"]) for n in
                 ("query", "key", "value")], axis=1)
            qkv_b = np.concatenate(
                [sd[b + f"attention.attention.{n}.bias"] for n in
                 ("query", "key", "value")])
        blk["attn"] = {
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {"kernel": _dense(sd[b + "attention.output.dense.weight"]),
                     "bias": sd[b + "attention.output.dense.bias"]},
        }
        blk["ls1"] = sd[b + "layer_scale1.lambda1"]
        blk["ls2"] = sd[b + "layer_scale2.lambda1"]
        if b + "mlp.fc1.weight" in sd:
            blk["mlp"] = {
                "fc1": {"kernel": _dense(sd[b + "mlp.fc1.weight"]),
                        "bias": sd[b + "mlp.fc1.bias"]},
                "fc2": {"kernel": _dense(sd[b + "mlp.fc2.weight"]),
                        "bias": sd[b + "mlp.fc2.bias"]},
            }
        else:  # SwiGLU (vitg): mlp.w12 / mlp.w3
            blk["mlp"] = {
                "w12": {"kernel": _dense(sd[b + "mlp.w12.weight"]),
                        "bias": sd[b + "mlp.w12.bias"]},
                "w3": {"kernel": _dense(sd[b + "mlp.w3.weight"]),
                       "bias": sd[b + "mlp.w3.bias"]},
            }
        enc[f"block_{i}"] = blk

    # ---- DPT neck + head ----------------------------------------------------
    for i in range(4):
        r = f"neck.reassemble_stage.layers.{i}."
        head[f"project_{i}"] = {
            "kernel": _conv(sd[r + "projection.weight"]),
            "bias": sd[r + "projection.bias"],
        }
        if i in (0, 1):
            head[f"resize_{i}"] = {
                "kernel": _conv_transpose(sd[r + "resize.weight"]),
                "bias": sd[r + "resize.bias"],
            }
        elif i == 3:
            head["resize_3"] = {
                "kernel": _conv(sd[r + "resize.weight"]),
                "bias": sd[r + "resize.bias"],
            }
        head[f"scratch_{i}"] = {"kernel": _conv(sd[f"neck.convs.{i}.weight"])}

    # HF fusion layer j consumes hidden state (3-j); ours: fusion_{3-j}.
    # The deepest block (HF j=0 -> fusion_3) has no residual input, so its
    # rcu1 never runs; HF checkpoints still SHIP those dead weights
    # (residual_layer1 of fusion_stage.layers.0) — drop them so the
    # converted tree is structurally identical to the model's init tree.
    for j in range(4):
        f = f"neck.fusion_stage.layers.{j}."
        dst = f"fusion_{3 - j}"
        head[dst] = {
            "project": {"kernel": _conv(sd[f + "projection.weight"]),
                        "bias": sd[f + "projection.bias"]},
            "rcu2": {
                "conv1": {"kernel": _conv(sd[f + "residual_layer2.convolution1.weight"]),
                          "bias": sd[f + "residual_layer2.convolution1.bias"]},
                "conv2": {"kernel": _conv(sd[f + "residual_layer2.convolution2.weight"]),
                          "bias": sd[f + "residual_layer2.convolution2.bias"]},
            },
        }
        if dst != "fusion_3":
            head[dst]["rcu1"] = {
                "conv1": {"kernel": _conv(sd[f + "residual_layer1.convolution1.weight"]),
                          "bias": sd[f + "residual_layer1.convolution1.bias"]},
                "conv2": {"kernel": _conv(sd[f + "residual_layer1.convolution2.weight"]),
                          "bias": sd[f + "residual_layer1.convolution2.bias"]},
            }

    for n, dst in ((1, "head_conv1"), (2, "head_conv2"), (3, "head_conv3")):
        head[dst] = {"kernel": _conv(sd[f"head.conv{n}.weight"]),
                     "bias": sd[f"head.conv{n}.bias"]}
    return p


def load_checkpoint(path: str, model) -> Dict[str, Any]:
    """Load a torch checkpoint file and convert it for `model`
    (DepthAnythingFlax). Returns the Flax params pytree."""
    sd = _load_state_dict(path)
    params = convert_state_dict(sd, num_layers=model.vit.num_layers)
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, params)


import jax  # noqa: E402  (used by load_checkpoint's tree_map)
