"""DINOv2-style ViT encoder in Flax (the Depth Anything backbone).

Architecture parity with the HF Dinov2 backbone used by every Depth Anything
variant (reference depth_processor.py:141-156 MODEL_CONFIGS; HF
transformers/models/dinov2): patch-14 conv embedding, cls token, bicubically
interpolated position embeddings, pre-norm blocks with LayerScale, exact GELU,
and a final LayerNorm applied to each harvested intermediate hidden state.

TPU-first choices: fused qkv projection (one MXU matmul instead of three),
Pallas flash attention on the 1370-token sequence, bfloat16-friendly
(params can be cast; layernorm statistics stay f32).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from txr.ops.attention import multi_head_attention
from txr.ops.resize import resize_bicubic


@dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    patch_size: int = 14
    mlp_ratio: float = 4.0
    layerscale_init: float = 1.0
    pos_embed_size: int = 37          # grid side the stored pos embed was trained at
    use_swiglu: bool = False          # DINOv2-giant uses SwiGLU-fused FFN
    out_layers: Tuple[int, ...] = (2, 5, 8, 11)
    # True: Pallas flash attention; False: XLA einsum; None: auto by backend
    # (Pallas on TPU forward, XLA on CPU and under autodiff).
    use_flash: bool | None = None
    # "none": bf16/f32 dense layers; "int8": W8A8 dynamic quant on the MXU
    # (txr.ops.quant) for every block dense — same param tree either way.
    quant: str = "none"


VIT_PRESETS = {
    # encoder: (hidden, layers, heads, out_layers, swiglu)
    "vits": ViTConfig(384, 12, 6, out_layers=(2, 5, 8, 11)),
    "vitb": ViTConfig(768, 12, 12, out_layers=(2, 5, 8, 11)),
    "vitl": ViTConfig(1024, 24, 16, out_layers=(4, 11, 17, 23)),
    # DINOv2-giant: mlp_ratio 4 with the SwiGLU 2/3-round-to-8 reduction
    # gives the checkpoint hidden size round8(1536*4*2/3) = 4096.
    "vitg": ViTConfig(1536, 40, 24, mlp_ratio=4.0, use_swiglu=True,
                      out_layers=(9, 19, 29, 39)),
}


def _dense(quant: str, role: str = ""):
    """Dense layer class for the quant policy — identical param trees.

    "int8": XLA W8A8 everywhere. "int8p": Pallas fused kernel everywhere.
    "int8mix": per-shape best measured on v5e (tools/bench_int8_matmul.py) —
    the Pallas kernel's in-register rowmax wins only on the wide-K fc2
    reduction; XLA's fused quant pattern wins the K=1024 shapes.
    """
    if quant == "int8" or (quant == "int8mix" and role != "fc2"):
        from txr.ops.quant import Int8Dense

        return Int8Dense
    if quant == "int8p" or (quant == "int8mix" and role == "fc2"):
        from txr.ops.quant import Int8DensePallas

        return Int8DensePallas
    return nn.Dense


class Mlp(nn.Module):
    hidden: int
    out: int
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        x = _dense(self.quant, "fc1")(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = _dense(self.quant, "fc2")(self.out, name="fc2")(x)
        return x


class SwiGLU(nn.Module):
    """SwiGLU-fused FFN (DINOv2 giant)."""

    hidden: int
    out: int
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        x12 = _dense(self.quant)(2 * self.hidden, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        x = nn.silu(x1) * x2
        # w3 contracts the wide hidden dim — the fc2-analog shape where the
        # int8mix policy's Pallas kernel wins (vitg K=4096); role='' sent it
        # to the measured-slower XLA path [code-review r2].
        return _dense(self.quant, "fc2")(self.out, name="w3")(x)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, kv_len=None):
        c = self.cfg
        b, s, d = x.shape
        head_dim = d // c.num_heads
        D = _dense(c.quant)
        qkv = D(3 * d, name="qkv")(x)  # one fused MXU matmul

        use_flash = c.use_flash
        if use_flash is None:
            use_flash = jax.default_backend() not in ("cpu",)
        if use_flash and c.num_heads % 2 == 0:
            # Transpose-free path: the Pallas kernel reads the fused qkv
            # layout directly (no (B,S,H,D)↔(B,H,S,D) relayouts at all).
            from txr.ops.attention import fused_attention

            o = fused_attention(qkv, c.num_heads, head_dim, kv_len)
        else:
            parts = qkv.reshape(b, s, 3, c.num_heads, head_dim)
            q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            o = multi_head_attention(q, k, v, kv_len=kv_len, use_flash=use_flash)
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return D(d, name="proj")(o)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.hidden_size
        ls1 = self.param("ls1", nn.initializers.constant(c.layerscale_init), (d,))
        ls2 = self.param("ls2", nn.initializers.constant(c.layerscale_init), (d,))
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Attention(c, name="attn")(h)
        x = x + h * ls1
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        mlp_hidden = int(d * c.mlp_ratio)
        if c.use_swiglu:
            # DINOv2 rounds SwiGLU hidden to a multiple of 8 after 2/3 scaling.
            sw_hidden = (int(mlp_hidden * 2 / 3) + 7) // 8 * 8
            h = SwiGLU(sw_hidden, d, quant=c.quant, name="mlp")(h)
        else:
            h = Mlp(mlp_hidden, d, quant=c.quant, name="mlp")(h)
        return x + h * ls2


class ViTEncoder(nn.Module):
    """Returns the hidden states (cls token included, final LN applied) at
    cfg.out_layers, matching HF Dinov2Backbone(apply_layernorm=True)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> List[jnp.ndarray]:
        """pixels: (B, H, W, 3) normalized; H, W multiples of patch_size."""
        c = self.cfg
        d = c.hidden_size
        b, h, w, _ = pixels.shape
        ph, pw = h // c.patch_size, w // c.patch_size

        x = nn.Conv(d, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size),
                    padding="VALID", name="patch_embed")(pixels)
        x = x.reshape(b, ph * pw, d)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + c.pos_embed_size ** 2, d))

        # Interpolate patch position embeddings to the actual grid (bicubic,
        # align_corners=False — HF interpolate_pos_encoding parity).
        if (ph, pw) != (c.pos_embed_size, c.pos_embed_size):
            pos_cls = pos[:, :1]
            pos_patch = pos[:, 1:].reshape(1, c.pos_embed_size, c.pos_embed_size, d)
            pos_patch = resize_bicubic(pos_patch, ph, pw, align_corners=False)
            pos_patch = pos_patch.reshape(1, ph * pw, d)
            pos = jnp.concatenate([pos_cls, pos_patch], axis=1)

        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        x = x + pos.astype(x.dtype)

        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        collected = {}
        want = set(c.out_layers)
        for i in range(c.num_layers):
            x = Block(c, name=f"block_{i}")(x)
            if i in want:
                collected[i] = final_norm(x)
        # One output per requested index, duplicates allowed.
        return [collected[i] for i in c.out_layers]
