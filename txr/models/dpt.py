"""DPT head in Flax (Depth Anything neck + depth-estimation head).

Architecture parity with HF DepthAnythingNeck/Head
(transformers/models/depth_anything/modeling_depth_anything.py), which itself
matches the original DPTHead the reference loads
(depth_processor.py:218-240): reassemble (project + resize per stage),
3x3 scratch convs, top-down feature fusion with pre-activation residual units
and align_corners=True bilinear upsampling, then the 3-conv output head with
ReLU (relative) or Sigmoid*max_depth (metric) activation.

Layout NHWC throughout; the fusion convs are the MXU-heavy part and fuse with
their ReLUs under XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from txr.ops.resize import resize_bilinear


@dataclass(frozen=True)
class DPTConfig:
    features: int = 64                       # fusion hidden size
    out_channels: Tuple[int, ...] = (48, 96, 192, 384)
    head_hidden: int = 32
    metric: bool = False
    max_depth: float = 20.0


class PixelShuffleUp(nn.Module):
    """ConvTranspose with stride == kernel as an einsum pixel shuffle.

    Param tree (kernel (k,k,in,out) + bias) is identical to nn.ConvTranspose,
    so checkpoint conversion is unchanged; the forward contracts on the MXU
    as one (B*H*W, C) x (C, k*k*F) matmul instead of XLA's general
    transposed-conv lowering. Equivalence (incl. the spatial kernel flip)
    is pinned by tests/test_models.py::test_pixel_shuffle_matches_convtranspose.
    """

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        k, f = self.kernel, self.features
        cin = x.shape[-1]
        W = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, f))
        b = self.param("bias", nn.initializers.zeros, (f,))
        # One clean (B*I*J, C) x (C, k*k*F) dot, then an explicit 6D
        # transpose+reshape for the shuffle. The direct 6D einsum form
        # compiles ~10x off its FLOP floor on v5e (6.6 ms vs 0.7 at the
        # reassemble-0 shape); the dot+relayout form leaves only the
        # bandwidth-bound shuffle transpose.
        W2 = jnp.transpose(W[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, k * k * f)
        y = jnp.einsum("bijc,cF->bijF", x, W2,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        B, I, J, _ = y.shape
        y = y.reshape(B, I, J, k, k, f).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(B, I * k, J * k, f) + b.astype(x.dtype)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, residual=None, size=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_bilinear(residual, x.shape[1], x.shape[2],
                                           align_corners=False)
            x = x + ResidualConvUnit(self.features, name="rcu1")(residual)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear(x, size[0], size[1], align_corners=True)
        return nn.Conv(self.features, (1, 1), name="project")(x)


class DPTHead(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, hidden_states: List[jnp.ndarray], ph: int, pw: int,
                 patch_size: int = 14) -> jnp.ndarray:
        """hidden_states: 4 x (B, 1+ph*pw, D) from the encoder (cls first).

        Returns depth (B, ph*patch_size, pw*patch_size).
        """
        c = self.cfg
        feats = []
        # Reassemble: drop cls, reshape to maps, project, resize per stage.
        strides = [None] * len(hidden_states)
        for i, hs in enumerate(hidden_states):
            b = hs.shape[0]
            x = hs[:, 1:].reshape(b, ph, pw, hs.shape[-1])
            x = nn.Conv(c.out_channels[i], (1, 1), name=f"project_{i}")(x)
            if i == 0:      # 4x up
                # nn.ConvTranspose: measured 3.1 ms vs 6.6 for the einsum
                # pixel shuffle at this shape (the k=4 shuffle transpose is
                # the cost; k=2 ties). PixelShuffleUp stays available with an
                # identical param tree.
                x = nn.ConvTranspose(c.out_channels[i], (4, 4), strides=(4, 4),
                                     padding="VALID", name="resize_0")(x)
            elif i == 1:    # 2x up
                x = nn.ConvTranspose(c.out_channels[i], (2, 2), strides=(2, 2),
                                     padding="VALID", name="resize_1")(x)
            elif i == 3:    # 2x down
                x = nn.Conv(c.out_channels[i], (3, 3), strides=(2, 2),
                            padding=1, name="resize_3")(x)
            x = nn.Conv(c.features, (3, 3), padding=1, use_bias=False,
                        name=f"scratch_{i}")(x)
            feats.append(x)

        # Top-down fusion (refinenet4 → refinenet1). Each block upsamples to
        # the next stage's spatial size (HF fusion_stage semantics).
        f4, f3, f2, f1 = feats[3], feats[2], feats[1], feats[0]
        y = FeatureFusionBlock(c.features, name="fusion_3")(
            f4, size=f3.shape[1:3])
        y = FeatureFusionBlock(c.features, name="fusion_2")(
            y, f3, size=f2.shape[1:3])
        y = FeatureFusionBlock(c.features, name="fusion_1")(
            y, f2, size=f1.shape[1:3])
        y = FeatureFusionBlock(c.features, name="fusion_0")(y, f1)

        # Output head.
        y = nn.Conv(c.features // 2, (3, 3), padding=1, name="head_conv1")(y)
        y = resize_bilinear(y, ph * patch_size, pw * patch_size,
                            align_corners=True)
        y = nn.Conv(c.head_hidden, (3, 3), padding=1, name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_conv3")(y)
        if c.metric:
            y = nn.sigmoid(y) * c.max_depth
        else:
            y = nn.relu(y)
        return y[..., 0]
