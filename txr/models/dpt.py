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
from functools import partial
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from txr.ops.resize import resize_bilinear


@dataclass(frozen=True)
class DPTConfig:
    features: int = 64                       # fusion hidden size
    out_channels: Tuple[int, ...] = (48, 96, 192, 384)
    head_hidden: int = 32
    metric: bool = False
    max_depth: float = 20.0
    # Fused Pallas kernels for the hot head ops. Two independent knobs
    # because they have opposite measured outcomes on v5e:
    # - fused_head: the fused resize+conv2+relu+conv3 output tail
    #   (txr/ops/dpt_tail.py) — measured 19.97 vs 25.89 ms unfused at B16;
    #   None = auto (on for TPU, off on CPU).
    # - fused_convs: flat-stripe 3x3 convs for the big RCUs + output conv1
    #   (txr/ops/conv_stripe.py) — measured SLOWER than XLA's conv at head
    #   shapes so far (tools/bench_conv_stripe.py); None = off until a
    #   kernel revision beats XLA.
    # Training works either way: the fused forwards carry custom VJPs
    # whose backward is the XLA reference path.
    fused_head: Optional[bool] = None
    fused_convs: Optional[bool] = None


# ---- custom-VJP wrappers: Pallas forward, XLA-reference backward ----------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_fused(x, w, b, relu_in):
    from txr.ops.conv_stripe import conv3x3_stripe

    return conv3x3_stripe(x, w, b, relu_in=relu_in)


def _conv3x3_fwd(x, w, b, relu_in):
    return _conv3x3_fused(x, w, b, relu_in), (x, w, b)


def _conv3x3_bwd(relu_in, res, g):
    from txr.ops.conv_stripe import conv3x3_reference

    x, w, b = res
    _, vjp = jax.vjp(lambda a, k, bb: conv3x3_reference(a, k, bb, relu_in),
                     x, w, b)
    return vjp(g)


_conv3x3_fused.defvjp(_conv3x3_fwd, _conv3x3_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _tail_fused(x, w2, b2, w3, b3, out_h, out_w):
    from txr.ops.dpt_tail import fused_head_tail

    return fused_head_tail(x, w2, b2, w3, b3, out_h, out_w)


def _tail_fwd(x, w2, b2, w3, b3, out_h, out_w):
    return _tail_fused(x, w2, b2, w3, b3, out_h, out_w), (x, w2, b2, w3, b3)


def _tail_bwd(out_h, out_w, res, g):
    from txr.ops.dpt_tail import head_tail_reference

    x, w2, b2, w3, b3 = res
    _, vjp = jax.vjp(
        lambda a, k2, bb2, k3, bb3: head_tail_reference(
            a, k2, bb2, k3, bb3, out_h, out_w), x, w2, b2, w3, b3)
    return vjp(g)


_tail_fused.defvjp(_tail_fwd, _tail_bwd)


class Conv3x3Params(nn.Module):
    """Parameter container with nn.Conv's exact tree ({kernel, bias}) for
    paths that compute the conv with a Pallas kernel instead of nn.Conv."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class Conv1x1Params(nn.Module):
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


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
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fused:
            k1, b1 = Conv3x3Params(self.features, self.features,
                                   name="conv1")()
            k2, b2 = Conv3x3Params(self.features, self.features,
                                   name="conv2")()
            h = _conv3x3_fused(x, k1, b1, True)
            h = _conv3x3_fused(h, k2, b2, True)
            return x + h
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int
    fused: bool = False

    @nn.compact
    def __call__(self, x, residual=None, size=None):
        # The stripe kernel's per-step overheads only amortize on the big
        # maps; small fusion stages stay on XLA's conv.
        fuse = self.fused and x.shape[1] * x.shape[2] >= 96 * 96
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_bilinear(residual, x.shape[1], x.shape[2],
                                           align_corners=False)
            x = x + ResidualConvUnit(self.features, fused=fuse,
                                     name="rcu1")(residual)
        x = ResidualConvUnit(self.features, fused=fuse, name="rcu2")(x)
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
        fused = c.fused_head
        if fused is None:
            fused = jax.default_backend() not in ("cpu",)
        fconv = bool(c.fused_convs)   # None/unset -> off (see DPTConfig)
        f4, f3, f2, f1 = feats[3], feats[2], feats[1], feats[0]
        y = FeatureFusionBlock(c.features, fused=fconv, name="fusion_3")(
            f4, size=f3.shape[1:3])
        y = FeatureFusionBlock(c.features, fused=fconv, name="fusion_2")(
            y, f3, size=f2.shape[1:3])
        y = FeatureFusionBlock(c.features, fused=fconv, name="fusion_1")(
            y, f2, size=f1.shape[1:3])
        y = FeatureFusionBlock(c.features, fused=fconv, name="fusion_0")(y, f1)

        # Output head.
        out_h, out_w = ph * patch_size, pw * patch_size
        if fused:
            if fconv:
                k1, b1 = Conv3x3Params(c.features, c.features // 2,
                                       name="head_conv1")()
                y = _conv3x3_fused(y, k1, b1, False)
            else:
                y = nn.Conv(c.features // 2, (3, 3), padding=1,
                            name="head_conv1")(y)
            k2, b2 = Conv3x3Params(c.features // 2, c.head_hidden,
                                   name="head_conv2")()
            k3, b3 = Conv1x1Params(c.head_hidden, 1, name="head_conv3")()
            y = _tail_fused(y, k2, b2, k3, b3, out_h, out_w)
        else:
            y = nn.Conv(c.features // 2, (3, 3), padding=1,
                        name="head_conv1")(y)
            y = resize_bilinear(y, out_h, out_w, align_corners=True)
            y = nn.Conv(c.head_hidden, (3, 3), padding=1,
                        name="head_conv2")(y)
            y = nn.relu(y)
            y = nn.Conv(1, (1, 1), name="head_conv3")(y)[..., 0]
        if c.metric:
            y = nn.sigmoid(y) * c.max_depth
        else:
            y = nn.relu(y)
        return y
