"""Image resize ops with PyTorch-compatible sampling semantics.

The DPT head and pos-embed interpolation in Depth Anything use
torch.nn.functional.interpolate with specific align_corners settings, which
jax.image.resize cannot express (it is fixed to half-pixel centers /
align_corners=False-with-antialias-off differences). For checkpoint parity we
implement bilinear and bicubic resize with both conventions, expressed as
dense interpolation-matrix matmuls so large activations ride the MXU instead
of TPU-slow gathers. All ops are jit-friendly (static output sizes) and
batched over leading dims.

Layout: NHWC (TPU-native).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_size - 1) / max(out_size - 1, 1)
        return i * scale
    scale = in_size / out_size
    # Note: no clipping — torch keeps negative source coords and clamps the
    # tap indices instead, which changes boundary weights.
    return (i + 0.5) * scale - 0.5


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Cubic convolution weights for the 4 taps around fractional offset t.

    Matches torch/OpenCV bicubic (Keys kernel, a=-0.75). t in [0,1);
    returns weights (..., 4) for taps at offsets (-1, 0, 1, 2).
    """
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)
    absd = jnp.abs(d)
    w_near = (a + 2.0) * absd ** 3 - (a + 3.0) * absd ** 2 + 1.0
    w_far = a * absd ** 3 - 5.0 * a * absd ** 2 + 8.0 * a * absd - 4.0 * a
    return jnp.where(absd <= 1.0, w_near, jnp.where(absd < 2.0, w_far, 0.0))


def _linear_matrix_from_src(src: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(len(src), in) linear interpolation matrix for given source coords."""
    out_size = src.shape[0]
    base = jnp.floor(src)
    w = src - base
    lo = jnp.clip(base.astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(base.astype(jnp.int32) + 1, 0, in_size - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 1)
    M = jnp.zeros((out_size, in_size), jnp.float32)
    M = M + jnp.where(cols == lo[:, None], (1.0 - w)[:, None], 0.0)
    M = M + jnp.where(cols == hi[:, None], w[:, None], 0.0)
    return M


def _linear_matrix(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """(out, in) dense interpolation matrix for 1-D linear resize."""
    return _linear_matrix_from_src(
        _source_coords(out_size, in_size, align_corners), in_size)


def _cubic_matrix(out_size: int, in_size: int, align_corners: bool) -> jnp.ndarray:
    """(out, in) dense interpolation matrix for 1-D Keys bicubic resize."""
    src = _source_coords(out_size, in_size, align_corners)
    base = jnp.floor(src).astype(jnp.int32)
    t = src - base.astype(jnp.float32)
    weights = _cubic_kernel(t)  # (out, 4)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 1)
    M = jnp.zeros((out_size, in_size), jnp.float32)
    for tap in range(4):
        idx = jnp.clip(base + tap - 1, 0, in_size - 1)
        M = M + jnp.where(cols == idx[:, None], weights[:, tap][:, None], 0.0)
    return M


def _apply_axis_matrix(x: jnp.ndarray, M: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Contract x's `axis` with M (out, in) — interpolation as an MXU matmul.

    TPU gather runs at a fraction of HBM bandwidth while dense matmul rides
    the MXU, so expressing resize as a (sparse-in-structure, dense-in-layout)
    matrix product is the fast path for large activations.
    """
    if x.dtype == jnp.bfloat16:
        # bf16 activations (DPT fusion path) ride the MXU at 2x f32 rate and
        # halve the materialized intermediate; weights at bf16 are within
        # interpolation tolerance for bf16 data.
        M = M.astype(jnp.bfloat16)
    else:
        x = x.astype(jnp.float32)
    # Contract in place: no moveaxis-to-last round trip. XLA was already
    # eliding those transposes (timings unchanged on v5e), but the in-place
    # einsum keeps the HLO free of layout round-trips by construction.
    letters = "abcdefghijk"
    sub = letters[:x.ndim]
    out_sub = sub.replace(sub[axis], "o")
    out = jnp.einsum(f"o{sub[axis]},{sub}->{out_sub}", M, x,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)




def _apply_separable(x, Mh, Mw, h_axis, w_axis):
    """Apply row and column interpolation matrices in the FLOP-cheaper order.

    Separable resize commutes; cost differs: row-then-col contracts the W
    axis at the NEW height, col-then-row at the OLD height (and vice versa).
    For the DPT output-head upsample (296x528 -> 518x924 c128 b16) col-first
    is 14% fewer FLOPs. (Measured effect on v5e is within noise — these
    matmuls are layout-bound, not FLOP-bound — but the cheaper order costs
    nothing and helps shapes with larger axis ratios.)"""
    h1, w1 = x.shape[h_axis], x.shape[w_axis]
    h2, w2 = Mh.shape[0], Mw.shape[0]
    row_first = h2 * h1 * w1 + w2 * w1 * h2
    col_first = w2 * w1 * h1 + h2 * h1 * w2
    if col_first < row_first:
        y = _apply_axis_matrix(x, Mw, w_axis)
        return _apply_axis_matrix(y, Mh, h_axis)
    y = _apply_axis_matrix(x, Mh, h_axis)
    return _apply_axis_matrix(y, Mw, w_axis)


@partial(jax.jit, static_argnames=("height", "width", "align_corners"))
def resize_bilinear(x: jnp.ndarray, height: int, width: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., height, width, C)."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    dt = x.dtype
    Mh = _linear_matrix(height, x.shape[h_axis], align_corners)
    Mw = _linear_matrix(width, x.shape[w_axis], align_corners)
    y = _apply_separable(x, Mh, Mw, h_axis, w_axis)
    # Preserve floating input dtype (bf16 activations stay bf16 mid-network).
    if jnp.issubdtype(dt, jnp.floating):
        y = y.astype(dt)
    return y


@partial(jax.jit, static_argnames=("height", "width", "align_corners",
                                   "row_stride", "col_stride"))
def resize_bilinear_strided(x: jnp.ndarray, height: int, width: int,
                            align_corners: bool = False,
                            row_stride: int = 1,
                            col_stride: int = 1) -> jnp.ndarray:
    """resize_bilinear(x, height, width)[..., ::row_stride, ::col_stride, :]
    without materializing the full-resolution intermediate.

    The stride is folded into the interpolation matrices, so upsampling depth
    to 1080p only at the back-projection sample pixels costs 1/(rs*cs) of the
    full resize (bench hot path: stride-2 point generation)."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    dt = x.dtype
    src_h = _source_coords(height, x.shape[h_axis], align_corners)[::row_stride]
    src_w = _source_coords(width, x.shape[w_axis], align_corners)[::col_stride]
    Mh = _linear_matrix_from_src(src_h, x.shape[h_axis])
    Mw = _linear_matrix_from_src(src_w, x.shape[w_axis])
    y = _apply_separable(x, Mh, Mw, h_axis, w_axis)
    if jnp.issubdtype(dt, jnp.floating):
        y = y.astype(dt)
    return y


@partial(jax.jit, static_argnames=("height", "width", "align_corners"))
def resize_bicubic(x: jnp.ndarray, height: int, width: int,
                   align_corners: bool = False) -> jnp.ndarray:
    """Bicubic (Keys a=-0.75) resize of (..., H, W, C)."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    Mh = _cubic_matrix(height, x.shape[h_axis], align_corners)
    Mw = _cubic_matrix(width, x.shape[w_axis], align_corners)
    y = _apply_separable(x, Mh, Mw, h_axis, w_axis)
    return y


# ImageNet statistics used by every Depth Anything preprocessing pipeline.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def constrain_to_multiple_of(val: float, multiple: int, min_val: int = 0) -> int:
    """Round to the nearest multiple (DA Resize.constrain_to_multiple_of)."""
    out = int(round(val / multiple) * multiple)
    if out < min_val:
        out = int(-(-val // multiple) * multiple)  # ceil
    return max(out, multiple)


def compute_da_resize(h: int, w: int, target: int = 518, multiple: int = 14,
                      lower_bound: bool = True) -> tuple:
    """Depth-Anything 'lower_bound' aspect-preserving resize shape.

    The short side scales to `target`, both sides round to a multiple of 14
    (reference model.infer_image input path; depth_processor.py:303)."""
    scale_h = target / h
    scale_w = target / w
    if lower_bound:
        s = max(scale_h, scale_w)
    else:
        s = min(scale_h, scale_w)
    return (constrain_to_multiple_of(s * h, multiple, min_val=target),
            constrain_to_multiple_of(s * w, multiple, min_val=target))


