"""Canny edge detection as an XLA op.

The hybrid detector computes Canny(50, 150) edge maps per frame (reference
depth_enhanced_reconstruction.py:246 via OpenCV C++; SURVEY §2.8 item 6).
TPU formulation:

  1. Sobel gradients as two 3x3 depthwise convs,
  2. non-maximum suppression with the gradient direction quantized to 4
     sectors (comparisons against the two neighbors along the direction),
  3. double threshold (L2-gradient magnitudes),
  4. hysteresis as a fixed-iteration dilation loop: strong edges seed,
     weak pixels accept when 8-connected to an accepted pixel. `iterations`
     bounds propagation length along weak chains (OpenCV floods the whole
     component; 16 rounds resolve all but pathological spirals).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv2(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    # Replicate borders (OpenCV BORDER_REPLICATE) — zero padding manufactures
    # strong fake gradients along the image frame.
    padded = jnp.pad(img, 1, mode="edge")
    return jax.lax.conv_general_dilated(
        padded[None, :, :, None], k[:, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def _shift(x, dy, dx):
    """Shift with zero fill (neighbors beyond the border never win —
    jnp.roll would wrap opposite edges together)."""
    h, w = x.shape
    padded = jnp.pad(x, 1)
    return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))


@partial(jax.jit, static_argnames=("iterations", "l2gradient"))
def canny(image: jnp.ndarray, low: float = 50.0, high: float = 150.0,
          iterations: int = 16, l2gradient: bool = False) -> jnp.ndarray:
    """Edge map of a (H, W) uint8 image → (H, W) uint8 {0, 255}."""
    x = image.astype(jnp.float32)
    sx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sy = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)
    gx = _conv2(x, sx)
    gy = _conv2(x, sy)
    if l2gradient:
        mag = jnp.sqrt(gx * gx + gy * gy)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)  # OpenCV default L1 approximation

    # Quantize direction to 4 sectors: 0°, 45°, 90°, 135°.
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    deg = jnp.where(ang < 0, ang + jnp.pi, ang)  # [0, pi)
    sector = jnp.floor((deg + jnp.pi / 8) / (jnp.pi / 4)).astype(jnp.int32) % 4

    n0a, n0b = _shift(mag, 0, 1), _shift(mag, 0, -1)       # 0°: left/right
    n1a, n1b = _shift(mag, 1, 1), _shift(mag, -1, -1)      # 45°
    n2a, n2b = _shift(mag, 1, 0), _shift(mag, -1, 0)       # 90°
    n3a, n3b = _shift(mag, 1, -1), _shift(mag, -1, 1)      # 135°
    na = jnp.select([sector == 0, sector == 1, sector == 2], [n0a, n1a, n2a], n3a)
    nb = jnp.select([sector == 0, sector == 1, sector == 2], [n0b, n1b, n2b], n3b)
    # Strict on one side (like OpenCV): a 2-px constant-magnitude plateau
    # keeps ONE pixel, not a double-wide edge.
    is_max = (mag > na) & (mag >= nb)

    strong = is_max & (mag >= high)
    weak = is_max & (mag >= low) & (mag < high)

    def dilate8(m):
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out | _shift(m, dy, dx)
        return out

    def body(_, accepted):
        return accepted | (weak & dilate8(accepted))

    accepted = jax.lax.fori_loop(0, iterations, body, strong)
    return (accepted.astype(jnp.uint8)) * 255
