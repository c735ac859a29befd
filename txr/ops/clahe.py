"""CLAHE (contrast-limited adaptive histogram equalization) as an XLA op.

The fusion pipeline preprocesses low-contrast/textureless frames with
CLAHE(clipLimit=2.0, tiles 8x8) before SIFT (reference
depth_to_reconstruction.py:133-153 via cv2.createCLAHE — OpenCV C++;
SURVEY §2.8 item 7 requires a TPU equivalent). Formulation:

  1. per-tile 256-bin histogram via one-hot comparison (a (pixels, 256)
     matmul-shaped reduction — MXU/VPU friendly, no scatter),
  2. clip at the absolute limit, redistribute the excess evenly,
  3. per-tile LUT from the CDF,
  4. per-pixel bilinear interpolation between the 4 neighboring tile LUTs
     (border-replicated, matching OpenCV's interpolation scheme).

Matches cv2.createCLAHE output to ~1 gray level (OpenCV iterates the excess
redistribution; the even-redistribution single pass here differs by at most
the residual spread).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("clip_limit", "tiles"))
def clahe(image: jnp.ndarray, clip_limit: float = 2.0, tiles: int = 8
          ) -> jnp.ndarray:
    """Equalize a (H, W) uint8 image; any H, W (edge-replicated up to the
    next tile multiple internally, like OpenCV, then cropped back).

    Returns (H, W) uint8.
    """
    h0, w0 = image.shape
    pad_h = (-h0) % tiles
    pad_w = (-w0) % tiles
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, pad_h), (0, pad_w)), mode="edge")
    h, w = h0 + pad_h, w0 + pad_w
    th, tw = h // tiles, w // tiles
    area = th * tw
    img = image.astype(jnp.int32)

    # --- per-tile histograms (one-hot reduction; no scatter) --------------
    tiled = img[: th * tiles, : tw * tiles].reshape(tiles, th, tiles, tw)
    tiled = tiled.transpose(0, 2, 1, 3).reshape(tiles * tiles, area)
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    hist = jnp.sum((tiled[:, :, None] == bins).astype(jnp.float32), axis=1)

    # --- clip + even redistribution ---------------------------------------
    limit = jnp.maximum(1.0, clip_limit * area / 256.0)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    clipped = clipped + excess / 256.0

    # --- LUTs from CDFs -----------------------------------------------------
    cdf = jnp.cumsum(clipped, axis=-1)
    luts = jnp.clip(jnp.round(cdf * (255.0 / area)), 0, 255)  # (T*T, 256)
    luts = luts.reshape(tiles, tiles, 256)

    # --- bilinear interpolation between neighboring tile LUTs ---------------
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fy = (yy + 0.5) / th - 0.5
    fx = (xx + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    wy = jnp.clip(fy - jnp.floor(fy), 0.0, 1.0)
    wx = jnp.clip(fx - jnp.floor(fx), 0.0, 1.0)
    # Border replication: outside the first/last tile centers, weights snap.
    wy = jnp.where(fy < 0, 0.0, jnp.where(fy > tiles - 1, 1.0, wy))
    wx = jnp.where(fx < 0, 0.0, jnp.where(fx > tiles - 1, 1.0, wx))

    v = img
    v00 = luts[y0, x0, v]
    v01 = luts[y0, x1, v]
    v10 = luts[y1, x0, v]
    v11 = luts[y1, x1, v]
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)[:h0, :w0]
