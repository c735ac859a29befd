"""ORB keypoint detection + description as XLA ops (TPU-native).

The reference rides cv2.ORB_create(nfeatures=2000, nlevels=8)
(depth_enhanced_reconstruction.py:197-199; SURVEY §2.8 item 4). TPU
re-derivation with static shapes:

  1. Image pyramid — scale 1.2, built with the MXU matmul resize
     (txr.ops.resize), not gathers.
  2. oFAST — the 16-point Bresenham circle realized as 16 shifted images;
     a corner needs >= 9 contiguous circle pixels all brighter / all darker
     than center +/- t (pure elementwise boolean algebra, no loops over
     pixels).
  3. Harris ranking — Sobel products box-filtered 7x7 (separable convs),
     R = det - 0.04 tr^2; 3x3 NMS; per-level `lax.top_k` then a global top-k
     (fixed capacity, like txr.ops.sift).
  4. Orientation — intensity centroid over the 31x31 disk, gathered per
     selected keypoint from a flat pyramid buffer (only capacity*961 gathers,
     not a dense 31x31 conv over every pixel).
  5. Steered binary descriptor — 256 seeded Gaussian point pairs
     (BRIEF-style; ORB's learned table belongs to OpenCV, and descriptors
     only ever match against descriptors from this same pattern), rotated by
     the keypoint angle, compared on a sigma=2 blurred pyramid, bit-packed
     uint8 big-endian to match txr.ops.matching.unpack_bits.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from txr.ops.resize import resize_bilinear
from txr.ops.sift import _blur, _shift2


class OrbFeatures(NamedTuple):
    uv: jnp.ndarray        # (N, 2) float32 x,y original-image pixels
    size: jnp.ndarray      # (N,) float32 patch diameter at level scale
    angle: jnp.ndarray     # (N,) float32 degrees [0, 360)
    response: jnp.ndarray  # (N,) float32 Harris response
    desc: jnp.ndarray      # (N, 32) uint8 packed 256-bit descriptor
    mask: jnp.ndarray      # (N,) bool


# 16-point Bresenham circle of radius 3, clockwise from 12 o'clock, as (dy, dx).
_CIRCLE = [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
           (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2),
           (-3, -1)]

_PATCH = 31          # orientation / descriptor patch diameter
_HALF = _PATCH // 2  # 15


def _brief_pattern(n_bits: int = 256, seed: int = 7) -> np.ndarray:
    """(n_bits, 4) int32 point pairs (y1, x1, y2, x2), BRIEF G-II sampling:
    coordinates ~ N(0, (patch/5)^2), clipped to the 31x31 patch."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATCH / 5.0, size=(n_bits, 4))
    return np.clip(np.round(pts), -_HALF, _HALF).astype(np.int32)


def _box7(x: jnp.ndarray) -> jnp.ndarray:
    """7x7 box filter, separable, edge-padded."""
    k = jnp.ones((7,), jnp.float32) / 7.0
    y = jnp.pad(x, ((3, 3), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        y[None, :, :, None], k[:, None, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    y = jnp.pad(y, ((0, 0), (3, 3)), mode="edge")
    return jax.lax.conv_general_dilated(
        y[None, :, :, None], k[None, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


def _sobel(x: jnp.ndarray):
    gx = (_shift2(x, 0, 1) - _shift2(x, 0, -1)) * 2.0 \
        + (_shift2(x, -1, 1) - _shift2(x, -1, -1)) \
        + (_shift2(x, 1, 1) - _shift2(x, 1, -1))
    gy = (_shift2(x, 1, 0) - _shift2(x, -1, 0)) * 2.0 \
        + (_shift2(x, 1, -1) - _shift2(x, -1, -1)) \
        + (_shift2(x, 1, 1) - _shift2(x, -1, 1))
    return gx, gy


def _detect_level(img: jnp.ndarray, k_cand: int, fast_thr: float, border: int):
    """FAST-9/16 corners on one pyramid level, Harris-ranked.

    Returns (y int32, x int32, response f32, valid bool), each (k_cand,)."""
    H, W = img.shape
    c = img
    ring = jnp.stack([_shift2(img, dy, dx) for dy, dx in _CIRCLE])  # (16,H,W)
    brighter = ring > c[None] + fast_thr
    darker = ring < c[None] - fast_thr

    def has_arc9(b):
        hit = None
        for k in range(16):
            run = b[k]
            for j in range(1, 9):
                run = run & b[(k + j) % 16]
            hit = run if hit is None else (hit | run)
        return hit

    corner = has_arc9(brighter) | has_arc9(darker)

    gx, gy = _sobel(img)
    sxx = _box7(gx * gx)
    syy = _box7(gy * gy)
    sxy = _box7(gx * gy)
    harris = (sxx * syy - sxy * sxy) - 0.04 * (sxx + syy) ** 2

    score = jnp.where(corner, harris, -jnp.inf)
    # 3x3 NMS on the Harris score restricted to corners.
    nmax = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                nmax = jnp.maximum(nmax, _shift2(score, dy, dx))
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    keep = corner & (score >= nmax) & (harris > 0) \
        & (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    flat = jnp.where(keep, harris, -1.0).reshape(-1)
    k = min(k_cand, flat.shape[0])
    top, idx = jax.lax.top_k(flat, k)
    return idx // W, idx % W, top, top > 0.0


@partial(jax.jit, static_argnames=("capacity", "n_levels", "scale_factor",
                                   "fast_thr"))
def _orb_impl(gray: jnp.ndarray, capacity: int, n_levels: int,
              scale_factor: float, fast_thr: float) -> OrbFeatures:
    H, W = gray.shape
    # Rotated BRIEF taps reach _HALF*sqrt(2) ~ 21.2 px from the keypoint
    # (pattern coords are clipped to +/-15 PER AXIS, then rotated), so the
    # detection border must cover the rotated reach + blur margin or border
    # keypoints get clamp-corrupted descriptor bits [code-review r2].
    # OpenCV's edgeThreshold=31 plays the same role.
    border = int(math.ceil(_HALF * math.sqrt(2.0))) + 4

    # ------------------------------------------------------------- pyramid
    levels = [gray]
    for lv in range(1, n_levels):
        s = scale_factor ** lv
        h, w = max(int(round(H / s)), 2 * border + 8), max(int(round(W / s)), 2 * border + 8)
        levels.append(resize_bilinear(gray[..., None], h, w)[..., 0])

    # ------------------------------------------------- per-level detection
    cands = []
    for lv, img in enumerate(levels):
        y, x, resp, ok = _detect_level(img, capacity, fast_thr, border)
        pad = capacity - y.shape[0]
        if pad > 0:
            y = jnp.pad(y, (0, pad))
            x = jnp.pad(x, (0, pad))
            resp = jnp.pad(resp, (0, pad), constant_values=-1.0)
            ok = jnp.pad(ok, (0, pad))
        cands.append((jnp.full((capacity,), lv, jnp.int32), y, x, resp, ok))
    lvl = jnp.concatenate([c[0] for c in cands])
    cy = jnp.concatenate([c[1] for c in cands])
    cx = jnp.concatenate([c[2] for c in cands])
    resp = jnp.concatenate([c[3] for c in cands])
    ok = jnp.concatenate([c[4] for c in cands])

    top, pick = jax.lax.top_k(jnp.where(ok, resp, -1.0), capacity)
    lvl = jnp.take(lvl, pick)
    cy = jnp.take(cy, pick)
    cx = jnp.take(cx, pick)
    resp = top
    mask = top > 0.0

    # -------------------------------------- flat pyramid buffers (raw+blur)
    raw_parts, blur_parts = [], []
    offs = np.zeros((n_levels,), np.int64)
    hs = np.zeros((n_levels,), np.int32)
    ws = np.zeros((n_levels,), np.int32)
    total = 0
    for lv, img in enumerate(levels):
        h, w = img.shape
        raw_parts.append(img.reshape(-1))
        blur_parts.append(_blur(img, 2.0).reshape(-1))
        offs[lv] = total
        hs[lv] = h
        ws[lv] = w
        total += h * w
    flat_raw = jnp.concatenate(raw_parts)
    flat_blur = jnp.concatenate(blur_parts)
    off_t = jnp.asarray(offs.astype(np.int32))
    h_t = jnp.asarray(hs)
    w_t = jnp.asarray(ws)
    base = jnp.take(off_t, lvl)
    hh = jnp.take(h_t, lvl)
    ww = jnp.take(w_t, lvl)

    def gather_at(flat, dy, dx):
        # (N, P) integer-offset gather with border clamp
        yi = jnp.clip(cy[:, None] + dy[None, :], 0, hh[:, None] - 1)
        xi = jnp.clip(cx[:, None] + dx[None, :], 0, ww[:, None] - 1)
        return jnp.take(flat, base[:, None] + yi * ww[:, None] + xi,
                        mode="clip")

    # ------------------------------------ orientation: intensity centroid
    rng_off = np.arange(-_HALF, _HALF + 1)
    py, px = np.meshgrid(rng_off, rng_off, indexing="ij")
    disk = (py * py + px * px) <= _HALF * _HALF
    py = py[disk].astype(np.int32)
    px = px[disk].astype(np.int32)
    patch = gather_at(flat_raw, jnp.asarray(py), jnp.asarray(px))  # (N, P)
    m10 = jnp.sum(patch * jnp.asarray(px, jnp.float32)[None, :], axis=1)
    m01 = jnp.sum(patch * jnp.asarray(py, jnp.float32)[None, :], axis=1)
    theta = jnp.arctan2(m01, m10)

    # ----------------------------------------------- steered 256-bit BRIEF
    pat = _brief_pattern()  # (256, 4) y1 x1 y2 x2
    p1 = jnp.asarray(pat[:, :2], jnp.float32)  # (256, 2) (y, x)
    p2 = jnp.asarray(pat[:, 2:], jnp.float32)
    ct = jnp.cos(theta)[:, None]
    st = jnp.sin(theta)[:, None]

    def rot(p):
        ry = jnp.round(p[None, :, 0] * ct + p[None, :, 1] * st)
        rx = jnp.round(-p[None, :, 0] * st + p[None, :, 1] * ct)
        return ry.astype(jnp.int32), rx.astype(jnp.int32)

    r1y, r1x = rot(p1)
    r2y, r2x = rot(p2)

    def gather_rot(ry, rx):
        yi = jnp.clip(cy[:, None] + ry, 0, hh[:, None] - 1)
        xi = jnp.clip(cx[:, None] + rx, 0, ww[:, None] - 1)
        return jnp.take(flat_blur, base[:, None] + yi * ww[:, None] + xi,
                        mode="clip")

    bits = (gather_rot(r1y, r1x) < gather_rot(r2y, r2x)).astype(jnp.uint8)
    desc = jnp.packbits(bits, axis=-1)  # (N, 32) big-endian = unpack_bits

    # ------------------------------------------------------------- outputs
    scale_mult = scale_factor ** lvl.astype(jnp.float32)
    uv = jnp.stack([cx.astype(jnp.float32) * scale_mult,
                    cy.astype(jnp.float32) * scale_mult], axis=-1)
    size = jnp.full_like(scale_mult, float(_PATCH)) * scale_mult
    # cv2 ORB convention: angle = atan2(m01, m10) in degrees, y-down, no flip.
    angle_deg = jnp.mod(jnp.degrees(theta), 360.0)
    return OrbFeatures(uv, size, angle_deg, resp, desc, mask)


def orb_features(gray, capacity: int = 2048, n_levels: int = 8,
                 scale_factor: float = 1.2,
                 fast_threshold: int = 20) -> OrbFeatures:
    """Detect + describe ORB features of a (H, W) image on device.

    `gray` may be uint8 or float [0,1]. fast_threshold is in 0..255 units
    (cv2.ORB default 20). Returns fixed-capacity masked arrays; descriptors
    are (N, 32) packed uint8 compatible with txr.ops.matching Hamming.
    """
    gray = jnp.asarray(gray)
    if gray.dtype == jnp.uint8 or gray.dtype == np.uint8:
        gray = gray.astype(jnp.float32) / 255.0
    else:
        gray = gray.astype(jnp.float32)
    n_levels = max(1, min(n_levels, int(
        math.log(max(min(gray.shape)
                     / (2.0 * (math.ceil(_HALF * math.sqrt(2.0)) + 4) + 8),
                     1.001))
        / math.log(scale_factor)) + 1))
    return _orb_impl(gray, capacity, n_levels, float(scale_factor),
                     float(fast_threshold) / 255.0)
