"""Line segment detection as an XLA op (TPU-native LSD equivalent).

The reference rides cv2.createLineSegmentDetector(LSD_REFINE_STD)
(depth_enhanced_reconstruction.py:199-201; SURVEY §2.8 item 5). LSD proper is
a sequential region-grower — unmappable to TPU — so this re-derivation keeps
its core idea (group pixels whose level-line angles agree, fit a rectangle)
with compiler-friendly primitives:

  1. Level-line field — gradients via central differences on a lightly
     blurred image; pixels below LSD's magnitude threshold q/sin(tau) are
     unusable.
  2. Aligned connected components — iterative label propagation: each usable
     pixel takes the min label among 8-neighbors whose level-line angle is
     within tau (22.5 deg); pointer-jumping rounds (label <- label[label])
     double the propagation distance so long segments converge in
     O(log L) gathers instead of O(L) pool steps.
  3. Per-component line fit — one variadic sort by label + segmented
     cumsum/cummax (scatter-free, txr.ops.segment conventions) yields count,
     centroid, second moments, angle coherence, and x/y extrema per
     component.
  4. Validation + fixed capacity — components pass LSD-flavored gates
     (min support, angle coherence, thinness from the minor eigenvalue) and
     the longest `capacity` survive via lax.top_k. Endpoints come from the
     extreme coordinate along the dominant axis with the orthogonal
     coordinate reconstructed from the fitted direction — exact for thin
     segments, no second pass over pixels.

Output matches the cv2 facade: (capacity, 4) [x1, y1, x2, y2] + width + mask.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from txr.ops.sift import _blur, _shift2

_INT_MAX = jnp.iinfo(jnp.int32).max


class LsdLines(NamedTuple):
    lines: jnp.ndarray  # (N, 4) float32 x1 y1 x2 y2
    width: jnp.ndarray  # (N,) float32 fitted line width (px)
    count: jnp.ndarray  # (N,) int32 supporting pixels
    mask: jnp.ndarray   # (N,) bool


def _seg_scan_max(vals: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Segmented cumulative max: reset at positions where starts is True."""

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    _, out = jax.lax.associative_scan(combine, (starts, vals))
    return out


@partial(jax.jit, static_argnames=("capacity", "pool_iters", "jump_rounds"))
def _lsd_impl(gray: jnp.ndarray, capacity: int, tau: float, mag_thr: float,
              min_count: int, max_width: float, pool_iters: int,
              jump_rounds: int) -> LsdLines:
    H, W = gray.shape
    img = _blur(gray, 0.8)  # LSD downscales 0.8x with a Gaussian; we denoise only

    gx = 0.5 * (_shift2(img, 0, 1) - _shift2(img, 0, -1))
    gy = 0.5 * (_shift2(img, 1, 0) - _shift2(img, -1, 0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Level-line angle: direction ALONG the line (perpendicular to gradient).
    ang = jnp.arctan2(gx, -gy)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (yy >= 1) & (yy < H - 1) & (xx >= 1) & (xx < W - 1)
    usable = (mag > mag_thr) & interior

    def aligned(a, b):
        d = jnp.abs(a - b)
        return jnp.minimum(d, 2 * jnp.pi - d) < tau

    # ---------------------------------------------- label propagation
    # Each pixel carries (label, root_ang): the index of some pixel in its
    # component and that pixel's level-line angle. Adoption requires the
    # CANDIDATE ROOT's angle to be within tau of this pixel's angle — purely
    # pairwise gating lets chains drift around rounded corners and merge
    # perpendicular edges into one incoherent blob (then nothing survives the
    # coherence gate). Root-gating bounds a component's angular spread to
    # ~2*tau, which is LSD's region-mean test in propagation-friendly form.
    lab = jnp.where(usable, yy * W + xx, _INT_MAX)
    root_ang = ang
    neigh = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]

    def pool(state):
        lab, root_ang = state
        out_l, out_a = lab, root_ang
        for dy, dx in neigh:
            nl = _shift2(lab, dy, dx)
            nra = _shift2(root_ang, dy, dx)
            nu = _shift2(usable, dy, dx)
            better = (usable & nu & aligned(ang, nra)) & (nl < out_l)
            out_l = jnp.where(better, nl, out_l)
            out_a = jnp.where(better, nra, out_a)
        return out_l, out_a

    def jump(state):
        lab, root_ang = state
        idx = jnp.clip(lab.reshape(-1), 0, H * W - 1)
        jl = jnp.take(lab.reshape(-1), idx, mode="clip").reshape(H, W)
        ja = jnp.take(root_ang.reshape(-1), idx, mode="clip").reshape(H, W)
        better = usable & aligned(ang, ja) & (jl < lab)
        return (jnp.where(better, jl, lab), jnp.where(better, ja, root_ang))

    state = (lab, root_ang)
    for _ in range(jump_rounds):
        state = jax.lax.fori_loop(0, pool_iters, lambda _, s: pool(s), state)
        state = jump(state)
    lab = state[0]

    # ------------------------------------- per-component sorted reduction
    n = H * W
    key = lab.reshape(-1)
    pos = jnp.arange(n, dtype=jnp.int32)
    w = usable.reshape(-1).astype(jnp.float32)
    xf = xx.reshape(-1).astype(jnp.float32) * w
    yf = yy.reshape(-1).astype(jnp.float32) * w
    cols = (
        w,                       # count
        xf, yf,                  # first moments
        xf * xx.reshape(-1), yf * yy.reshape(-1), xf * yy.reshape(-1),
        jnp.cos(2 * ang).reshape(-1) * w, jnp.sin(2 * ang).reshape(-1) * w,
    )
    mm = (
        jnp.where(w > 0, xf, -1.0),  # max x
        jnp.where(w > 0, yf, -1.0),  # max y
        jnp.where(w > 0, -xf, -jnp.float32(n)),  # -min x
        jnp.where(w > 0, -yf, -jnp.float32(n)),  # -min y
    )
    sorted_all = jax.lax.sort((key, pos) + cols + mm, num_keys=1)
    skey = sorted_all[0]
    spos = sorted_all[1]
    scols = jnp.stack(sorted_all[2:2 + len(cols)], axis=1)
    smm = jnp.stack(sorted_all[2 + len(cols):], axis=1)

    starts = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    last = jnp.concatenate([skey[1:] != skey[:-1], jnp.array([True])])
    csum = jnp.cumsum(scols, axis=0, dtype=jnp.float32)
    cmax = _seg_scan_max(smm, starts[:, None] & jnp.ones_like(smm, bool))

    # Compact segment ends to the front (key order), like sorted_voxel_reduce.
    order = jnp.where(last & (skey != _INT_MAX), spos * 0 + jnp.arange(n, dtype=jnp.int32), n)
    _, perm = jax.lax.sort((order, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    # Only the first `n_keep` compacted rows can be real segments; cap the
    # candidate set to bound the top-k cost.
    n_keep = min(n, 65536)
    perm_c = perm[:n_keep]
    is_seg = order[perm_c] < n

    ends = csum[perm_c]
    prev = jnp.concatenate([jnp.zeros((1, ends.shape[1]), ends.dtype), ends[:-1]], 0)
    # Adjacent-difference needs the previous SEGMENT's cumulative sum: rows of
    # perm_c are segment-end positions in ascending order, so prev row works.
    sums = jnp.where(is_seg[:, None], ends - prev, 0.0)
    mx = cmax[perm_c]  # segmented max holds per-segment extrema at end rows

    cnt = sums[:, 0]
    safe = jnp.maximum(cnt, 1.0)
    cx = sums[:, 1] / safe
    cy = sums[:, 2] / safe
    vxx = sums[:, 3] / safe - cx * cx
    vyy = sums[:, 4] / safe - cy * cy
    vxy = sums[:, 5] / safe - cx * cy
    coher = jnp.sqrt(sums[:, 6] ** 2 + sums[:, 7] ** 2) / safe

    # principal axis of the 2x2 covariance (closed form)
    tr = vxx + vyy
    dd = jnp.sqrt(jnp.maximum((vxx - vyy) ** 2 + 4 * vxy * vxy, 0.0))
    l1 = 0.5 * (tr + dd)
    l2 = jnp.maximum(0.5 * (tr - dd), 0.0)
    theta = 0.5 * jnp.arctan2(2 * vxy, vxx - vyy)
    dirx = jnp.cos(theta)
    diry = jnp.sin(theta)
    width = jnp.sqrt(12.0 * l2)  # uniform-across-width model

    xmax, ymax = mx[:, 0], mx[:, 1]
    xmin, ymin = -mx[:, 2], -mx[:, 3]

    # Endpoints: extreme coordinate along the dominant axis; reconstruct the
    # orthogonal coordinate from the fitted direction (exact for thin lines).
    horiz = jnp.abs(dirx) >= jnp.abs(diry)
    slope_yx = diry / jnp.where(jnp.abs(dirx) < 1e-6, 1e-6, dirx)
    slope_xy = dirx / jnp.where(jnp.abs(diry) < 1e-6, 1e-6, diry)
    x1h, x2h = xmin, xmax
    y1h = cy + slope_yx * (xmin - cx)
    y2h = cy + slope_yx * (xmax - cx)
    y1v, y2v = ymin, ymax
    x1v = cx + slope_xy * (ymin - cy)
    x2v = cx + slope_xy * (ymax - cy)
    x1 = jnp.where(horiz, x1h, x1v)
    y1 = jnp.where(horiz, y1h, y1v)
    x2 = jnp.where(horiz, x2h, x2v)
    y2 = jnp.where(horiz, y2h, y2v)
    length = jnp.hypot(x2 - x1, y2 - y1)

    good = (is_seg & (cnt >= min_count) & (coher > 0.5)
            & (width <= max_width) & (length >= min_count * 0.5)
            # density: support per unit rectangle area (LSD's D gate, ~0.7)
            & (cnt >= 0.5 * length * jnp.maximum(width, 1.0)))

    score = jnp.where(good, length, -1.0)
    top, pick = jax.lax.top_k(score, capacity)
    sel = lambda a: jnp.take(a, pick)
    lines = jnp.stack([sel(x1), sel(y1), sel(x2), sel(y2)], axis=-1)
    return LsdLines(lines, sel(width), sel(cnt).astype(jnp.int32), top > 0.0)


def lsd_lines(gray, capacity: int = 512, tau_deg: float = 22.5,
              quant: float = 2.0, min_count: int = 20,
              max_width: float = 6.0, pool_iters: int = 6,
              jump_rounds: int = 6) -> LsdLines:
    """Detect line segments of a (H, W) image on device.

    `gray` may be uint8 or float [0,1]. tau_deg / quant mirror LSD's angle
    tolerance and gradient quantization error bound (magnitude threshold =
    quant / sin(tau)). Propagation reach ~ pool_iters * 2^jump_rounds px.
    Returns fixed-capacity (capacity, 4) [x1 y1 x2 y2] + width + support.
    """
    gray = jnp.asarray(gray)
    if gray.dtype == jnp.uint8 or gray.dtype == np.uint8:
        gray = gray.astype(jnp.float32) / 255.0
    else:
        gray = gray.astype(jnp.float32)
    tau = math.radians(tau_deg)
    mag_thr = (quant / 255.0) / math.sin(tau)
    return _lsd_impl(gray, capacity, tau, mag_thr, int(min_count),
                     float(max_width), pool_iters, jump_rounds)
