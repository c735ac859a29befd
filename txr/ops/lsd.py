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

from txr.ops.scan import segmented_cumsum_cols
from txr.ops.sift import _blur, _shift2

_INT_MAX = jnp.iinfo(jnp.int32).max


class LsdLines(NamedTuple):
    lines: jnp.ndarray  # (N, 4) float32 x1 y1 x2 y2
    width: jnp.ndarray  # (N,) float32 fitted line width (px)
    count: jnp.ndarray  # (N,) int32 supporting pixels
    mask: jnp.ndarray   # (N,) bool


def _seg_scan_max(vals: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Segmented cumulative max over (N, D): reset where starts (N,) is
    True. Log-step Hillis-Steele doubling, NOT jax.lax.associative_scan —
    the latter's recursive slice/concat graph OOMs the TPU compiler in the
    multi-million-row regime (CLAUDE.md dead end; 1080p is 2.1M rows here,
    4K is 8.3M)."""
    n = vals.shape[0]
    out = vals
    flag = starts
    neg = jnp.asarray(-jnp.inf, vals.dtype)
    shift = 1
    while shift < n:
        pv = jnp.concatenate(
            [jnp.full((shift,) + vals.shape[1:], neg, vals.dtype),
             out[:-shift]])
        pf = jnp.concatenate([jnp.ones((shift,), bool), flag[:-shift]])
        out = jnp.where(flag[:, None], out, jnp.maximum(out, pv))
        flag = flag | pf
        shift *= 2
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
    w = usable.reshape(-1).astype(jnp.float32)
    # ROOT-CENTERED coordinates: every pixel of a component shares the same
    # root raster index (its sort key), so dx = x - x_root is bounded by the
    # propagation reach (~hundreds of px). Raw x*x sums at 1080p reach
    # ~1e12, where differencing/cancellation leaves f32 variance estimates
    # pure noise for late-raster segments [code-review r2]; centered moments
    # keep every quantity within exact-f32 range.
    x0 = (key % jnp.int32(W)).astype(jnp.float32)
    y0 = (key // jnp.int32(W)).astype(jnp.float32)
    dx = (xx.reshape(-1).astype(jnp.float32) - x0) * w
    dy = (yy.reshape(-1).astype(jnp.float32) - y0) * w
    dxr = xx.reshape(-1).astype(jnp.float32) - x0
    dyr = yy.reshape(-1).astype(jnp.float32) - y0
    xf = xx.reshape(-1).astype(jnp.float32) * w
    yf = yy.reshape(-1).astype(jnp.float32) * w
    cols = (
        w,                       # count
        dx, dy,                  # centered first moments
        dx * dxr, dy * dyr, dx * dyr,
        jnp.cos(2 * ang).reshape(-1) * w, jnp.sin(2 * ang).reshape(-1) * w,
    )
    mm = (
        jnp.where(w > 0, xf, -1.0),  # max x
        jnp.where(w > 0, yf, -1.0),  # max y
        jnp.where(w > 0, -xf, -jnp.float32(n)),  # -min x
        jnp.where(w > 0, -yf, -jnp.float32(n)),  # -min y
    )
    sorted_all = jax.lax.sort((key,) + cols + mm, num_keys=1)
    skey = sorted_all[0]
    scol_list = sorted_all[1:1 + len(cols)]
    smm = jnp.stack(sorted_all[1 + len(cols):], axis=1)

    starts = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    last = jnp.concatenate([skey[1:] != skey[:-1], jnp.array([True])])
    # Segmented scans (reset per segment), not global cumsum + adjacent
    # differences: the global prefix grows with the whole image and its ulp
    # swamps small segments' sums (txr.ops.segment conventions).
    seg = segmented_cumsum_cols(scol_list, starts)
    csum = jnp.stack(seg, axis=1)
    cmax = _seg_scan_max(smm, starts)

    # Compact segment ends to the front (key order), like
    # sorted_voxel_reduce — but only ends whose component could pass the
    # support gate: an unfiltered cap kept the first 64k components in
    # ROOT-RASTER order and silently dropped real segments rooted low in
    # the image once 1-pixel components exhausted the cap [code-review r2].
    run_count = seg[0]           # per-row running count within the segment
    qualifies = last & (skey != _INT_MAX) & (run_count >= min_count)
    idx32 = jnp.arange(n, dtype=jnp.int32)
    order = jnp.where(qualifies, idx32, n)
    _, perm = jax.lax.sort((order, idx32), num_keys=1)
    n_keep = min(n, 65536)
    perm_c = perm[:n_keep]
    is_seg = order[perm_c] < n

    sums = jnp.where(is_seg[:, None], csum[perm_c], 0.0)
    mx = cmax[perm_c]  # segmented max holds per-segment extrema at end rows
    kx0 = (skey[perm_c] % jnp.int32(W)).astype(jnp.float32)
    ky0 = (skey[perm_c] // jnp.int32(W)).astype(jnp.float32)

    cnt = sums[:, 0]
    safe = jnp.maximum(cnt, 1.0)
    edx = sums[:, 1] / safe
    edy = sums[:, 2] / safe
    cx = kx0 + edx
    cy = ky0 + edy
    vxx = sums[:, 3] / safe - edx * edx
    vyy = sums[:, 4] / safe - edy * edy
    vxy = sums[:, 5] / safe - edx * edy
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
