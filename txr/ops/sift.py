"""SIFT keypoint detection + description as XLA ops (TPU-native).

The reference rides OpenCV's C++ SIFT (depth_to_reconstruction.py:133-153,
depth_enhanced_reconstruction.py:195; SURVEY §2.8 item 3). This module
re-derives the algorithm for TPU with static shapes throughout:

  1. Gaussian scale-space pyramid — separable convs (incremental blurs,
     OpenCV sigma schedule sigma0 * 2^(i/S)).
  2. DoG extrema — 26-neighbor max/min tests as shifted-array comparisons,
     contrast + Hessian edge rejection, all elementwise.
  3. Fixed-capacity selection — `lax.top_k` over the masked response map per
     octave, then a global top-k across octaves (no data-dependent shapes).
  4. Subpixel refinement — batched 3x3 quadratic fits (adjugate inverse) on
     gathered 27-neighborhoods.
  5. Orientation + descriptor — bilinear gather of gradient patches from a
     flat-concatenated pyramid buffer, 36-bin orientation histogram and the
     standard 4x4x8 trilinearly-weighted descriptor as one-hot contractions
     (MXU work, no scatters — TPU scatter costs ~350ms/4M updates).

Conventions differ from OpenCV in two deliberate ways: no initial 2x
upsampling (octave -1), and one dominant orientation per keypoint. Both trade
a few extra keypoints for compile-friendly static shapes; two-view matching
quality is validated in tests/test_sift.py against known homographies.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Orientation/descriptor sample-grid side (J x J samples per keypoint). The
# two per-keypoint bilinear gathers are the dominant device cost and scale
# with J^2. Measured on real tunnel frames (r5): grids 16/12/10 give
# IDENTICAL ratio-test match and RANSAC inlier counts (138/125-ish per
# consecutive pair) and identical warp-test inlier rates — 16 is
# oversampled for matching. Default 12 keeps a safety margin over 10;
# TXR_SIFT_GRID overrides for probing.
import os as _os
_SAMPLE_GRID = int(_os.environ.get("TXR_SIFT_GRID", "12"))


class SiftFeatures(NamedTuple):
    """Fixed-capacity SIFT output (all arrays sized to `capacity`)."""

    uv: jnp.ndarray        # (N, 2) float32 x,y in original image pixels
    size: jnp.ndarray      # (N,) float32 keypoint diameter (OpenCV kp.size)
    angle: jnp.ndarray     # (N,) float32 orientation in degrees [0, 360)
    response: jnp.ndarray  # (N,) float32 |DoG| response
    desc: jnp.ndarray      # (N, 128) float32 descriptor (0..255 scaled)
    mask: jnp.ndarray      # (N,) bool validity


def _gauss_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 borders (cv2.GaussianBlur)."""
    if sigma <= 0:
        return img
    k = jnp.asarray(_gauss_kernel(sigma))
    r = (k.shape[0] - 1) // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[:, None, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    x = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[None, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return x


def _blur_multi(img: jnp.ndarray, sigmas) -> jnp.ndarray:
    """All pyramid levels of one octave in TWO separable conv passes.

    The incremental scheme (level i+1 = blur(level i, inc_i)) is a chain of
    2(L-1) sequential C=1 convolutions — poor TPU utilization and the bulk
    of device SIFT's fixed cost. Gaussians compose exactly
    (G(a)*G(b) = G(sqrt(a^2+b^2))), so every level comes straight from the
    octave base: one vertical conv with L output channels (one kernel per
    level) + one horizontal DEPTHWISE conv. Discrete truncated kernels
    differ from the composed chain at ~1e-3 gray levels — inside the
    detector's contrast threshold and the match-quality test tolerances.

    img: (H, W) octave base. sigmas: per-level blur RELATIVE to the base
    (0 → identity). Returns (L, H, W)."""
    L = len(sigmas)
    rs = [max(1, int(math.ceil(3.0 * s))) if s > 0 else 0 for s in sigmas]
    r = max(rs)
    K = np.zeros((2 * r + 1, L), np.float32)
    for i, s in enumerate(sigmas):
        if s <= 0:
            K[r, i] = 1.0
        else:
            k = _gauss_kernel(s)
            ri = (k.shape[0] - 1) // 2
            K[r - ri:r + ri + 1, i] = k
    Kj = jnp.asarray(K)
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    v = jax.lax.conv_general_dilated(
        x[None, :, :, None], Kj[:, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (1, H, W, L)
    v = jnp.pad(v, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
    h = jax.lax.conv_general_dilated(
        v, Kj[None, :, None, :], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=L)  # depthwise: kernel i on channel i
    return jnp.moveaxis(h[0], -1, 0)


def _shift2(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (..., H, W) stack, edge-padded (borders never become extrema
    anyway — they are masked off)."""
    h, w = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(x, pad, mode="edge")
    start = [0] * (x.ndim - 2) + [1 + dy, 1 + dx]
    return jax.lax.dynamic_slice(padded, start, x.shape)


def _neighborhood_max_min(dog: jnp.ndarray):
    """Per-pixel max/min over the 3x3 window of each DoG level.

    dog: (L, H, W). Returns (mx, mn) each (L, H, W).

    reduce_window instead of 8 shift+max passes: identical result (border
    windows clip to in-bounds values, same as the old edge-padded shifts,
    and borders are interior-masked downstream anyway) with one fused
    window reduction per direction."""
    mx = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max,
                               (1, 3, 3), (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min,
                               (1, 3, 3), (1, 1, 1), "SAME")
    return mx, mn


def _detect_octave(dog: jnp.ndarray, k_cand: int, contrast_thr: float,
                   edge_thr: float, n_scales: int):
    """Extrema of one octave's DoG stack (L=S+2, H, W).

    Returns fixed-size candidate arrays of length k_cand:
    (s_idx int, y int, x int, off (3,) float [ds, dy, dx], response, valid).
    """
    L, H, W = dog.shape
    mx, mn = _neighborhood_max_min(dog)  # 3x3 spatial extrema per level

    mid = dog[1:-1]  # levels 1..S
    # Max/min across the 3 stacked levels' 3x3 windows (27-neighborhood).
    nb_max = jnp.maximum(jnp.maximum(mx[:-2], mx[2:]),
                         _shift_others_max(mid))
    nb_min = jnp.minimum(jnp.minimum(mn[:-2], mn[2:]),
                         _shift_others_min(mid))
    prelim = 0.5 * contrast_thr / n_scales
    is_max = (mid > nb_max) & (mid > prelim)
    is_min = (mid < nb_min) & (mid < -prelim)
    extremum = is_max | is_min

    # Exclude a border margin (refinement + edge test need the 3x3x3 block).
    yy = jax.lax.broadcasted_iota(jnp.int32, (L - 2, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (L - 2, H, W), 2)
    b = 5
    interior = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    extremum = extremum & interior

    score = jnp.where(extremum, jnp.abs(mid), -1.0)
    flat = score.reshape(-1)
    k = min(k_cand, flat.shape[0])
    top, idx = jax.lax.top_k(flat, k)
    valid = top > 0.0

    s_idx = idx // (H * W) + 1          # level within the gaussian stack
    rem = idx % (H * W)
    y = rem // W
    x = rem % W

    # --- subpixel refinement: quadratic fit on the 27-neighborhood ---------
    dflat = dog.reshape(-1)

    def at(ds, dy, dx):
        i = ((s_idx + ds) * H + (y + dy)) * W + (x + dx)
        return jnp.take(dflat, i, mode="clip")

    c = at(0, 0, 0)
    dx1 = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    dy1 = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    ds1 = 0.5 * (at(1, 0, 0) - at(-1, 0, 0))
    dxx = at(0, 0, 1) + at(0, 0, -1) - 2 * c
    dyy = at(0, 1, 0) + at(0, -1, 0) - 2 * c
    dss = at(1, 0, 0) + at(-1, 0, 0) - 2 * c
    dxy = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))
    dxs = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
    dys = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))

    # Solve H_3x3 * off = -g via the adjugate (batched, branch-free).
    a11, a22, a33 = dxx, dyy, dss
    a12, a13, a23 = dxy, dxs, dys
    det = (a11 * (a22 * a33 - a23 * a23)
           - a12 * (a12 * a33 - a23 * a13)
           + a13 * (a12 * a23 - a22 * a13))
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    gx, gy, gs = dx1, dy1, ds1
    off_x = -(c11 * gx + c12 * gy + c13 * gs) / safe
    off_y = -(c12 * gx + c22 * gy + c23 * gs) / safe
    off_s = -(c13 * gx + c23 * gy + c33 * gs) / safe
    off_ok = ((jnp.abs(off_x) < 0.8) & (jnp.abs(off_y) < 0.8)
              & (jnp.abs(off_s) < 0.8) & (jnp.abs(det) > 1e-12))
    off_x = jnp.clip(off_x, -0.5, 0.5)
    off_y = jnp.clip(off_y, -0.5, 0.5)
    off_s = jnp.clip(off_s, -0.5, 0.5)

    contrast = c + 0.5 * (gx * off_x + gy * off_y + gs * off_s)
    contrast_ok = jnp.abs(contrast) * n_scales >= contrast_thr

    # Edge response on the 2D spatial Hessian (Lowe r-test).
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_thr
    edge_ok = (det2 > 0) & (tr * tr * r < (r + 1) * (r + 1) * det2)

    valid = valid & off_ok & contrast_ok & edge_ok
    return (s_idx, y.astype(jnp.float32) + off_y, x.astype(jnp.float32) + off_x,
            s_idx.astype(jnp.float32) + off_s, jnp.abs(contrast), valid)


def _shift_others_max(mid: jnp.ndarray) -> jnp.ndarray:
    """Max over the 8 spatial neighbors at the same level (excl. center)."""
    out = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                s = _shift2(mid, dy, dx)
                out = s if out is None else jnp.maximum(out, s)
    return out


def _shift_others_min(mid: jnp.ndarray) -> jnp.ndarray:
    out = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                s = _shift2(mid, dy, dx)
                out = s if out is None else jnp.minimum(out, s)
    return out


def _bilinear_pair(flat_grad8: jnp.ndarray, base: jnp.ndarray,
                   hh: jnp.ndarray, ww: jnp.ndarray,
                   ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample (dx, dy) pairs bilinearly from the PACKED flat pyramid buffer.

    flat_grad8: (T, 8) concatenated per-octave gradient levels with the
    2x2 bilinear footprint pre-packed per pixel:
    [g(y,x), g(y,x+1), g(y+1,x), g(y+1,x+1)] (edge-clamped shifts).
    One 8-wide row gather replaces four 2-wide tap gathers — row gathers
    are DESCRIPTOR-bound on TPU (CLAUDE.md gather law), so this quarters
    the dominant per-keypoint cost (measured: SIFT 111 → ~60 ms/frame at
    capacity 8192, 640x480).

    base: (N,) flat offset of each keypoint's level; hh/ww: (N,) level dims.
    ys/xs: (N, P) sample coords in level pixels. Returns ((N, P, 2), (N, P))."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    inb = ((xs >= 0) & (xs <= ww[:, None].astype(jnp.float32) - 1.001)
           & (ys >= 0) & (ys <= hh[:, None].astype(jnp.float32) - 1.001))

    yi = jnp.clip(y0i, 0, hh[:, None] - 1)
    xi = jnp.clip(x0i, 0, ww[:, None] - 1)
    i = base[:, None] + yi * ww[:, None] + xi
    rows = jnp.take(flat_grad8, i, axis=0, mode="clip")  # (N, P, 8)
    v = ((1 - fy) * (1 - fx) * rows[..., 0:2]
         + (1 - fy) * fx * rows[..., 2:4]
         + fy * (1 - fx) * rows[..., 4:6]
         + fy * fx * rows[..., 6:8])
    return v, inb


def _smooth_hist_circular(h: jnp.ndarray) -> jnp.ndarray:
    """OpenCV's [1,4,6,4,1]/16 circular smoothing of the 36-bin histogram."""
    n = h.shape[-1]
    idx = jnp.arange(n)
    out = (6 * h
           + 4 * (h[..., (idx - 1) % n] + h[..., (idx + 1) % n])
           + 1 * (h[..., (idx - 2) % n] + h[..., (idx + 2) % n]))
    return out / 16.0


@partial(jax.jit, static_argnames=("capacity", "n_octaves", "n_scales",
                                   "sigma0", "contrast_thr", "edge_thr",
                                   "n_active"))
def _sift_impl(gray: jnp.ndarray, capacity: int, n_octaves: int,
               n_scales: int, sigma0: float, contrast_thr: float,
               edge_thr: float, n_active: int) -> SiftFeatures:
    H, W = gray.shape
    S = n_scales

    # ------------------------------------------------------------- pyramid
    sig = [sigma0 * (2.0 ** (i / S)) for i in range(S + 3)]
    base = _blur(gray, math.sqrt(max(sigma0 ** 2 - 0.25, 0.01)))
    # Per-level sigmas RELATIVE to the octave base (level 0 ≡ base):
    # Gaussian composition replaces the sequential incremental-blur chain
    # with one two-pass multi-channel conv per octave (see _blur_multi).
    rel = [0.0] + [math.sqrt(max(sig[i] ** 2 - sig[0] ** 2, 1e-6))
                   for i in range(1, S + 3)]
    octaves = []  # list of (S+3, Ho, Wo)
    img = base
    for o in range(n_octaves):
        g = _blur_multi(img, rel)
        octaves.append(g)
        img = g[S, ::2, ::2]  # next octave seeds from the 2x-sigma level

    # ---------------------------------------------------- per-octave extrema
    cands = []
    for o, g in enumerate(octaves):
        dog = g[1:] - g[:-1]
        k_cand = min(capacity, dog[1:-1].size)
        s_i, yf, xf, sf, resp, ok = _detect_octave(
            dog, k_cand, contrast_thr, edge_thr, S)
        pad = capacity - k_cand
        if pad > 0:
            s_i = jnp.pad(s_i, (0, pad))
            yf = jnp.pad(yf, (0, pad))
            xf = jnp.pad(xf, (0, pad))
            sf = jnp.pad(sf, (0, pad), constant_values=1.0)
            resp = jnp.pad(resp, (0, pad))
            ok = jnp.pad(ok, (0, pad))
        cands.append((jnp.full((capacity,), o, jnp.int32), s_i, yf, xf, sf,
                      resp, ok))

    oct_i = jnp.concatenate([c[0] for c in cands])
    s_i = jnp.concatenate([c[1] for c in cands])
    yf = jnp.concatenate([c[2] for c in cands])
    xf = jnp.concatenate([c[3] for c in cands])
    sf = jnp.concatenate([c[4] for c in cands])
    resp = jnp.concatenate([c[5] for c in cands])
    ok = jnp.concatenate([c[6] for c in cands])

    # top_k returns rows response-sorted DESCENDING, so the strongest
    # n_active candidates are a prefix slice. The per-keypoint orientation
    # + descriptor passes below are gather-DESCRIPTOR-bound (cost ∝ rows ×
    # samples, independent of how many rows are valid), so they run only
    # on that prefix — cv2's own n_features truncation keeps exactly the
    # strongest n (reference depth_to_reconstruction.py:133: SIFT_create
    # nfeatures=3000 at capacity budgets of 4096-8192). Outputs are padded
    # back to `capacity` rows with mask=False.
    top, pick = jax.lax.top_k(jnp.where(ok, resp, -1.0), n_active)
    oct_i = jnp.take(oct_i, pick)
    s_i = jnp.take(s_i, pick)
    yf = jnp.take(yf, pick)
    xf = jnp.take(xf, pick)
    sf = jnp.take(sf, pick)
    resp = jnp.take(resp, pick)
    mask = top > 0.0

    # ------------------------------------------- flat gradient pyramid buffer
    # Concatenate every octave's per-level (dx, dy) images into one flat
    # buffer so a single gather serves keypoints from any octave/level.
    # Each pixel's row pre-packs its 2x2 bilinear footprint (the pixel and
    # its +x/+y/+xy neighbors, edge-clamped) into 8 floats: the orientation
    # and descriptor passes then need ONE row gather each instead of four
    # tap gathers — the gathers are the dominant per-keypoint cost (see
    # _bilinear_pair). 4x buffer memory (~80 MB at 640x480x5 octaves) for
    # ~2x kernel time.
    grads = []
    level_offset = np.zeros((n_octaves, S + 3), np.int64)
    level_h = np.zeros((n_octaves,), np.int32)
    level_w = np.zeros((n_octaves,), np.int32)
    total = 0
    for o, g in enumerate(octaves):
        ho, wo = g.shape[1:]
        gx = 0.5 * (_shift2(g, 0, 1) - _shift2(g, 0, -1))
        gy = 0.5 * (_shift2(g, 1, 0) - _shift2(g, -1, 0))
        gxy = jnp.stack([gx, gy], axis=-1)                  # (L, H, W, 2)

        def shift_img(a, dy, dx):
            b = jnp.moveaxis(a, -1, 1)                      # (L, 2, H, W)
            return jnp.moveaxis(_shift2(b, dy, dx), 1, -1)

        packed = jnp.concatenate([
            gxy,
            shift_img(gxy, 0, 1),    # (y, x+1), edge-clamped
            shift_img(gxy, 1, 0),    # (y+1, x)
            shift_img(gxy, 1, 1),    # (y+1, x+1)
        ], axis=-1)                                         # (L, H, W, 8)
        grads.append(packed.reshape(-1, 8))
        for i in range(S + 3):
            level_offset[o, i] = total + i * ho * wo
        level_h[o] = ho
        level_w[o] = wo
        total += (S + 3) * ho * wo
    flat_grad = jnp.concatenate(grads, axis=0)
    off_tab = jnp.asarray(level_offset.reshape(-1), jnp.int32)
    h_tab = jnp.asarray(level_h)
    w_tab = jnp.asarray(level_w)

    base_idx = jnp.take(off_tab, oct_i * (S + 3) + s_i, mode="clip")
    hh = jnp.take(h_tab, oct_i, mode="clip")
    ww = jnp.take(w_tab, oct_i, mode="clip")

    sigma_rel = sigma0 * (2.0 ** (sf / S))  # scale in octave pixels

    # -------------------------------------------------- orientation histogram
    J = _SAMPLE_GRID
    lin = (jnp.arange(J, dtype=jnp.float32) + 0.5) / J * 2.0 - 1.0  # (-1, 1)
    gu, gv = jnp.meshgrid(lin, lin)  # (J, J) unit offsets
    gu = gu.reshape(-1)
    gv = gv.reshape(-1)  # (P,)
    r_ori = 3.0 * 1.5 * sigma_rel  # OpenCV SIFT_ORI_RADIUS
    ys = yf[:, None] + gv[None, :] * r_ori[:, None]
    xs = xf[:, None] + gu[None, :] * r_ori[:, None]
    g, inb = _bilinear_pair(flat_grad, base_idx, hh, ww, ys, xs)
    mag = jnp.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2)
    ang = jnp.arctan2(g[..., 1], g[..., 0])  # (-pi, pi]
    rr2 = gu[None, :] ** 2 + gv[None, :] ** 2
    wgt = jnp.exp(-rr2 * r_ori[:, None] ** 2
                  / (2.0 * (1.5 * sigma_rel[:, None]) ** 2))
    wgt = jnp.where((rr2 <= 1.0) & inb, wgt, 0.0)

    NB = 36
    b = (ang + jnp.pi) / (2 * jnp.pi) * NB  # [0, 36]
    contrib = wgt * mag
    bins = jnp.arange(NB, dtype=jnp.float32)
    dwrap = jnp.abs(b[..., None] - bins)
    dwrap = jnp.minimum(dwrap, NB - dwrap)
    Bw = jnp.clip(1.0 - dwrap, 0.0, 1.0)  # (N, P, 36) circular linear weights
    # Batched matmul (contract the patch axis) — rides the MXU, no scatter.
    hist = jnp.einsum("np,npb->nb", contrib, Bw,
                      preferred_element_type=jnp.float32)
    hist = _smooth_hist_circular(_smooth_hist_circular(hist))
    pk = jnp.argmax(hist, axis=-1)
    hl = jnp.take_along_axis(hist, ((pk - 1) % NB)[:, None], 1)[:, 0]
    hc = jnp.take_along_axis(hist, pk[:, None], 1)[:, 0]
    hr = jnp.take_along_axis(hist, ((pk + 1) % NB)[:, None], 1)[:, 0]
    denom = hl - 2 * hc + hr
    frac = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    # Bin k's tent weight peaks at b == k exactly (no half-bin shift in the
    # accumulation above), so the interpolated peak angle is (pk + frac);
    # a former +0.5 here biased every keypoint angle by half a bin = 5 deg
    # [code-review r2] — consistent internally, but wrong in the exported
    # angle field and against real cv2 SIFT descriptors.
    theta = (pk.astype(jnp.float32) + jnp.clip(frac, -0.5, 0.5)) \
        / NB * 2 * jnp.pi - jnp.pi  # radians, gradient-frame

    # --------------------------------------------------------- descriptor
    D = 4   # spatial bins per side
    NO = 8  # orientation bins
    JD = _SAMPLE_GRID
    lin_d = (jnp.arange(JD, dtype=jnp.float32) + 0.5) / JD * D - D / 2  # cell units
    du, dv = jnp.meshgrid(lin_d, lin_d)
    du = du.reshape(-1)
    dv = dv.reshape(-1)  # (PD,) in (-2, 2)
    hist_w = 3.0 * sigma_rel  # pixels per descriptor cell
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    # rotate sample offsets into image frame
    ox = (du[None, :] * ct[:, None] - dv[None, :] * st[:, None]) * hist_w[:, None]
    oy = (du[None, :] * st[:, None] + dv[None, :] * ct[:, None]) * hist_w[:, None]
    ys = yf[:, None] + oy
    xs = xf[:, None] + ox
    g, inb = _bilinear_pair(flat_grad, base_idx, hh, ww, ys, xs)
    mag = jnp.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2)
    ang = jnp.arctan2(g[..., 1], g[..., 0]) - theta[:, None]  # rotate to kp frame
    wgt = jnp.exp(-(du[None, :] ** 2 + dv[None, :] ** 2) / (2 * (0.5 * D) ** 2))
    contrib = jnp.where(inb, mag * wgt, 0.0)

    # trilinear bin weights via per-axis two-tap one-hots (no scatter)
    rbin = dv[None, :] + D / 2 - 0.5  # [-0.5, 3.5]
    cbin = du[None, :] + D / 2 - 0.5
    obin = (jnp.mod(ang, 2 * jnp.pi)) / (2 * jnp.pi) * NO  # [0, 8)
    cols = jnp.arange(D, dtype=jnp.float32)

    def axis_w(v):
        # (N, P, D): linear weight of sample v onto integer bins 0..D-1
        w = 1.0 - jnp.abs(v[..., None] - cols)
        return jnp.clip(w, 0.0, 1.0)

    Rw = axis_w(jnp.broadcast_to(rbin, mag.shape))
    Cw = axis_w(jnp.broadcast_to(cbin, mag.shape))
    ob = jnp.arange(NO, dtype=jnp.float32)
    dwrap = jnp.abs(obin[..., None] - ob)
    dwrap = jnp.minimum(dwrap, NO - dwrap)
    Ow = jnp.clip(1.0 - dwrap, 0.0, 1.0)  # (N, P, 8) circular linear weights

    # Two-step contraction keeps intermediates at (N, P, 16) instead of the
    # (N, P, 4, 4, 8) tensor a single 4-operand einsum would materialize.
    RC = (Rw[..., :, None] * Cw[..., None, :]).reshape(*mag.shape, D * D)
    desc = jnp.einsum("npk,npo->nko", RC * contrib[..., None], Ow,
                      preferred_element_type=jnp.float32)
    desc = desc.reshape(desc.shape[0], D * D * NO)

    # SIFT normalization: L2, clip 0.2, renormalize, scale to byte range.
    nrm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(nrm, 1e-7)
    desc = jnp.minimum(desc, 0.2)
    nrm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(nrm, 1e-7)
    desc = jnp.minimum(512.0 * desc, 255.0)

    # ------------------------------------------------------------- outputs
    scale_mult = (2.0 ** oct_i).astype(jnp.float32)
    uv = jnp.stack([xf * scale_mult, yf * scale_mult], axis=-1)
    size = sigma_rel * scale_mult * 2.0
    angle_deg = jnp.mod(-jnp.degrees(theta), 360.0)  # cv2's y-down convention
    pad = capacity - n_active
    if pad > 0:
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        size = jnp.pad(size, (0, pad))
        angle_deg = jnp.pad(angle_deg, (0, pad))
        resp = jnp.pad(resp, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))
    return SiftFeatures(uv, size, angle_deg, resp, desc, mask)


def sift_features(gray, capacity: int = 4096, n_octaves: int | None = None,
                  n_scales: int = 3, sigma0: float = 1.6,
                  contrast_threshold: float = 0.04,
                  edge_threshold: float = 10.0,
                  n_features: int | None = None) -> SiftFeatures:
    """Detect + describe SIFT features of a (H, W) image on device.

    `gray` may be uint8 (0..255) or float (0..1). Returns fixed-capacity
    arrays; invalid rows are masked. Defaults mirror cv2.SIFT_create; the
    fusion pipeline overrides contrast_threshold=0.01, edge_threshold=15
    (reference depth_to_reconstruction.py:133-137).

    `n_features` (cv2 nfeatures): keep only the strongest n keypoints.
    Also a perf lever — the per-keypoint gather passes then run on
    ceil128(n_features) rows instead of all `capacity` rows (the gathers
    are the dominant device cost; see _sift_impl).
    """
    gray = jnp.asarray(gray)
    if gray.dtype == jnp.uint8 or gray.dtype == np.uint8:
        gray = gray.astype(jnp.float32) / 255.0
    else:
        gray = gray.astype(jnp.float32)
    H, W = gray.shape
    if n_octaves is None:
        n_octaves = max(1, min(5, int(math.log2(max(min(H, W) / 16.0, 2.0)))))
    n_active = capacity
    if n_features is not None:
        n_active = min(capacity, max(128, ((int(n_features) + 127) // 128) * 128))
    return _sift_impl(gray, capacity=capacity, n_octaves=n_octaves,
                      n_scales=n_scales, sigma0=float(sigma0),
                      contrast_thr=float(contrast_threshold),
                      edge_thr=float(edge_threshold), n_active=n_active)
