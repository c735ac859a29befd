"""Hybrid feature detection + matching for textureless surfaces.

Rebuild of the reference HybridFeatureDetector / DepthGuidedMatcher
(depth_enhanced_reconstruction.py:178-528): SIFT + ORB + LSD line-endpoint
features with NCC patch verification, ratio-test matching, duplicate removal,
and depth-consistency filtering.

Division of labor: detection (SIFT/ORB/LSD/Canny) rides OpenCV's C++ kernels
(the reference's own substrate); descriptor matching runs on-device as MXU
matmuls; the NCC endpoint verification and depth filter are vectorized
(the reference loops per endpoint / per match in Python).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

try:
    import cv2

    CV2_AVAILABLE = True
except ImportError:  # pragma: no cover
    cv2 = None
    CV2_AVAILABLE = False

import jax
import jax.numpy as jnp

from txr.geometry.features import Features, _pad_features, dedupe_matches
from txr.ops.matching import match_l2_ratio, match_hamming_ratio, unpack_bits


@dataclass
class HybridFeatures:
    sift: Optional[Features]
    orb: Optional[Features]
    lines: Optional[np.ndarray]        # (L, 4) x1 y1 x2 y2
    edges: Optional[np.ndarray]        # (H, W) uint8 Canny map
    gray: np.ndarray


# Jitted batched hybrid-detect programs, shared across instances.
_HYBRID_BATCH_CACHE: dict = {}


class HybridFeatureDetector:
    """SIFT(3000, 0.02) + ORB(2000, 8 levels) + LSD lines + Canny(50,150).

    backend: 'cv2' rides OpenCV C++ (the reference's substrate), 'device'
    runs every stage as XLA ops (txr.ops.{sift,orb,lsd,canny} — SURVEY §2.8
    items 3-7), 'auto' prefers cv2 when installed.
    """

    def __init__(self, use_sift: bool = True, use_orb: bool = True,
                 use_lines: bool = True, use_edges: bool = True,
                 sift_capacity: int = 3072, orb_capacity: int = 2048,
                 verbose: bool = True, backend: str = "auto"):
        from txr.geometry.features import resolve_backend
        backend = resolve_backend(backend)
        self.backend = backend
        self.use_sift = use_sift
        self.use_orb = use_orb
        self.use_lines = use_lines
        self.use_edges = use_edges
        self.verbose = verbose
        if backend == "cv2":
            if use_sift:
                self.sift = cv2.SIFT_create(nfeatures=3000, contrastThreshold=0.02)
            if use_orb:
                self.orb = cv2.ORB_create(nfeatures=2000, scaleFactor=1.2, nlevels=8)
            if use_lines:
                self.lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_STD)
        self.sift_capacity = sift_capacity
        self.orb_capacity = orb_capacity

    def _log(self, msg):
        if self.verbose:
            print(msg)

    def detect(self, image: np.ndarray) -> HybridFeatures:
        if image.ndim == 3:
            if CV2_AVAILABLE:
                gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
            else:
                gray = (0.114 * image[..., 0] + 0.587 * image[..., 1]
                        + 0.299 * image[..., 2]).astype(np.uint8)
        else:
            gray = image
        if self.backend == "device":
            return self._detect_device(gray)
        sift = orb = None
        lines = edges = None
        if self.use_sift:
            kps, desc = self.sift.detectAndCompute(gray, None)
            uv = np.array([k.pt for k in kps], np.float32) if kps else np.zeros((0, 2), np.float32)
            d = desc.astype(np.float32) if desc is not None else np.zeros((0, 128), np.float32)
            sift = _pad_features(uv, d, self.sift_capacity, "sift")
            self._log(f"  SIFT: {len(uv)} keypoints")
        if self.use_orb:
            kps, desc = self.orb.detectAndCompute(gray, None)
            uv = np.array([k.pt for k in kps], np.float32) if kps else np.zeros((0, 2), np.float32)
            d = desc if desc is not None else np.zeros((0, 32), np.uint8)
            orb = _pad_features(uv, d, self.orb_capacity, "orb")
            self._log(f"  ORB: {len(uv)} keypoints")
        if self.use_lines:
            out = self.lsd.detect(gray)
            raw = out[0] if out is not None else None
            lines = raw.reshape(-1, 4) if raw is not None else np.zeros((0, 4), np.float32)
            self._log(f"  Lines: {len(lines)} segments")
        if self.use_edges:
            edges = cv2.Canny(gray, 50, 150)
            self._log(f"  Edge points: {int((edges > 0).sum())}")
        return HybridFeatures(sift=sift, orb=orb, lines=lines, edges=edges, gray=gray)

    def _detect_device(self, gray: np.ndarray) -> HybridFeatures:
        """All four stages as XLA programs on the accelerator."""
        sift = orb = None
        lines = edges = None
        if self.use_sift:
            from txr.ops.sift import sift_features
            f = sift_features(gray, capacity=self.sift_capacity,
                              contrast_threshold=0.02)
            sift = Features(np.asarray(f.uv), np.asarray(f.desc),
                            np.asarray(f.mask), "sift")
            self._log(f"  SIFT: {sift.count} keypoints")
        if self.use_orb:
            from txr.ops.orb import orb_features
            f = orb_features(gray, capacity=self.orb_capacity, n_levels=8)
            orb = Features(np.asarray(f.uv), np.asarray(f.desc),
                           np.asarray(f.mask), "orb")
            self._log(f"  ORB: {orb.count} keypoints")
        if self.use_lines:
            from txr.ops.lsd import lsd_lines
            out = lsd_lines(gray)
            lines = np.asarray(out.lines)[np.asarray(out.mask)]
            self._log(f"  Lines: {len(lines)} segments")
        if self.use_edges:
            from txr.ops.canny import canny
            edges = np.asarray(canny(jnp.asarray(gray)))
            self._log(f"  Edge points: {int((edges > 0).sum())}")
        return HybridFeatures(sift=sift, orb=orb, lines=lines, edges=edges, gray=gray)

    BATCH = 4  # frames per batched device program (4 stages each)

    def _device_batch_fn(self, h: int, w: int):
        # Module-level program cache (same rationale as
        # features.SIFTDetector._device_batch_fn: fresh detector instances
        # must not re-trace).
        key = (h, w, self.use_sift, self.use_orb, self.use_lines,
               self.use_edges, self.sift_capacity, self.orb_capacity)
        cache = _HYBRID_BATCH_CACHE
        fn = cache.get(key)
        if fn is None:
            from txr.ops.canny import canny
            from txr.ops.lsd import lsd_lines
            from txr.ops.orb import orb_features
            from txr.ops.sift import sift_features

            us, uo = self.use_sift, self.use_orb
            ul, ue = self.use_lines, self.use_edges
            scap, ocap = self.sift_capacity, self.orb_capacity

            @jax.jit
            def fn(grays_u8):  # (B, h, w) uint8
                def one(g):
                    outs = {}
                    if us:
                        f = sift_features(g, capacity=scap,
                                          contrast_threshold=0.02)
                        outs["sift"] = (f.uv, f.desc, f.mask)
                    if uo:
                        f = orb_features(g, capacity=ocap, n_levels=8)
                        outs["orb"] = (f.uv, f.desc, f.mask)
                    if ul:
                        ln = lsd_lines(g)
                        outs["lines"] = (ln.lines, ln.mask)
                    if ue:
                        outs["edges"] = canny.__wrapped__(g, 50.0, 150.0)
                    return outs

                return jax.lax.map(one, grays_u8)

            cache[key] = fn
        return fn

    def detect_batch(self, images) -> list:
        """Detect over a sequence with ONE device program (all four stages
        via lax.map) + one transfer each way per BATCH frames. The scalar
        device path pays 4 dispatches + ~10 host syncs per frame — the
        dominant cost of the enhanced CLI on the relay (VERDICT r2 #2).
        cv2 backend keeps the per-frame C++ loop."""
        if self.backend != "device":
            return [self.detect(im) for im in images]
        out: list = [None] * len(images)
        groups: dict = {}
        for i, im in enumerate(images):
            if im.ndim == 3:
                if CV2_AVAILABLE:
                    g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
                else:
                    g = (0.114 * im[..., 0] + 0.587 * im[..., 1]
                         + 0.299 * im[..., 2]).astype(np.uint8)
            else:
                g = im
            groups.setdefault(g.shape, []).append((i, g))
        for (h, w), items in groups.items():
            fn = self._device_batch_fn(h, w)
            for s in range(0, len(items), self.BATCH):
                chunk = items[s:s + self.BATCH]
                n = len(chunk)
                grays = np.stack([g for _, g in chunk]
                                 + [chunk[-1][1]] * (self.BATCH - n))
                res = jax.device_get(fn(jnp.asarray(grays)))
                for k, (i, g) in enumerate(chunk):
                    sift = orb = None
                    lines = edges = None
                    if self.use_sift:
                        uv, desc, mask = (res["sift"][0][k], res["sift"][1][k],
                                          res["sift"][2][k].astype(bool))
                        sift = Features(uv, desc, mask, "sift")
                        self._log(f"  SIFT: {sift.count} keypoints")
                    if self.use_orb:
                        uv, desc, mask = (res["orb"][0][k], res["orb"][1][k],
                                          res["orb"][2][k].astype(bool))
                        orb = Features(uv, desc, mask, "orb")
                        self._log(f"  ORB: {orb.count} keypoints")
                    if self.use_lines:
                        lines = res["lines"][0][k][
                            res["lines"][1][k].astype(bool)]
                        self._log(f"  Lines: {len(lines)} segments")
                    if self.use_edges:
                        edges = res["edges"][k]
                        self._log(f"  Edge points: {int((edges > 0).sum())}")
                    out[i] = HybridFeatures(sift=sift, orb=orb, lines=lines,
                                            edges=edges, gray=g)
        return out

    # ------------------------------------------------------------- matching

    def match_features(self, f1: HybridFeatures, f2: HybridFeatures,
                       ratio_thresh: float = 0.75) -> Tuple[np.ndarray, np.ndarray]:
        """Returns dense (pts1 (M,2), pts2 (M,2)) matched pairs (host arrays)."""
        all1, all2 = [], []
        if f1.sift is not None and f2.sift is not None:
            idx2, ok = match_l2_ratio(
                jnp.asarray(f1.sift.desc), jnp.asarray(f2.sift.desc),
                jnp.asarray(f1.sift.mask), jnp.asarray(f2.sift.mask), ratio_thresh)
            ok = np.asarray(ok)
            all1.append(f1.sift.uv[ok])
            all2.append(f2.sift.uv[np.asarray(idx2)[ok]])
            self._log(f"  SIFT matches: {int(ok.sum())}")
        if f1.orb is not None and f2.orb is not None:
            idx2, ok = match_hamming_ratio(
                unpack_bits(jnp.asarray(f1.orb.desc)), unpack_bits(jnp.asarray(f2.orb.desc)),
                jnp.asarray(f1.orb.mask), jnp.asarray(f2.orb.mask), ratio_thresh)
            ok = np.asarray(ok)
            all1.append(f1.orb.uv[ok])
            all2.append(f2.orb.uv[np.asarray(idx2)[ok]])
            self._log(f"  ORB matches: {int(ok.sum())}")
        if f1.lines is not None and f2.lines is not None:
            l1, l2 = match_line_endpoints(f1.lines, f2.lines, f1.gray, f2.gray)
            if len(l1):
                all1.append(l1)
                all2.append(l2)
            self._log(f"  Line endpoint matches: {len(l1)}")

        if not all1 or sum(len(a) for a in all1) == 0:
            return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)
        pts1 = np.concatenate(all1).astype(np.float32)
        pts2 = np.concatenate(all2).astype(np.float32)
        mask = np.ones(len(pts1), bool)
        keep = dedupe_matches(pts1, pts2, mask, px_threshold=2.0)
        self._log(f"  Total unique matches: {int(keep.sum())}")
        return pts1[keep], pts2[keep]


def match_line_endpoints(lines1: np.ndarray, lines2: np.ndarray,
                         gray1: np.ndarray, gray2: np.ndarray,
                         search_radius: float = 30.0, max_endpoints: int = 200,
                         patch_size: int = 11, ncc_thresh: float = 0.7
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest line-endpoint matching verified by 11x11 NCC (vectorized
    rebuild of reference :322-386)."""
    if len(lines1) == 0 or len(lines2) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)
    ep1 = lines1[:, :4].reshape(-1, 2)[:max_endpoints]
    ep2 = lines2[:, :4].reshape(-1, 2)

    # All-pairs distances, nearest within radius.
    d = np.linalg.norm(ep1[:, None, :] - ep2[None, :, :], axis=-1)  # (m, n)
    best = d.argmin(axis=1)
    ok = d[np.arange(len(ep1)), best] < search_radius
    if not ok.any():
        return np.zeros((0, 2), np.float32), np.zeros((0, 2), np.float32)

    p1 = ep1[ok]
    p2 = ep2[best[ok]]

    half = patch_size // 2

    def extract(gray, pts):
        h, w = gray.shape
        x = pts[:, 0].astype(int)
        y = pts[:, 1].astype(int)
        inb = (x >= half) & (x + half < w) & (y >= half) & (y + half < h)
        patches = np.zeros((len(pts), patch_size, patch_size), np.float32)
        for i in np.where(inb)[0]:  # bounded by max_endpoints
            patches[i] = gray[y[i] - half:y[i] + half + 1,
                              x[i] - half:x[i] + half + 1]
        return patches, inb

    pa, in1 = extract(gray1, p1)
    pb, in2 = extract(gray2, p2)
    valid = in1 & in2
    pa = pa.reshape(len(pa), -1)
    pb = pb.reshape(len(pb), -1)
    pa = (pa - pa.mean(axis=1, keepdims=True)) / (pa.std(axis=1, keepdims=True) + 1e-6)
    pb = (pb - pb.mean(axis=1, keepdims=True)) / (pb.std(axis=1, keepdims=True) + 1e-6)
    ncc = (pa * pb).mean(axis=1)
    keep = valid & (ncc > ncc_thresh)
    return p1[keep].astype(np.float32), p2[keep].astype(np.float32)


class DepthGuidedMatcher:
    """Depth-consistency match filter (reference :413-483, vectorized)."""

    def __init__(self, depth_consistency_thresh: float = 0.15):
        self.depth_thresh = depth_consistency_thresh

    def filter_matches_by_depth(self, pts1, pts2, depth1, depth2):
        if depth1 is None or depth2 is None or len(pts1) < 4:
            return pts1, pts2
        h1, w1 = depth1.shape
        h2, w2 = depth2.shape
        x1 = pts1[:, 0].astype(int); y1 = pts1[:, 1].astype(int)
        x2 = pts2[:, 0].astype(int); y2 = pts2[:, 1].astype(int)
        inb = ((x1 >= 0) & (x1 < w1) & (y1 >= 0) & (y1 < h1) &
               (x2 >= 0) & (x2 < w2) & (y2 >= 0) & (y2 < h2))
        idx = np.where(inb)[0]
        d1 = depth1[y1[idx], x1[idx]]
        d2 = depth2[y2[idx], x2[idx]]
        pos = (d1 > 0) & (d2 > 0)
        idx = idx[pos]
        if len(idx) < 4:
            return pts1, pts2
        d1, d2 = d1[pos], d2[pos]
        n1 = (d1 - d1.min()) / (d1.max() - d1.min() + 1e-6)
        n2 = (d2 - d2.min()) / (d2.max() - d2.min() + 1e-6)
        consistent = np.abs(n1 - n2) < self.depth_thresh
        rank1 = np.argsort(np.argsort(d1))
        rank2 = np.argsort(np.argsort(d2))
        rank_ok = np.abs(rank1 - rank2) / len(rank1) < 0.3
        final = consistent | rank_ok
        sel = idx[final]
        return pts1[sel], pts2[sel]


def generate_dense_correspondences(depth1: np.ndarray, depth2: np.ndarray,
                                   R: np.ndarray, t: np.ndarray, K: np.ndarray,
                                   grid_step: int = 16):
    """Dense grid correspondences from depth + known pose (vectorized parity
    of reference :485-528, which loops per grid point; defined there but
    never called — provided for API completeness).

    Back-projects a grid of image-1 pixels with depth1, transforms into
    camera 2, reprojects, and keeps in-bounds points with positive depth.
    Returns (pts1 (M,2), pts2 (M,2)) float32.
    """
    h, w = depth1.shape
    ys, xs = np.mgrid[0:h:grid_step, 0:w:grid_step]
    xs = xs.ravel().astype(np.float64)
    ys = ys.ravel().astype(np.float64)
    d = depth1[ys.astype(int), xs.astype(int)]
    ok = d > 0
    xs, ys, d = xs[ok], ys[ok], d[ok]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    P1 = np.stack([(xs - cx) * d / fx, (ys - cy) * d / fy, d], axis=1)
    P2 = P1 @ np.asarray(R).T + np.asarray(t).reshape(1, 3)
    front = P2[:, 2] > 0
    P2, xs, ys = P2[front], xs[front], ys[front]
    u2 = fx * P2[:, 0] / P2[:, 2] + cx
    v2 = fy * P2[:, 1] / P2[:, 2] + cy
    inb = (u2 >= 0) & (u2 < w) & (v2 >= 0) & (v2 < h)
    pts1 = np.stack([xs[inb], ys[inb]], axis=1).astype(np.float32)
    pts2 = np.stack([u2[inb], v2[inb]], axis=1).astype(np.float32)
    return pts1, pts2
