"""Feature detection and matching for textureless scenes.

Detection rides OpenCV's C++ kernels (the same native substrate the reference
delegates to — SURVEY §1 L0): SIFT with CLAHE preprocessing for low-contrast
frames (reference depth_to_reconstruction.py:133-153), and the hybrid
SIFT+ORB+line+edge detector of depth_enhanced_reconstruction.py:178-406.
Descriptor matching runs on-device as MXU matmuls (txr.ops.matching).

Fixed-capacity contract: every detector returns exactly `capacity` rows with a
validity mask so downstream jitted ops compile once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

try:
    import cv2

    CV2_AVAILABLE = True
except ImportError:  # pragma: no cover
    CV2_AVAILABLE = False

import jax
import jax.numpy as jnp

from txr.ops.matching import match_l2_ratio, match_hamming_ratio, unpack_bits


# Jitted batched-detect programs, shared across detector instances (see
# SIFTDetector._device_batch_fn).
_DEVICE_BATCH_CACHE: dict = {}


def resolve_backend(backend: str) -> str:
    """Resolve 'auto' to a concrete feature backend.

    On an accelerator ('tpu'/'axon') the TPU-native kernels are the default
    — the whole RGB→features→pose→fusion path stays on device. On CPU, cv2's
    C++ kernels (the reference's substrate, depth_to_reconstruction.py:133)
    win when installed; the device ops remain the fallback."""
    if backend != "auto":
        return backend
    if jax.default_backend() != "cpu":
        return "device"
    return "cv2" if CV2_AVAILABLE else "device"


@dataclass
class Features:
    """Fixed-capacity keypoints + descriptors."""

    uv: np.ndarray          # (N, 2) float32 pixel coords
    desc: np.ndarray        # (N, D) float32 descriptors (SIFT) or packed uint8
    mask: np.ndarray        # (N,) bool
    kind: str = "sift"      # 'sift' | 'orb'

    @property
    def count(self) -> int:
        return int(self.mask.sum())


def _pad_features(uv, desc, capacity, kind):
    n = min(len(uv), capacity)
    d = desc.shape[1] if len(desc) else (128 if kind == "sift" else 32)
    out_uv = np.zeros((capacity, 2), np.float32)
    out_desc = np.zeros((capacity, d), desc.dtype if len(desc) else np.float32)
    out_mask = np.zeros((capacity,), bool)
    out_uv[:n] = uv[:n]
    out_desc[:n] = desc[:n]
    out_mask[:n] = True
    return Features(out_uv, out_desc, out_mask, kind)


class SIFTDetector:
    """SIFT with optional CLAHE preprocessing.

    Defaults follow the fusion pipeline's textureless-tuned settings
    (reference depth_to_reconstruction.py:133-153): 8000 features,
    contrastThreshold 0.01, edgeThreshold 15, CLAHE(2.0, 8x8).

    backend: 'cv2' rides OpenCV's C++ kernels (the reference's substrate;
    bit-identical behavior), 'device' runs the TPU-native XLA implementation
    (txr.ops.sift + txr.ops.clahe — SURVEY §2.8 item 3), 'auto' prefers cv2
    when installed.
    """

    def __init__(
        self,
        n_features: int = 8000,
        contrast_threshold: float = 0.01,
        edge_threshold: float = 15,
        use_clahe: bool = True,
        capacity: int = 8192,
        backend: str = "auto",
    ):
        backend = resolve_backend(backend)
        self.backend = backend
        self.use_clahe = use_clahe
        self.n_features = n_features
        self.contrast_threshold = contrast_threshold
        self.edge_threshold = edge_threshold
        self.capacity = capacity
        if backend == "cv2":
            self.sift = cv2.SIFT_create(
                nfeatures=n_features,
                contrastThreshold=contrast_threshold,
                edgeThreshold=edge_threshold,
            )
            self.clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)) if use_clahe else None

    def _to_gray(self, bgr: np.ndarray) -> np.ndarray:
        if bgr.ndim != 3:
            return bgr
        if CV2_AVAILABLE:
            return cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        b, g, r = bgr[..., 0], bgr[..., 1], bgr[..., 2]
        return (0.114 * b + 0.587 * g + 0.299 * r).astype(bgr.dtype)

    def detect(self, bgr: np.ndarray) -> Features:
        gray = self._to_gray(bgr)
        if self.backend == "device":
            return self._detect_device(gray)
        if self.clahe is not None:
            gray = self.clahe.apply(gray)
        kps, desc = self.sift.detectAndCompute(gray, None)
        if desc is None or len(kps) == 0:
            return _pad_features(np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32),
                                 self.capacity, "sift")
        uv = np.array([kp.pt for kp in kps], np.float32)
        return _pad_features(uv, desc.astype(np.float32), self.capacity, "sift")

    def _detect_device(self, gray: np.ndarray) -> Features:
        from txr.ops.sift import sift_features
        if self.use_clahe:
            from txr.ops.clahe import clahe as clahe_op
            g8 = gray if gray.dtype == np.uint8 else np.clip(gray, 0, 255).astype(np.uint8)
            gray = np.asarray(clahe_op(jnp.asarray(g8)))
        f = sift_features(
            gray, capacity=self.capacity,
            contrast_threshold=self.contrast_threshold,
            edge_threshold=float(self.edge_threshold),
            n_features=self.n_features,
        )
        return Features(np.asarray(f.uv), np.asarray(f.desc),
                        np.asarray(f.mask), "sift")

    # Frames per batched device program. Fixed (not pow2-of-n) so every
    # same-shape sequence shares ONE compiled program; short tails pad by
    # repeating the last frame and slice the results.
    BATCH = 8

    def _device_batch_fn(self, h: int, w: int):
        # Module-level cache: the jitted program depends only on the knobs
        # in the key, so a second detector instance (fresh pipeline, bench
        # profiled pass) reuses it instead of re-tracing (r5: retrace +
        # cache-load charged seconds to the first detect_batch call).
        key = (h, w, self.capacity, float(self.contrast_threshold),
               float(self.edge_threshold), self.use_clahe, self.n_features)
        cache = _DEVICE_BATCH_CACHE
        fn = cache.get(key)
        if fn is None:
            from txr.ops.sift import sift_features
            from txr.ops.clahe import clahe as clahe_op

            cap = self.capacity
            ct = float(self.contrast_threshold)
            et = float(self.edge_threshold)
            uc = self.use_clahe
            nf = self.n_features

            @jax.jit
            def fn(grays_u8):  # (B, h, w) uint8
                def one(g):
                    if uc:
                        g = clahe_op.__wrapped__(g, 2.0, 8)
                    f = sift_features(g, capacity=cap, contrast_threshold=ct,
                                      edge_threshold=et, n_features=nf)
                    return f.uv, f.desc, f.mask

                # lax.map, NOT vmap: vmapping the SIFT passes measured
                # 104.5 ms/frame vs 37.8 sequential at capacity 8192
                # (tools/probe_device_features.py, r5) — the pre-packed
                # single-row-gather footprint passes (a769a09) lower to a
                # much slower two-axis gather once a batch dim is mapped
                # in. Sequential per-frame keeps the optimized lowering.
                return jax.lax.map(one, grays_u8)

            cache[key] = fn
        return fn

    def detect_batch(self, images) -> list:
        """Detect over a sequence with ONE device program (CLAHE + SIFT via
        lax.map) + ONE transfer each way per BATCH frames, instead of the
        2 dispatches + 4 round trips per frame the scalar path pays — the
        per-frame sync tax dominated the sequence CLIs on the relay
        (VERDICT r2 #2). cv2 backend keeps the per-frame C++ loop."""
        if self.backend != "device":
            return [self.detect(im) for im in images]
        out: list = [None] * len(images)
        groups: dict = {}  # folders may mix shapes; group to keep static
        for i, im in enumerate(images):
            g = self._to_gray(im)
            if g.dtype != np.uint8:
                g = np.clip(g, 0, 255).astype(np.uint8)
            groups.setdefault(g.shape, []).append((i, g))
        for (h, w), items in groups.items():
            fn = self._device_batch_fn(h, w)
            for s in range(0, len(items), self.BATCH):
                chunk = items[s:s + self.BATCH]
                n = len(chunk)
                grays = np.stack([g for _, g in chunk]
                                 + [chunk[-1][1]] * (self.BATCH - n))
                # Features stay DEVICE-resident (lazy row slices): the
                # fusion pipeline re-stacks them for its pair program, and
                # a D2H+H2D round trip of the descriptor stack is ~8 MB/
                # frame — seconds per sequence through the relay (r5:
                # charged 965 ms/frame to the "pairs" stage). numpy
                # consumers np.asarray() on use.
                uv, desc, mask = fn(jnp.asarray(grays))
                for k, (i, _) in enumerate(chunk):
                    out[i] = Features(uv[k], desc[k], mask[k], "sift")
        return out


class ORBDetector:
    """ORB detector (reference depth_enhanced_reconstruction.py:197-199:
    2000 features, 8 levels).

    backend: 'cv2' (OpenCV C++), 'device' (TPU-native txr.ops.orb — SURVEY
    §2.8 item 4), or 'auto'. Descriptors from the two backends use different
    BRIEF patterns and must not be cross-matched.
    """

    def __init__(self, n_features: int = 2000, n_levels: int = 8,
                 capacity: int = 2048, backend: str = "auto"):
        backend = resolve_backend(backend)
        self.backend = backend
        self.n_levels = n_levels
        self.capacity = capacity
        if backend == "cv2":
            self.orb = cv2.ORB_create(nfeatures=n_features, nlevels=n_levels)

    def detect(self, bgr: np.ndarray) -> Features:
        if bgr.ndim == 3:
            if CV2_AVAILABLE:
                gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
            else:
                gray = (0.114 * bgr[..., 0] + 0.587 * bgr[..., 1]
                        + 0.299 * bgr[..., 2]).astype(bgr.dtype)
        else:
            gray = bgr
        if self.backend == "device":
            from txr.ops.orb import orb_features
            f = orb_features(gray, capacity=self.capacity, n_levels=self.n_levels)
            return Features(np.asarray(f.uv), np.asarray(f.desc),
                            np.asarray(f.mask), "orb")
        kps, desc = self.orb.detectAndCompute(gray, None)
        if desc is None or len(kps) == 0:
            return _pad_features(np.zeros((0, 2), np.float32), np.zeros((0, 32), np.uint8),
                                 self.capacity, "orb")
        uv = np.array([kp.pt for kp in kps], np.float32)
        return _pad_features(uv, desc, self.capacity, "orb")


def match_features(
    f1: Features, f2: Features, ratio: float = 0.75
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ratio-test match two feature sets on-device.

    Returns (uv1 (N,2), uv2 (N,2), mask (N,)) fixed-capacity correspondence
    arrays aligned to f1's capacity.
    """
    if f1.kind == "sift":
        idx2, ok = match_l2_ratio(
            jnp.asarray(f1.desc), jnp.asarray(f2.desc),
            jnp.asarray(f1.mask), jnp.asarray(f2.mask), ratio,
        )
    else:
        b1 = unpack_bits(jnp.asarray(f1.desc))
        b2 = unpack_bits(jnp.asarray(f2.desc))
        idx2, ok = match_hamming_ratio(
            b1, b2, jnp.asarray(f1.mask), jnp.asarray(f2.mask), ratio,
        )
    idx2 = np.asarray(idx2)
    ok = np.asarray(ok)
    uv1 = f1.uv
    uv2 = f2.uv[idx2]
    return uv1, uv2, ok


def dedupe_matches(uv1: np.ndarray, uv2: np.ndarray, mask: np.ndarray,
                   px_threshold: float = 2.0) -> np.ndarray:
    """Drop near-duplicate correspondences (reference O(n^2) loop at
    depth_enhanced_reconstruction.py:388-406, vectorized): keep the first of
    any pair whose endpoints both lie within px_threshold."""
    valid_idx = np.where(mask)[0]
    keep = mask.copy()
    if len(valid_idx) == 0:
        return keep
    a = uv1[valid_idx]
    b = uv2[valid_idx]
    # Quantize to a grid of px_threshold cells; duplicates share a cell.
    key = np.stack([
        np.floor(a[:, 0] / px_threshold), np.floor(a[:, 1] / px_threshold),
        np.floor(b[:, 0] / px_threshold), np.floor(b[:, 1] / px_threshold),
    ], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    dup = np.ones(len(valid_idx), bool)
    dup[first] = False
    keep[valid_idx[dup]] = False
    return keep
