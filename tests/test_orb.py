"""On-device ORB (txr.ops.orb) quality tests.

Same contract as test_sift: two views under a known affine map must yield a
high ratio-test inlier rate (reference substitutes cv2.ORB —
depth_enhanced_reconstruction.py:197-199).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from txr.ops.orb import orb_features
from txr.ops.matching import match_hamming_ratio, unpack_bits

from tests.test_sift import _texture, _warp  # shared synthetic scene helpers

try:
    import cv2

    CV2 = True
except ImportError:  # pragma: no cover
    CV2 = False


def _match_stats(img1, img2, M, capacity=1024, ratio=0.8):
    f1 = orb_features(img1, capacity=capacity)
    f2 = orb_features(img2, capacity=capacity)
    idx2, ok = match_hamming_ratio(unpack_bits(f1.desc), unpack_bits(f2.desc),
                                   f1.mask, f2.mask, ratio)
    idx2, ok = np.asarray(idx2), np.asarray(ok)
    sel = ok & np.asarray(f1.mask)
    p1 = np.asarray(f1.uv)[sel]
    p2 = np.asarray(f2.uv)[idx2[sel]]
    proj = p1 @ M[:, :2].T + M[:, 2]
    err = np.linalg.norm(proj - p2, axis=1)
    return int(sel.sum()), int((err < 3.0).sum())


class TestDeviceOrb:
    def test_identity_self_matches(self):
        img = _texture(11)
        n, inl = _match_stats(img, img.copy(), np.float32([[1, 0, 0], [0, 1, 0]]))
        assert n > 300
        assert inl / n > 0.99

    def test_translation(self):
        img = _texture(12)
        M = np.float32([[1, 0, 23], [0, 1, -7]])
        n, inl = _match_stats(img, _warp(img, M), M)
        assert n > 150
        assert inl / n > 0.85

    def test_rotation_30deg(self):
        img = _texture(13)
        c, s = np.cos(np.radians(30)), np.sin(np.radians(30))
        cx, cy = 200.0, 160.0
        M = np.float32([[c, s, cx - c * cx - s * cy],
                        [-s, c, cy + s * cx - c * cy]])
        n, inl = _match_stats(img, _warp(img, M), M)
        assert n > 80
        assert inl / n > 0.7

    def test_fixed_capacity_and_packing(self):
        img = _texture(14, 160, 200)
        f = orb_features(img, capacity=512)
        assert f.uv.shape == (512, 2)
        assert f.desc.shape == (512, 32)
        assert f.desc.dtype == jnp.uint8
        bits = np.asarray(unpack_bits(f.desc))
        assert bits.shape == (512, 256)
        assert set(np.unique(bits)).issubset({0.0, 1.0})
        m = np.asarray(f.mask)
        uv = np.asarray(f.uv)[m]
        assert np.all(uv >= 0)
        assert np.all(uv[:, 0] < 200) and np.all(uv[:, 1] < 160)

    def test_orientation_consistency_under_rotation(self):
        """Keypoint angles should track image rotation (mod 360)."""
        img = _texture(15)
        ang = 40.0
        if not CV2:
            pytest.skip("warp helper needs cv2 for rotation")
        M = cv2.getRotationMatrix2D((200, 160), ang, 1.0).astype(np.float32)
        f1 = orb_features(img, capacity=512)
        f2 = orb_features(_warp(img, M), capacity=512)
        idx2, ok = match_hamming_ratio(unpack_bits(f1.desc), unpack_bits(f2.desc),
                                       f1.mask, f2.mask, 0.8)
        sel = np.asarray(ok) & np.asarray(f1.mask)
        a1 = np.asarray(f1.angle)[sel]
        a2 = np.asarray(f2.angle)[np.asarray(idx2)[sel]]
        d = np.mod(a1 - a2 - ang + 180, 360) - 180
        assert np.abs(np.median(d)) < 10.0

    def test_detector_facade_device_backend(self):
        from txr.geometry.features import ORBDetector, match_features
        img = _texture(16)
        det = ORBDetector(capacity=512, backend="device")
        f1 = det.detect(img)
        f2 = det.detect(np.roll(img, 9, axis=1))
        assert f1.count > 100
        uv1, uv2, ok = match_features(f1, f2, ratio=0.8)
        sel = ok & (uv1[:, 0] < img.shape[1] - 10)
        err = np.abs(uv1[sel][:, 0] + 9 - uv2[sel][:, 0])
        assert np.median(err) < 1.5
