"""On-device SIFT (txr.ops.sift) quality tests.

The contract that matters for reconstruction is two-view correspondence
quality: detect+describe two views related by a known affine map, ratio-test
match on device, and require a high inlier rate under the ground-truth
transform (reference substitutes cv2.SIFT — depth_to_reconstruction.py:133).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from txr.ops.sift import sift_features
from txr.ops.matching import match_l2_ratio

try:
    import cv2

    CV2 = True
except ImportError:  # pragma: no cover
    CV2 = False


def _texture(seed=1, h=320, w=400):
    rng = np.random.default_rng(seed)
    img = rng.random((h // 4, w // 5)).astype(np.float32)
    big = np.array(jax.image.resize(jnp.asarray(img), (h, w), "cubic"))
    big = (big - big.min()) / (big.max() - big.min())
    return (big * 255).astype(np.uint8)


def _warp(img, M):
    h, w = img.shape
    if CV2:
        return cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    # numpy fallback: inverse-map bilinear
    Minv = cv2_invert(M)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = Minv[0, 0] * xx + Minv[0, 1] * yy + Minv[0, 2]
    sy = Minv[1, 0] * xx + Minv[1, 1] * yy + Minv[1, 2]
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    v = ((1 - fy) * (1 - fx) * img[y0, x0] + (1 - fy) * fx * img[y0, x0 + 1]
         + fy * (1 - fx) * img[y0 + 1, x0] + fy * fx * img[y0 + 1, x0 + 1])
    inside = (sx >= 0) & (sx < w - 1) & (sy >= 0) & (sy < h - 1)
    return np.where(inside, v, 0).astype(np.uint8)


def cv2_invert(M):
    A = np.vstack([M, [0, 0, 1]]).astype(np.float64)
    return np.linalg.inv(A)[:2]


def _match_stats(img1, img2, M, capacity=1024, ratio=0.8):
    f1 = sift_features(img1, capacity=capacity)
    f2 = sift_features(img2, capacity=capacity)
    idx2, ok = match_l2_ratio(f1.desc, f2.desc, f1.mask, f2.mask, ratio)
    idx2, ok = np.asarray(idx2), np.asarray(ok)
    sel = ok & np.asarray(f1.mask)
    p1 = np.asarray(f1.uv)[sel]
    p2 = np.asarray(f2.uv)[idx2[sel]]
    proj = p1 @ M[:, :2].T + M[:, 2]
    err = np.linalg.norm(proj - p2, axis=1)
    return int(sel.sum()), int((err < 3.0).sum())


class TestDeviceSift:
    def test_identity_self_matches(self):
        img = _texture(1)
        n, inl = _match_stats(img, img.copy(), np.float32([[1, 0, 0], [0, 1, 0]]))
        assert n > 300
        assert inl / n > 0.99

    def test_translation(self):
        img = _texture(2)
        M = np.float32([[1, 0, 17], [0, 1, -9]])
        n, inl = _match_stats(img, _warp(img, M), M)
        assert n > 200
        assert inl / n > 0.9

    def test_rotation_30deg(self):
        img = _texture(3)
        c, s = np.cos(np.radians(30)), np.sin(np.radians(30))
        cx, cy = 200.0, 160.0
        M = np.float32([[c, s, cx - c * cx - s * cy],
                        [-s, c, cy + s * cx - c * cy]])
        n, inl = _match_stats(img, _warp(img, M), M)
        assert n > 150
        assert inl / n > 0.85

    def test_scale_0p8(self):
        img = _texture(4)
        cx, cy = 200.0, 160.0
        M = np.float32([[0.8, 0, 0.2 * cx], [0, 0.8, 0.2 * cy]])
        n, inl = _match_stats(img, _warp(img, M), M)
        assert n > 80
        assert inl / n > 0.85

    def test_fixed_capacity_contract(self):
        img = _texture(5, 128, 160)
        f = sift_features(img, capacity=256)
        assert f.uv.shape == (256, 2)
        assert f.desc.shape == (256, 128)
        assert f.mask.shape == (256,)
        m = np.asarray(f.mask)
        # valid rows are packed first (top_k descending, invalid = -1)
        assert not np.any(np.diff(m.astype(int)) > 0)
        uv = np.asarray(f.uv)[m]
        assert np.all(uv >= 0)
        assert np.all(uv[:, 0] < 160) and np.all(uv[:, 1] < 128)

    def test_descriptor_normalization(self):
        img = _texture(6, 160, 200)
        f = sift_features(img, capacity=256)
        d = np.asarray(f.desc)[np.asarray(f.mask)]
        assert d.min() >= 0.0 and d.max() <= 255.0
        nrm = np.linalg.norm(d, axis=1)
        assert np.all(nrm <= 512.01)
        assert np.all(nrm > 100.0)

    @pytest.mark.skipif(not CV2, reason="opencv not installed")
    def test_keypoints_near_cv2_keypoints(self):
        """Localization sanity: a decent fraction of cv2's strongest SIFT
        keypoints should have a device keypoint within 2.5 px."""
        img = _texture(7)
        sift = cv2.SIFT_create(nfeatures=500)
        kps = sift.detect(img, None)
        kps = sorted(kps, key=lambda k: -k.response)[:200]
        ours = sift_features(img, capacity=1024)
        uv = np.asarray(ours.uv)[np.asarray(ours.mask)]
        hit = 0
        for kp in kps:
            d = np.linalg.norm(uv - np.array(kp.pt), axis=1).min()
            hit += d < 2.5
        assert hit / len(kps) > 0.5

    def test_detector_facade_device_backend(self):
        from txr.geometry.features import SIFTDetector, match_features
        img = _texture(8)
        det = SIFTDetector(capacity=512, backend="device")
        f1 = det.detect(img)
        f2 = det.detect(np.roll(img, 11, axis=1))
        assert f1.count > 100
        uv1, uv2, ok = match_features(f1, f2, ratio=0.8)
        sel = ok & (uv1[:, 0] < img.shape[1] - 12)
        err = np.abs(uv1[sel][:, 0] + 11 - uv2[sel][:, 0])
        assert np.median(err) < 1.0

    def test_detect_batch_matches_scalar(self):
        """detect_batch (one lax.map program per 8 frames + padded tail)
        must reproduce per-frame detect() on the device backend: same
        kernels, same inputs — only the dispatch structure differs."""
        from txr.geometry.features import SIFTDetector
        det = SIFTDetector(capacity=512, backend="device")
        imgs = [_texture(8), np.roll(_texture(8), 11, axis=1),
                np.roll(_texture(8), 5, axis=0)]
        batched = det.detect_batch(imgs)
        assert len(batched) == len(imgs)
        for im, fb in zip(imgs, batched):
            fs = det.detect(im)
            # lax.map fuses differently than the scalar program, so float
            # ties in the top-k response ordering can swap/replace marginal
            # keypoints — compare as SETS: same count, and ~every batched
            # keypoint has a scalar keypoint at the same pixel whose
            # descriptor matches.
            assert fb.count == fs.count
            bu, su = fb.uv[fb.mask], fs.uv[fs.mask]
            bd, sd = fb.desc[fb.mask], fs.desc[fs.mask]
            d2 = ((bu[:, None, :] - su[None, :, :]) ** 2).sum(-1)
            nn = d2.argmin(1)
            pos_ok = d2[np.arange(len(bu)), nn] < 1e-3
            assert pos_ok.mean() > 0.99, pos_ok.mean()
            derr = np.abs(bd[pos_ok] - sd[nn[pos_ok]]).max(-1)
            assert (derr < 0.05 * np.abs(sd).max()).mean() > 0.98
