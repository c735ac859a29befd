"""Descriptor matching and feature detection tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from txr.ops.matching import match_l2_ratio, match_hamming_ratio, unpack_bits


class TestL2Matching:
    def test_identity_match(self, rng):
        d = rng.normal(size=(64, 128)).astype(np.float32)
        idx, ok = match_l2_ratio(jnp.asarray(d), jnp.asarray(d),
                                 jnp.ones(64, bool), jnp.ones(64, bool), ratio=0.75)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(64))
        assert np.asarray(ok).all()  # perfect matches pass any ratio

    def test_ratio_rejects_ambiguous(self, rng):
        # Two identical database rows: best and second-best tie → ratio fails.
        q = rng.normal(size=(1, 32)).astype(np.float32)
        db = np.concatenate([q + 0.01, q + 0.011, rng.normal(size=(6, 32)).astype(np.float32)])
        idx, ok = match_l2_ratio(jnp.asarray(q), jnp.asarray(db),
                                 jnp.ones(1, bool), jnp.ones(8, bool), 0.75)
        assert not bool(np.asarray(ok)[0])

    def test_mask_excludes_rows(self, rng):
        q = rng.normal(size=(4, 16)).astype(np.float32)
        db = np.concatenate([q, rng.normal(size=(4, 16)).astype(np.float32)])
        m2 = np.zeros(8, bool)
        m2[4:] = True  # exact copies masked out
        idx, ok = match_l2_ratio(jnp.asarray(q), jnp.asarray(db),
                                 jnp.ones(4, bool), jnp.asarray(m2), 0.99)
        assert (np.asarray(idx) >= 4).all()

    def test_oracle_nn(self, rng):
        q = rng.normal(size=(32, 64)).astype(np.float32)
        db = rng.normal(size=(48, 64)).astype(np.float32)
        idx, _ = match_l2_ratio(jnp.asarray(q), jnp.asarray(db),
                                jnp.ones(32, bool), jnp.ones(48, bool), 0.99)
        d = np.linalg.norm(q[:, None] - db[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))


class TestHamming:
    def test_unpack_and_match(self, rng):
        packed = rng.integers(0, 256, (16, 32), dtype=np.uint8)
        bits = unpack_bits(jnp.asarray(packed))
        assert bits.shape == (16, 256)
        # Hamming distance to self is 0 → identity matching.
        idx, ok = match_hamming_ratio(bits, bits, jnp.ones(16, bool), jnp.ones(16, bool), 0.9)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(16))

    def test_hamming_oracle(self, rng):
        a = rng.integers(0, 256, (8, 4), dtype=np.uint8)
        b = rng.integers(0, 256, (12, 4), dtype=np.uint8)
        ba, bb = unpack_bits(jnp.asarray(a)), unpack_bits(jnp.asarray(b))
        idx, _ = match_hamming_ratio(ba, bb, jnp.ones(8, bool), jnp.ones(12, bool), 0.999)
        ham = (np.unpackbits(a, axis=1)[:, None] != np.unpackbits(b, axis=1)[None]).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), ham.argmin(axis=1))


class TestDetectors:
    @pytest.fixture(scope="class")
    def test_image(self):
        import cv2
        rng = np.random.default_rng(3)
        img = np.full((240, 320, 3), 90, np.uint8)
        for _ in range(40):  # draw texture so SIFT finds something
            c = rng.integers(0, 255, 3).tolist()
            p1 = (int(rng.integers(0, 320)), int(rng.integers(0, 240)))
            p2 = (int(rng.integers(0, 320)), int(rng.integers(0, 240)))
            cv2.line(img, p1, p2, c, 2)
            cv2.circle(img, p1, int(rng.integers(3, 20)), c, -1)
        return img

    def test_sift_detect(self, test_image):
        from txr.geometry.features import SIFTDetector
        det = SIFTDetector(capacity=4096)
        f = det.detect(test_image)
        assert f.count > 50
        assert f.uv.shape == (4096, 2) and f.desc.shape == (4096, 128)
        assert f.mask[: f.count].all() and not f.mask[f.count:].any()

    def test_orb_detect(self, test_image):
        from txr.geometry.features import ORBDetector
        det = ORBDetector(capacity=2048)
        f = det.detect(test_image)
        assert f.count > 50
        assert f.desc.dtype == np.uint8

    def test_match_shifted_image(self, test_image):
        import cv2
        from txr.geometry.features import SIFTDetector, match_features
        det = SIFTDetector(capacity=4096)
        M = np.float32([[1, 0, 15], [0, 1, 7]])
        shifted = cv2.warpAffine(test_image, M, (320, 240))
        f1 = det.detect(test_image)
        f2 = det.detect(shifted)
        uv1, uv2, ok = match_features(f1, f2, ratio=0.75)
        assert ok.sum() > 30
        delta = uv2[ok] - uv1[ok]
        # The dominant displacement must be the applied shift.
        med = np.median(delta, axis=0)
        np.testing.assert_allclose(med, [15, 7], atol=1.0)

    def test_empty_image(self):
        from txr.geometry.features import SIFTDetector
        det = SIFTDetector(capacity=128)
        f = det.detect(np.zeros((64, 64, 3), np.uint8))
        assert f.count == 0 and f.uv.shape == (128, 2)

    def test_dedupe(self):
        from txr.geometry.features import dedupe_matches
        uv1 = np.array([[10, 10], [10.5, 10.4], [50, 50]], np.float32)
        uv2 = np.array([[20, 20], [20.3, 20.1], [80, 80]], np.float32)
        mask = np.ones(3, bool)
        keep = dedupe_matches(uv1, uv2, mask, px_threshold=2.0)
        assert keep.sum() == 2
