"""CLAHE XLA op vs the OpenCV oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from txr.ops.clahe import clahe


def make_low_contrast(rng, h=240, w=320):
    """Dim gradient + faint texture — the textureless-tunnel regime."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 90 + 30 * (xx / w) + 5 * np.sin(yy / 7.0)
    base += rng.normal(0, 2.0, (h, w))
    return np.clip(base, 0, 255).astype(np.uint8)


class TestCLAHE:
    def test_matches_opencv(self, rng):
        img = make_low_contrast(rng)
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        got = np.asarray(clahe(jnp.asarray(img), clip_limit=2.0, tiles=8))
        diff = np.abs(got.astype(int) - ref.astype(int))
        # Even redistribution differs from OpenCV's iterative residual pass
        # by at most a few gray levels on a few pixels.
        assert np.mean(diff) < 1.5, f"mean diff {np.mean(diff)}"
        assert np.percentile(diff, 99) <= 4

    def test_expands_contrast(self, rng):
        img = make_low_contrast(rng)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.std() > img.std() * 1.3  # contrast actually stretched
        # (cv2's own CLAHE gives the same ~1.4x on this scene)

    def test_uniform_image_stable(self):
        img = np.full((160, 160), 128, np.uint8)
        out = np.asarray(clahe(jnp.asarray(img)))
        # A constant image maps to a constant (value may shift by the CDF).
        assert out.std() < 1.0

    def test_dtype_and_shape(self, rng):
        img = rng.integers(0, 255, (160, 240), dtype=np.uint8)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.shape == img.shape and out.dtype == np.uint8


class TestNonDivisibleShapes:
    def test_non_multiple_of_tiles(self, rng):
        """H/W not divisible by tiles: the op pads with edge replication and
        crops back (review r2 — previously the remainder rows/cols were
        dropped from histograms but still interpolated, and h<tiles
        divided by zero)."""
        img = make_low_contrast(rng, h=237, w=317)
        ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        got = np.asarray(clahe(jnp.asarray(img), clip_limit=2.0, tiles=8))
        assert got.shape == img.shape
        diff = np.abs(got.astype(int) - ref.astype(int))
        # OpenCV pads internally too, but distributes the remainder across
        # tiles rather than replicating at the far edge; allow a slightly
        # looser band than the divisible case.
        assert np.mean(diff) < 3.0, f"mean diff {np.mean(diff)}"

    def test_tiny_image_no_nan(self, rng):
        img = rng.integers(0, 255, (5, 6), dtype=np.uint8)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.shape == (5, 6) and out.dtype == np.uint8
