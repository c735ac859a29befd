"""Canny XLA op vs the OpenCV oracle (F1 overlap — exact pixel equality is
not defined across implementations)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from txr.ops.canny import canny


def f1(a, b):
    a = a > 0
    b = b > 0
    tp = (a & b).sum()
    if tp == 0:
        return 0.0
    prec = tp / max(a.sum(), 1)
    rec = tp / max(b.sum(), 1)
    return 2 * prec * rec / (prec + rec)


def near_f1(a, b, r=1):
    """F1 with ±r pixel tolerance (edge positions legitimately jitter)."""
    a = (a > 0).astype(np.uint8)
    b = (b > 0).astype(np.uint8)
    kern = np.ones((2 * r + 1, 2 * r + 1), np.uint8)
    a_d = cv2.dilate(a, kern)
    b_d = cv2.dilate(b, kern)
    tp_a = (a & b_d).sum()
    tp_b = (b & a_d).sum()
    prec = tp_a / max(a.sum(), 1)
    rec = tp_b / max(b.sum(), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


@pytest.fixture()
def shapes_image(rng):
    img = np.full((240, 320), 80, np.uint8)
    cv2.rectangle(img, (40, 40), (140, 120), 200, -1)
    cv2.circle(img, (230, 150), 50, 30, -1)
    cv2.line(img, (10, 200), (310, 180), 160, 3)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)
    return img


class TestCanny:
    def test_matches_opencv_strong_edges(self, shapes_image):
        ref = cv2.Canny(shapes_image, 50, 150)
        got = np.asarray(canny(jnp.asarray(shapes_image), 50, 150))
        score = near_f1(got, ref, r=1)
        assert score > 0.8, f"near-F1 {score:.3f}"

    def test_thresholds_monotone(self, shapes_image):
        lo = np.asarray(canny(jnp.asarray(shapes_image), 20, 60))
        hi = np.asarray(canny(jnp.asarray(shapes_image), 100, 250))
        assert (lo > 0).sum() >= (hi > 0).sum()

    def test_blank_image_no_edges(self):
        img = np.full((64, 64), 120, np.uint8)
        assert (np.asarray(canny(jnp.asarray(img))) == 0).all()

    def test_hysteresis_connects_weak_chains(self):
        # A bar whose gradient fades below `high` along its length: the weak
        # section must be kept only because it connects to the strong end.
        img = np.full((64, 128), 50, np.uint8)
        ramp = np.linspace(220, 95, 96).astype(np.uint8)  # strong → weak edge
        img[28:36, 16:112] = ramp[None, :]
        out = np.asarray(canny(jnp.asarray(img), 30, 120))
        cols = np.where(out.any(axis=0))[0]
        assert len(cols) > 0
        # Edge response extends well into the weak section.
        assert cols.max() > 90
