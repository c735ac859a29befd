"""On-device line segment detection (txr.ops.lsd) tests.

Synthetic scenes with analytic line positions; where cv2 is available the
device detector is compared against cv2 LSD (the reference's substrate —
depth_enhanced_reconstruction.py:199-201) for recall on the same scene.
"""

import numpy as np
import pytest

from txr.ops.lsd import lsd_lines

try:
    import cv2

    CV2 = True
except ImportError:  # pragma: no cover
    CV2 = False


def _scene():
    img = np.full((320, 400), 128, np.uint8)
    cv2.line(img, (50, 60), (350, 90), 30, 2, cv2.LINE_AA)
    cv2.line(img, (80, 250), (120, 40), 220, 3, cv2.LINE_AA)
    cv2.rectangle(img, (200, 150), (330, 260), 200, -1)
    return cv2.GaussianBlur(img, (3, 3), 0.8)


def _seg_dist(a, b):
    """Symmetric endpoint distance, endpoint order-invariant."""
    d1 = max(np.hypot(*(a[:2] - b[:2])), np.hypot(*(a[2:] - b[2:])))
    d2 = max(np.hypot(*(a[:2] - b[2:])), np.hypot(*(a[2:] - b[:2])))
    return min(d1, d2)


@pytest.mark.skipif(not CV2, reason="scene drawing needs cv2")
class TestDeviceLsd:
    def test_finds_all_drawn_structures(self):
        out = lsd_lines(_scene(), capacity=64)
        L = np.asarray(out.lines)[np.asarray(out.mask)]
        # Detectors legitimately split segments where the two drawn lines
        # cross (cv2 LSD does too), so assert COVERAGE: >=70% of each truth
        # line's sample points lie within 5px of some detected segment.
        truth = [
            (50, 60, 350, 90),     # shallow line (crossed near x~110)
            (80, 250, 120, 40),    # steep line
            (200, 150, 330, 150),  # rect top
            (200, 260, 330, 260),  # rect bottom
            (200, 150, 200, 260),  # rect left
            (330, 150, 330, 260),  # rect right
        ]

        def pt_seg_dist(p, seg):
            a, b = seg[:2], seg[2:]
            ab = b - a
            t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-9), 0, 1)
            return np.hypot(*(p - (a + t * ab)))

        for tl in truth:
            tl = np.array(tl, np.float32)
            samples = np.linspace(tl[:2], tl[2:], 40)
            cov = np.mean([min(pt_seg_dist(p, seg) for seg in L) < 5.0
                           for p in samples])
            assert cov >= 0.7, f"line {tl} coverage {cov:.2f}"

    def test_no_lines_on_flat_image(self):
        img = np.full((160, 200), 90, np.uint8)
        out = lsd_lines(img, capacity=32)
        assert int(np.asarray(out.mask).sum()) == 0

    def test_perpendicular_edges_not_merged(self):
        """A rectangle's perpendicular edges must stay separate components
        (regression: pairwise-only angle gating chained around corners)."""
        img = np.full((200, 200), 100, np.uint8)
        cv2.rectangle(img, (50, 50), (150, 150), 220, -1)
        img = cv2.GaussianBlur(img, (3, 3), 0.8)
        out = lsd_lines(img, capacity=32)
        L = np.asarray(out.lines)[np.asarray(out.mask)]
        assert len(L) >= 4
        for seg in L:
            dx, dy = abs(seg[2] - seg[0]), abs(seg[3] - seg[1])
            # every detection is close to axis-aligned, not a merged L-shape
            assert min(dx, dy) < 0.15 * max(dx, dy) + 4.0

    def test_recall_vs_cv2(self):
        """>=70% of cv2 LSD's long segments have a device match within 10px."""
        scene = _scene()
        ref = cv2.createLineSegmentDetector(cv2.LSD_REFINE_STD).detect(scene)[0]
        ref = ref.reshape(-1, 4)
        lens = np.hypot(ref[:, 2] - ref[:, 0], ref[:, 3] - ref[:, 1])
        ref = ref[lens > 40]
        out = lsd_lines(scene, capacity=64)
        L = np.asarray(out.lines)[np.asarray(out.mask)]
        hit = sum(min(_seg_dist(r, seg) for seg in L) < 10.0 for r in ref)
        assert hit / len(ref) >= 0.7

    def test_fixed_capacity_contract(self):
        out = lsd_lines(_scene(), capacity=8)
        assert out.lines.shape == (8, 4)
        assert out.mask.shape == (8,)
        m = np.asarray(out.mask)
        # longest-first ordering, valid rows packed first
        assert not np.any(np.diff(m.astype(int)) > 0)
        L = np.asarray(out.lines)
        lens = np.hypot(L[:, 2] - L[:, 0], L[:, 3] - L[:, 1])[m]
        assert np.all(np.diff(lens) <= 1e-3)

    def test_hybrid_detector_device_backend(self):
        from txr.geometry.hybrid import HybridFeatureDetector
        det = HybridFeatureDetector(verbose=False, backend="device",
                                    sift_capacity=512, orb_capacity=512)
        f = det.detect(_scene())
        assert f.lines is not None and len(f.lines) >= 6
        assert f.edges is not None and (f.edges > 0).sum() > 100
        assert f.sift is not None and f.sift.count > 0
        assert f.orb is not None and f.orb.count > 0
