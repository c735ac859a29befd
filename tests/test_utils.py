"""Utility tests: chamfer distance, FPS counter, visualization stats."""

import numpy as np
import pytest

from txr.utils.chamfer import chamfer_distance
from txr.utils.profiling import FPSCounter
from txr.utils.visualize import print_cloud_stats


class TestChamfer:
    def test_identical_zero(self, rng):
        a = rng.normal(size=(500, 3)).astype(np.float32)
        assert chamfer_distance(a, a) == pytest.approx(0.0, abs=1e-6)

    def test_known_offset(self, rng):
        # b = a shifted by d along x → chamfer == d for well-separated points.
        a = (rng.uniform(0, 10, (200, 3)) * np.array([1, 1, 1])).astype(np.float32)
        a[:, 0] = np.arange(200) * 5.0  # spread out so NN is the twin point
        b = a + np.array([0.01, 0, 0], np.float32)
        assert chamfer_distance(a, b) == pytest.approx(0.01, rel=1e-3)

    def test_asymmetric_sets(self, rng):
        a = rng.normal(size=(300, 3)).astype(np.float32)
        b = a[:100]  # subset: a→b has positive distance, b→a zero
        d = chamfer_distance(a, b)
        assert d > 0
        assert chamfer_distance(b, a) == pytest.approx(d, rel=1e-5)  # symmetric

    def test_empty_inf(self):
        assert chamfer_distance(np.zeros((0, 3)), np.ones((5, 3))) == float("inf")

    def test_large_coordinates_precise(self, rng):
        """The two-pass formulation keeps precision at big coordinates where
        the |a|^2+|b|^2-2ab expansion cancels in f32."""
        a = rng.uniform(0, 1000, (300, 3)).astype(np.float32)
        b = a + np.array([0.01, 0, 0], np.float32)
        assert chamfer_distance(a, b) == pytest.approx(0.01, rel=5e-3)


class TestFPSCounter:
    def test_counts(self):
        c = FPSCounter(log_every=5, name="t")
        for _ in range(7):
            fps = c.tick()
        assert c.count == 7 and fps > 0
        assert "7 frames" in c.summary()


class TestVisualize:
    def test_stats_empty(self, capsys):
        print_cloud_stats(np.zeros((0, 3)))
        assert "empty" in capsys.readouterr().out

    def test_stats_bounds(self, capsys, rng):
        print_cloud_stats(rng.normal(size=(10, 3)))
        out = capsys.readouterr().out
        assert "X range" in out and "10 points" in out
