"""VLAD-sketch appearance gating for loop closure (txr/geometry/appearance).

Models rtabmap's bag-of-words retrieval role (reference slam.launch.py:
126-145): candidates come from appearance similarity, geometry verifies.
"""

import numpy as np

from txr.geometry.appearance import (
    N_ANCHORS,
    appearance_scores,
    appearance_sketch,
)


def _fake_desc(rng, n, dim=128):
    d = rng.random((n, dim)).astype(np.float32)
    return d


class TestAppearanceSketch:
    def test_unit_norm_and_deterministic(self, rng):
        desc = _fake_desc(rng, 200)
        mask = np.ones(200, bool)
        s1 = appearance_sketch(desc, mask)
        s2 = appearance_sketch(desc, mask)
        assert s1.shape == (N_ANCHORS * 128,)
        np.testing.assert_array_equal(s1, s2)
        assert abs(np.linalg.norm(s1) - 1.0) < 1e-5

    def test_empty_mask_scores_zero(self, rng):
        desc = _fake_desc(rng, 64)
        z = appearance_sketch(desc, np.zeros(64, bool))
        assert np.all(z == 0)
        other = appearance_sketch(desc, np.ones(64, bool))
        assert appearance_scores(np.stack([z]), other)[0] == 0.0

    def test_mask_respected(self, rng):
        """Padding rows (mask=False) must not influence the sketch."""
        desc = _fake_desc(rng, 100)
        mask = np.zeros(100, bool)
        mask[:40] = True
        s_padded = appearance_sketch(desc, mask)
        s_dense = appearance_sketch(desc[:40], np.ones(40, bool))
        np.testing.assert_allclose(s_padded, s_dense, atol=1e-6)

    def test_same_scene_beats_different(self, rng):
        """A re-observation (same scene's descriptors + noise) must outrank
        an unrelated scene — the property candidate gating rests on.

        Scenes are modeled as clustered descriptor sets (each scene samples
        its own visual words): that is where VLAD's discrimination comes
        from. Unstructured i.i.d. descriptor sets all converge to the
        distribution's expected sketch and are NOT separable — real SIFT
        descriptors are cluster-structured, not i.i.d."""
        def scene(n_words=24, n=300, dim=128):
            words = rng.standard_normal((n_words, dim)).astype(np.float32)
            idx = rng.integers(0, n_words, n)
            noise = rng.standard_normal((n, dim)).astype(np.float32)
            return words[idx] + 0.1 * noise

        base = scene()
        noisy = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
        other = scene()
        mask = np.ones(300, bool)
        q = appearance_sketch(noisy, mask)
        sketches = np.stack([
            appearance_sketch(base, mask),
            appearance_sketch(other, mask),
        ])
        scores = appearance_scores(sketches, q)
        assert scores[0] > scores[1] + 0.2

    def test_scores_shape_empty(self):
        assert appearance_scores(np.zeros((0, 16)), np.zeros(16)).shape == (0,)


class TestDeviceSketchParity:
    """appearance_sketch_jax is the device path the fused streaming loop uses
    (keyframe descriptors stay in HBM; only the sketch crosses D2H). It must
    agree with the host oracle to float tolerance."""

    def test_matches_host(self, rng):
        import jax

        from txr.geometry.appearance import appearance_sketch_jax

        desc = _fake_desc(rng, 256)
        mask = np.zeros(256, bool)
        mask[:180] = True
        host = appearance_sketch(desc, mask)
        dev = np.asarray(jax.jit(appearance_sketch_jax)(
            np.asarray(desc), np.asarray(mask)))
        np.testing.assert_allclose(dev, host, atol=2e-5)

    def test_all_invalid_is_zero(self, rng):
        import jax

        from txr.geometry.appearance import appearance_sketch_jax

        desc = _fake_desc(rng, 64)
        dev = np.asarray(jax.jit(appearance_sketch_jax)(
            np.asarray(desc), np.zeros(64, bool)))
        assert np.all(dev == 0)
