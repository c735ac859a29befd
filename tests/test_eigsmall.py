"""NumPy-oracle tests for the batched tiny Jacobi eigensolver (eigsmall)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from txr.ops.eigsmall import eigh_jacobi, smallest_eigvec, svd3


def _sym(rng, b, d):
    A = rng.normal(size=(b, d, d)).astype(np.float32)
    return A @ A.transpose(0, 2, 1)  # PSD, like the A^T A normals


class TestEighJacobi:
    @pytest.mark.parametrize("d", [3, 4, 9])
    def test_diagonalizes(self, rng, d):
        M = _sym(rng, 64, d)
        w, V = jax.jit(eigh_jacobi)(jnp.asarray(M))
        w, V = np.asarray(w), np.asarray(V)
        # M V = V diag(w), V orthogonal
        np.testing.assert_allclose(M @ V, V * w[:, None, :],
                                   atol=2e-3 * np.abs(M).max())
        eye = np.broadcast_to(np.eye(d, dtype=np.float32), V.shape)
        np.testing.assert_allclose(V.transpose(0, 2, 1) @ V, eye, atol=1e-4)

    def test_exact_diagonal_tie(self):
        """ADVICE r3 (high): a_pp == a_qq exactly with a_pq != 0 made
        sign(tau) = 0 skip the rotation every sweep — eigh_jacobi returned
        the (wrong) diagonal unchanged. The tie must rotate at 45 degrees."""
        M = np.array([[2.0, 0.9, 0.0],
                      [0.9, 2.0, 0.0],
                      [0.0, 0.0, 5.0]], np.float32)[None]
        w, V = jax.jit(eigh_jacobi)(jnp.asarray(M))
        got = np.sort(np.asarray(w)[0])
        np.testing.assert_allclose(got, [1.1, 2.9, 5.0], atol=1e-5)
        np.testing.assert_allclose(M[0] @ np.asarray(V)[0],
                                   np.asarray(V)[0] * np.asarray(w)[0][None],
                                   atol=1e-4)

    @pytest.mark.parametrize("d", [4, 9])
    def test_eigenvalues_match_numpy(self, rng, d):
        M = _sym(rng, 32, d)
        w, _ = jax.jit(eigh_jacobi)(jnp.asarray(M))
        got = np.sort(np.asarray(w), axis=-1)
        want = np.linalg.eigvalsh(M)
        np.testing.assert_allclose(got, want, rtol=2e-4,
                                   atol=2e-4 * np.abs(want).max())


class TestSmallestEigvec:
    @pytest.mark.parametrize("d", [4, 9])
    def test_matches_numpy_nullvector(self, rng, d):
        # Rank-deficient normals, like an exact-data design matrix.
        B = rng.normal(size=(48, d - 1, d)).astype(np.float32)
        M = np.einsum("bkd,bke->bde", B, B)
        v = np.asarray(jax.jit(smallest_eigvec)(jnp.asarray(M)))
        # v spans the true null space: residual M v ~ 0 and unit norm.
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)
        res = np.linalg.norm(np.einsum("bde,be->bd", M, v), axis=-1)
        scale = np.abs(M).max(axis=(1, 2))
        assert np.all(res <= 5e-4 * scale)


class TestSVD3:
    def test_reconstructs_and_matches_numpy(self, rng):
        F = rng.normal(size=(64, 3, 3)).astype(np.float32)
        U, s, Vt = jax.jit(svd3)(jnp.asarray(F))
        U, s, Vt = map(np.asarray, (U, s, Vt))
        np.testing.assert_allclose(
            U * s[:, None, :] @ Vt, F, atol=5e-4 * np.abs(F).max())
        want = np.linalg.svd(F, compute_uv=False)
        np.testing.assert_allclose(s, want, rtol=1e-3,
                                   atol=1e-3 * want.max())

    def test_essential_projection_rank2(self, rng):
        """U diag(1,1,0) Vt from svd3 equals the numpy-SVD projection."""
        F = rng.normal(size=(32, 3, 3)).astype(np.float32)
        U, s, Vt = jax.jit(svd3)(jnp.asarray(F))
        E = np.asarray(U @ np.diag([1.0, 1.0, 0.0]).astype(np.float32) @ Vt)
        Un, sn, Vtn = np.linalg.svd(F)
        En = Un @ np.diag([1.0, 1.0, 0.0]) @ Vtn
        # Projection is unique up to global sign when s1 != s2 generically.
        sgn = np.sign(np.sum(E * En, axis=(1, 2)))[:, None, None]
        np.testing.assert_allclose(E * sgn, En, atol=2e-3)
