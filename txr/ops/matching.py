"""Descriptor matching as MXU matmuls.

Replaces the reference's FLANN kd-tree / brute-force Hamming matchers
(depth_enhanced_reconstruction.py:253-297, depth_to_reconstruction.py:163-181)
with all-pairs distance computation on the MXU:

- L2 (SIFT-style float descriptors): ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b — the
  cross term is one big matmul.
- Hamming (ORB-style binary descriptors): with bits unpacked to {0,1},
  H(a,b) = |a| + |b| - 2 a.b — also a matmul.

Lowe ratio test via top-2 (lax.top_k, k=2) on negated distances. Outputs are
fixed-capacity masked index pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

# Python float, NOT np.float32: np-scalar module constants become device
# ArrayImpls under jax 0.9 (globally cached), get captured as lifted
# consts in later traces, and the C++ jit fastpath then drops them on
# repeat same-structure calls ("Execution supplied N buffers but
# compiled program expected N+1"). A Python float stays a jaxpr literal.
_BIG = 3.0e38


@partial(jax.jit, static_argnames=())
@f32_dots
def match_l2_ratio(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    mask1: jnp.ndarray,
    mask2: jnp.ndarray,
    ratio: float = 0.75,
):
    """One-directional Lowe ratio-test matching for float descriptors
    (best desc2 candidate per desc1 row; NO cross-check, so several desc1
    rows may map to the same desc2 index — exactly the reference's FLANN
    knnMatch(k=2) + ratio semantics).

    Args:
      desc1: (N1, D), desc2: (N2, D) float32 descriptors (invalid rows
        arbitrary), mask1/mask2 validity.
      ratio: Lowe ratio (reference default 0.75).

    Returns:
      idx2: (N1,) best match in desc2 for each desc1 row,
      match_mask: (N1,) True where the ratio test passed and both rows valid.
    """
    sq1 = jnp.sum(desc1 * desc1, axis=-1)
    sq2 = jnp.sum(desc2 * desc2, axis=-1)
    d2 = (
        sq1[:, None]
        + sq2[None, :]
        - 2.0 * jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32)
    )
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(mask2[None, :], d2, _BIG)

    neg_top2, idx_top2 = jax.lax.top_k(-d2, 2)  # (N1, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    # Lowe ratio on distances (not squared): d1 < ratio * d2. A pair with no
    # valid second neighbor is dropped (OpenCV knnMatch(k=2) semantics) —
    # otherwise the sentinel second distance trivially passes the test.
    ok = jnp.sqrt(best) < ratio * jnp.sqrt(jnp.maximum(second, 1e-20))
    ok = ok & mask1 & (best < 1.0e37) & (second < 1.0e37)
    return idx_top2[:, 0], ok


@partial(jax.jit, static_argnames=())
@f32_dots
def match_hamming_ratio(
    bits1: jnp.ndarray,
    bits2: jnp.ndarray,
    mask1: jnp.ndarray,
    mask2: jnp.ndarray,
    ratio: float = 0.75,
):
    """Ratio-test matching for binary descriptors unpacked to {0,1} float.

    bits1: (N1, B), bits2: (N2, B) with entries in {0,1} (float32).
    Hamming distance via matmul: |a| + |b| - 2 a.b.
    """
    pop1 = jnp.sum(bits1, axis=-1)
    pop2 = jnp.sum(bits2, axis=-1)
    h = (
        pop1[:, None]
        + pop2[None, :]
        - 2.0 * jnp.dot(bits1, bits2.T, preferred_element_type=jnp.float32)
    )
    h = jnp.where(mask2[None, :], h, _BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-h, 2)
    best = -neg_top2[:, 0]
    second = -neg_top2[:, 1]
    ok = best < ratio * jnp.maximum(second, 1e-6)
    ok = ok & mask1 & (best < 1.0e37) & (second < 1.0e37)
    return idx_top2[:, 0], ok


def unpack_bits(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, B/8) uint8 packed descriptors → (N, B) float32 {0,1} bits."""
    bits = jnp.unpackbits(desc_u8.astype(jnp.uint8), axis=-1)
    return bits.astype(jnp.float32)
