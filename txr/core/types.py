"""Typed array containers.

The central XLA-shape problem of this domain is dynamic point counts: every
stage (validity masking, voxel merge, RANSAC inlier sets) produces a
data-dependent number of points, which XLA cannot express. `PointSet` is the
framework-wide answer: a fixed-capacity buffer plus a validity mask. All
device ops consume and produce PointSets; compaction to dense numpy arrays
happens only at host boundaries (PLY writing, visualization).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class PointSet:
    """Fixed-capacity masked point cloud.

    Attributes:
      xyz:   (N, 3) float32 positions. Invalid slots hold zeros.
      rgb:   (N, 3) float32 colors in [0, 1]. Invalid slots hold zeros.
      mask:  (N,) bool validity.
    """

    def __init__(self, xyz: jnp.ndarray, rgb: jnp.ndarray, mask: jnp.ndarray):
        self.xyz = xyz
        self.rgb = rgb
        self.mask = mask

    # -- pytree protocol ---------------------------------------------------

    def tree_flatten(self):
        return (self.xyz, self.rgb, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors ------------------------------------------------------

    @classmethod
    def empty(cls, capacity: int) -> "PointSet":
        return cls(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            rgb=jnp.zeros((capacity, 3), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
        )

    @classmethod
    def from_numpy(cls, xyz: np.ndarray, rgb: Optional[np.ndarray] = None,
                   capacity: Optional[int] = None) -> "PointSet":
        """Build a PointSet from dense host arrays, optionally padding to
        `capacity` so repeated calls share one compiled shape."""
        n = xyz.shape[0]
        cap = capacity if capacity is not None else n
        if rgb is None:
            rgb = np.zeros_like(xyz)
        out_xyz = np.zeros((cap, 3), np.float32)
        out_rgb = np.zeros((cap, 3), np.float32)
        out_mask = np.zeros((cap,), bool)
        m = min(n, cap)
        out_xyz[:m] = xyz[:m]
        out_rgb[:m] = rgb[:m]
        out_mask[:m] = True
        return cls(jnp.asarray(out_xyz), jnp.asarray(out_rgb), jnp.asarray(out_mask))

    # -- properties --------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    # -- host-boundary compaction -------------------------------------------

    def to_numpy(self):
        """Compact to dense (n, 3) float arrays on host. Not jittable.
        Uses the C++ compactor (txr._native.txr_compact_points) when a
        toolchain is available; numpy boolean indexing otherwise (byte
        parity pinned in tests/test_native.py)."""
        xyz = np.asarray(self.xyz)
        rgb = np.asarray(self.rgb)
        mask = np.asarray(self.mask)
        if xyz.dtype == np.float32 and rgb.dtype == np.float32:
            from txr._native import native_compact

            out = native_compact(xyz, rgb, mask)
            if out is not None:
                return out
        return xyz[mask], rgb[mask]

    def __repr__(self):
        return f"PointSet(capacity={self.capacity})"


def concatenate(sets) -> PointSet:
    """Concatenate PointSets along the capacity axis (jittable)."""
    return PointSet(
        xyz=jnp.concatenate([s.xyz for s in sets], axis=0),
        rgb=jnp.concatenate([s.rgb for s in sets], axis=0),
        mask=jnp.concatenate([s.mask for s in sets], axis=0),
    )
