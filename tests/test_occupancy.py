"""Occupancy-grid projection tests (analytic scene).

The in-process streaming mode must emit rtabmap_slam's second product — the
2D occupancy grid (reference slam.launch.py:126-145) — next to the fused
PLY. Scene: a floor plane on y=0 (world y points down, so the floor is at
height 0) with a wall segment rising above it; a camera trajectory runs
along the corridor. Expectations are analytic: wall cells occupied, floor
cells under the trajectory free, cells beyond Grid/RangeMax unknown."""

import os

import numpy as np

from txr.fusion.occupancy import (FREE, OCCUPIED, UNKNOWN, occupancy_grid,
                                  write_occupancy_map)


def _scene():
    rng = np.random.default_rng(0)
    # Floor: x in [0, 4], z in [0, 4] at y=0 (height 0).
    fx = rng.uniform(0, 4, 4000)
    fz = rng.uniform(0, 4, 4000)
    floor = np.stack([fx, np.zeros_like(fx), fz], 1)
    # Wall: x = 2, z in [1, 3], height up to 1 m (y in [-1, -0.15]).
    wz = rng.uniform(1, 3, 2000)
    wy = -rng.uniform(0.15, 1.0, 2000)
    wall = np.stack([np.full_like(wz, 2.0), wy, wz], 1)
    # Far blob outside range_max of every camera center.
    far = np.stack([rng.uniform(20, 21, 200), np.zeros(200),
                    rng.uniform(20, 21, 200)], 1)
    xyz = np.concatenate([floor, wall, far], 0)
    centers = np.stack([np.full(5, 0.5), np.full(5, -0.5),
                        np.linspace(0.5, 3.5, 5)], 1)
    return xyz, centers


def _cell(grid, origin, cell, x, z):
    ci = int((x - origin[0]) / cell)
    cj = int((z - origin[1]) / cell)
    return grid[cj, ci]


def test_wall_occupied_floor_free_far_unknown():
    xyz, centers = _scene()
    cell = 0.1
    grid, origin = occupancy_grid(xyz, camera_centers=centers,
                                  cell_size=cell, range_max=5.0)
    # Wall column occupied along its z extent.
    assert _cell(grid, origin, cell, 2.0, 1.5) == OCCUPIED
    assert _cell(grid, origin, cell, 2.0, 2.5) == OCCUPIED
    # Floor away from the wall is free.
    assert _cell(grid, origin, cell, 0.5, 0.5) == FREE
    assert _cell(grid, origin, cell, 3.5, 3.5) == FREE
    # The far blob was range-cut: its cells never entered the grid extent
    # (grid covers only in-range points + footprints).
    rows, cols = grid.shape
    assert origin[0] + cols * cell < 20.0
    # There are unknown cells (corners the scene never observed).
    assert (grid == UNKNOWN).any()


def test_range_cutoff_drops_far_structure():
    xyz, centers = _scene()
    g_near, _ = occupancy_grid(xyz, camera_centers=centers, range_max=5.0)
    g_all, _ = occupancy_grid(xyz, camera_centers=centers, range_max=50.0)
    # With the 5 m cutoff the far blob is gone; without it the grid must
    # grow to cover x,z ≈ 20.
    assert g_all.shape[0] > g_near.shape[0]
    assert g_all.shape[1] > g_near.shape[1]


def test_footprint_marks_free():
    # No points at all: camera footprints alone must still be free space.
    centers = np.array([[0.0, 0.0, 0.0]])
    grid, origin = occupancy_grid(np.zeros((0, 3)), camera_centers=centers,
                                  cell_size=0.05, footprint_radius=0.3)
    assert _cell(grid, origin, 0.05, 0.0, 0.0) == FREE


def test_write_map_artifacts(tmp_path):
    xyz, centers = _scene()
    cell = 0.1
    grid, origin = occupancy_grid(xyz, camera_centers=centers,
                                  cell_size=cell, range_max=5.0)
    stem = str(tmp_path / "scene_grid")
    pgm = write_occupancy_map(stem, grid, origin, cell)
    assert os.path.exists(pgm) and os.path.exists(stem + ".yaml")
    with open(pgm, "rb") as f:
        magic = f.readline().strip()
        f.readline()  # comment
        dims = f.readline().split()
        maxval = f.readline().strip()
        data = f.read()
    assert magic == b"P5" and maxval == b"255"
    w, h = int(dims[0]), int(dims[1])
    assert (w, h) == (grid.shape[1], grid.shape[0])
    img = np.frombuffer(data, np.uint8).reshape(h, w)
    # Counts survive the image encoding round trip.
    assert (img == 0).sum() == (grid == OCCUPIED).sum()
    assert (img == 254).sum() == (grid == FREE).sum()
    yaml_txt = open(stem + ".yaml").read()
    assert "resolution: 0.1" in yaml_txt and "scene_grid.pgm" in yaml_txt


def test_streaming_save_grid(tmp_path):
    """save_grid end-to-end on a tiny hand-built map via the reconstructor."""
    from txr.core.intrinsics import CameraIntrinsics
    from txr.fusion.offset_map import offset_map_insert
    from txr.core.types import PointSet
    from txr.pipelines.streaming import StreamingReconstructor

    rec = StreamingReconstructor(
        intrinsics=CameraIntrinsics(fx=100, fy=100, cx=32, cy=32,
                                    width=64, height=64),
        depth_model=None, fused=False)
    xyz, centers = _scene()
    rec.map = offset_map_insert(
        rec.map, PointSet.from_numpy(xyz[:4096].astype(np.float32),
                                     capacity=4096))
    rec.poses = [(np.eye(3, dtype=np.float32),
                  (-c).astype(np.float32)) for c in centers]
    grid = rec.save_grid(str(tmp_path / "g"), cell_size=0.1)
    assert os.path.exists(str(tmp_path / "g.pgm"))
    assert (grid == OCCUPIED).any() and (grid == FREE).any()
