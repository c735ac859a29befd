"""Native C++ runtime tests: build, PLY emit parity, packing, compaction."""

import numpy as np
import pytest

from txr._native import (
    get_lib,
    native_write_ply,
    native_pack_xyzrgb,
    native_compact,
)
from txr.io.ply import read_ply, write_ply


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="no C++ toolchain available")


@needs_native
class TestNativePLY:
    def test_roundtrip(self, tmp_path, rng):
        xyz = rng.normal(size=(1000, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
        p = str(tmp_path / "n.ply")
        assert native_write_ply(p, xyz, rgb)
        rx, rc = read_ply(p)
        np.testing.assert_allclose(rx, xyz, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(rc, np.clip(np.round(rgb * 255), 0, 255) / 255.0,
                                   atol=1 / 255.0)

    def test_matches_python_writer(self, tmp_path, rng):
        """Byte-identical output between the native and numpy writers."""
        xyz = rng.normal(size=(257, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (257, 3)).astype(np.float32)
        pn = str(tmp_path / "native.ply")
        pp = str(tmp_path / "python.ply")
        assert native_write_ply(pn, xyz, rgb)
        # Force the numpy path by writing via the fallback branch directly.
        from txr.io import ply as ply_mod
        import txr._native as nat
        orig = nat.native_write_ply
        try:
            nat_disabled = lambda *a, **k: False
            ply_mod.np  # touch
            import unittest.mock as mock
            with mock.patch("txr._native.native_write_ply", nat_disabled):
                write_ply(pp, xyz, rgb, binary=True)
        finally:
            pass
        assert open(pn, "rb").read() == open(pp, "rb").read()

    def test_no_color(self, tmp_path, rng):
        xyz = rng.normal(size=(10, 3)).astype(np.float32)
        p = str(tmp_path / "nc.ply")
        assert native_write_ply(p, xyz, None)
        rx, rc = read_ply(p)
        assert rc is None
        np.testing.assert_allclose(rx, xyz, rtol=1e-6)


@needs_native
class TestNativePack:
    def test_pack_matches_numpy(self, rng):
        from txr.ros2.publisher import pack_pointcloud2_data
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        got = native_pack_xyzrgb(xyz, rgb)
        exp = pack_pointcloud2_data(xyz, rgb)
        assert got == exp

    def test_pack_no_color(self, rng):
        xyz = rng.normal(size=(7, 3)).astype(np.float32)
        got = native_pack_xyzrgb(xyz, None)
        assert got == xyz.astype("<f4").tobytes()


@needs_native
class TestNativeCompact:
    def test_compact(self, rng):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        mask = rng.random(50) > 0.5
        out = native_compact(xyz, rgb, mask)
        assert out is not None
        ox, oc = out
        np.testing.assert_array_equal(ox, xyz[mask])
        np.testing.assert_array_equal(oc, rgb[mask])
