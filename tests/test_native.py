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
        from txr.ros2.publisher import pack_pointcloud2_numpy
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        got = native_pack_xyzrgb(xyz, rgb)
        exp = pack_pointcloud2_numpy(xyz, rgb)
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


class TestNativeJPEGDecode:
    """C++ host decode stage (SURVEY §2.8 item 15): byte parity with cv2."""

    def _jpeg_bytes(self, rng):
        import cv2

        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        return enc.tobytes()

    def test_byte_parity_with_cv2(self, rng):
        import cv2
        from txr._native import native_decode_jpeg, get_lib

        lib = get_lib()
        if lib is None or not lib.txr_has_jpeg():
            pytest.skip("native jpeg decoder unavailable")
        data = self._jpeg_bytes(rng)
        got = native_decode_jpeg(data)
        ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(got, ref)

    def test_reference_dataset_parity(self):
        import glob
        import cv2
        from txr._native import native_decode_jpeg, get_lib

        lib = get_lib()
        if lib is None or not lib.txr_has_jpeg():
            pytest.skip("native jpeg decoder unavailable")
        files = sorted(glob.glob(
            "/root/reference/input_folder/exp_tunnel_set1_images_2_fps/*.jpg"))
        if not files:
            pytest.skip("reference dataset not mounted")
        for f in files[:3]:
            data = open(f, "rb").read()
            got = native_decode_jpeg(data)
            ref = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            np.testing.assert_array_equal(got, ref)

    def test_garbage_returns_none(self):
        from txr._native import native_decode_jpeg, get_lib

        lib = get_lib()
        if lib is None or not lib.txr_has_jpeg():
            pytest.skip("native jpeg decoder unavailable")
        assert native_decode_jpeg(b"not a jpeg at all") is None

    def test_folder_source_uses_native(self, tmp_path, rng):
        """FolderSource still yields identical frames through the native
        decode path."""
        import cv2
        from txr.io.sources import FolderSource

        img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "a.jpg"), img)
        src = FolderSource(str(tmp_path))
        got, ts, name = next(src)
        ref = cv2.imread(str(tmp_path / "a.jpg"))
        np.testing.assert_array_equal(got, ref)


class TestNativePNG16:
    """The uint16-mm PNG is the depth artifact contract
    (reference depth_processor.py:905-921 writes it,
    depth_to_reconstruction.py:85-92 reads it back); the native libpng
    codec must be pixel-exact against cv2 in both directions."""

    def _need(self):
        from txr._native import get_lib

        lib = get_lib()
        if lib is None or not lib.txr_has_png():
            pytest.skip("native png codec unavailable")

    def test_roundtrip_and_cv2_parity(self, rng):
        cv2 = pytest.importorskip("cv2")
        self._need()
        from txr._native import native_decode_png16, native_encode_png16

        img = (rng.random((37, 53)) * 65535).astype(np.uint16)
        data = native_encode_png16(img)
        np.testing.assert_array_equal(native_decode_png16(data), img)
        # cv2 decodes our stream pixel-exactly
        cvdec = cv2.imdecode(np.frombuffer(data, np.uint8),
                             cv2.IMREAD_ANYDEPTH)
        assert cvdec.dtype == np.uint16
        np.testing.assert_array_equal(cvdec, img)
        # we decode cv2's stream pixel-exactly
        ok, cvdata = cv2.imencode(".png", img)
        assert ok
        np.testing.assert_array_equal(
            native_decode_png16(cvdata.tobytes()), img)

    def test_rejects_non_gray16(self, rng):
        cv2 = pytest.importorskip("cv2")
        self._need()
        from txr._native import native_decode_png16

        rgb8 = rng.integers(0, 255, (8, 9, 3), dtype=np.uint8)
        ok, data = cv2.imencode(".png", rgb8)
        assert ok
        assert native_decode_png16(data.tobytes()) is None
        assert native_decode_png16(b"not a png") is None

    def test_depth_io_routes_native(self, tmp_path, rng, monkeypatch):
        """save/load_depth round-trips mm quantization through the native
        codec without cv2 (tripwire: cv2.imwrite/imread must not be hit)."""
        self._need()
        import txr.io.depth_io as depth_io

        if depth_io.CV2_AVAILABLE:
            def _boom(*a, **k):
                raise AssertionError("png16 path must not call cv2")

            monkeypatch.setattr(depth_io.cv2, "imwrite", _boom)
            monkeypatch.setattr(depth_io.cv2, "imread", _boom)
        depth = rng.random((19, 23)).astype(np.float32) * 40.0
        p = str(tmp_path / "d.png")
        depth_io.save_depth_png16(p, depth)
        back = depth_io.load_depth(p)
        np.testing.assert_allclose(
            back, (depth * 1000).astype(np.uint16) / 1000.0, atol=1e-6)
