"""Native host runtime: build-on-first-use C++ helpers loaded via ctypes.

The compiled library is cached next to the source; when no compiler is
available the callers fall back to pure-numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "txr_native.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _lib_path() -> str:
    """Where the compiled library lives (or should be built).

    Prefer the package directory (editable/checkout installs); for
    non-editable installs site-packages is often read-only, so fall back to a
    user cache dir — otherwise every process would silently retry the failing
    g++ build and drop to the numpy fallbacks [advisor r2]."""
    in_pkg = os.path.join(_DIR, "libtxr_native.so")
    if os.path.exists(in_pkg) or os.access(_DIR, os.W_OK):
        return in_pkg
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "txr")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libtxr_native.so")


_LIB = _lib_path()


def _build() -> bool:
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    jpeg = ["-DTXR_HAVE_JPEG", "-ljpeg"]
    png = ["-DTXR_HAVE_PNG", "-lpng"]
    variants = [base + jpeg + png,  # full host codecs
                base + jpeg,       # no libpng dev files
                base + png,        # no libjpeg dev files
                base]              # neither present
    for cmd in variants:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return False


def get_lib():
    """The loaded native library, building it on first use; None if
    unavailable (no compiler)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.txr_write_ply.restype = ctypes.c_int
        lib.txr_write_ply.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.txr_pack_xyzrgb.restype = ctypes.c_int
        lib.txr_pack_xyzrgb.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.txr_compact_points.restype = ctypes.c_int64
        lib.txr_compact_points.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.txr_has_jpeg.restype = ctypes.c_int
        lib.txr_has_jpeg.argtypes = []
        lib.txr_has_png.restype = ctypes.c_int
        lib.txr_has_png.argtypes = []
        if lib.txr_has_png():
            lib.txr_png16_dims.restype = ctypes.c_int
            lib.txr_png16_dims.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.txr_decode_png16.restype = ctypes.c_int
            lib.txr_decode_png16.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int]
            lib.txr_encode_png16.restype = ctypes.c_int64
            lib.txr_encode_png16.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64]
        if lib.txr_has_jpeg():
            lib.txr_jpeg_dims.restype = ctypes.c_int
            lib.txr_jpeg_dims.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.txr_decode_jpeg.restype = ctypes.c_int
            lib.txr_decode_jpeg.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def native_decode_jpeg(data: bytes) -> np.ndarray | None:
    """Decode a JPEG byte string to a BGR uint8 array via the C++ stage.
    Returns None when the native decoder is unavailable or the stream is
    not a decodable baseline JPEG (caller falls back to cv2).

    The decoded array is freshly allocated per call: the consumer (the
    prefetch/pipeline chain) holds frames for an unbounded time, so a
    staging-buffer pool could only be safe with whole-frame lifecycle
    tracking — an earlier pool here was never handed buffers back and was
    a latent aliasing hazard for zero benefit [code-review r2]."""
    lib = get_lib()
    if lib is None or not lib.txr_has_jpeg():
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.txr_jpeg_dims(buf.ctypes.data_as(ctypes.c_void_p), buf.size,
                         ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.txr_decode_jpeg(buf.ctypes.data_as(ctypes.c_void_p), buf.size,
                             out.ctypes.data_as(ctypes.c_void_p),
                             w.value, h.value)
    if rc != 0:
        return None
    return out


def native_decode_png16(data: bytes) -> np.ndarray | None:
    """Decode a 16-bit single-channel PNG byte string to a uint16 (h, w)
    array via libpng. Returns None when the native decoder is unavailable or
    the stream is not a 16-bit grayscale PNG (caller falls back to cv2).

    This is the depth artifact contract's read side (the reference stores
    depth as uint16 millimeters, depth_to_reconstruction.py:85-92)."""
    lib = get_lib()
    if lib is None or not lib.txr_has_png():
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    bd = ctypes.c_int()
    ch = ctypes.c_int()
    if lib.txr_png16_dims(buf.ctypes.data_as(ctypes.c_void_p), buf.size,
                          ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(bd), ctypes.byref(ch)) != 0:
        return None
    if bd.value != 16 or ch.value != 1:
        return None
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.txr_decode_png16(buf.ctypes.data_as(ctypes.c_void_p), buf.size,
                              out.ctypes.data_as(ctypes.c_void_p),
                              w.value, h.value)
    if rc != 0:
        return None
    return out


def native_encode_png16(img: np.ndarray) -> bytes | None:
    """Encode a uint16 (h, w) array as a 16-bit grayscale PNG byte string.
    Returns None when the native encoder is unavailable (caller falls back
    to cv2). Lossless — pixel parity with cv2 is exact both ways."""
    lib = get_lib()
    if lib is None or not lib.txr_has_png():
        return None
    img = np.ascontiguousarray(img, dtype=np.uint16)
    h, w = img.shape
    # Raw size + headroom covers any compressible input; incompressible
    # inputs report the true size and we retry once.
    cap = img.nbytes + 4096
    out = np.empty(cap, np.uint8)
    n = lib.txr_encode_png16(img.ctypes.data_as(ctypes.c_void_p), w, h,
                             out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    if n > cap:
        cap = int(n)
        out = np.empty(cap, np.uint8)
        n = lib.txr_encode_png16(img.ctypes.data_as(ctypes.c_void_p), w, h,
                                 out.ctypes.data_as(ctypes.c_void_p), cap)
        if n < 0 or n > cap:
            return None
    return out[:n].tobytes()


def native_write_ply(path: str, xyz: np.ndarray, rgb: np.ndarray | None) -> bool:
    """Write float32-xyz (+uchar rgb) binary PLY natively. Returns False when
    the native library is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    rgb_ptr = None
    if rgb is not None:
        rgb = np.ascontiguousarray(rgb, dtype=np.float32)
        if rgb.size and rgb.max() > 1.5:  # tolerate 0..255 input
            rgb = rgb / 255.0
        rgb_ptr = rgb.ctypes.data_as(ctypes.c_void_p)
    rc = lib.txr_write_ply(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p), rgb_ptr,
        xyz.shape[0])
    return rc == 0


def native_pack_xyzrgb(xyz: np.ndarray, rgb: np.ndarray | None) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = xyz.shape[0]
    rec = 16 if rgb is not None else 12
    out = np.empty(n * rec, np.uint8)
    rgb_ptr = None
    if rgb is not None:
        rgb = np.ascontiguousarray(rgb, dtype=np.float32)
        rgb_ptr = rgb.ctypes.data_as(ctypes.c_void_p)
    lib.txr_pack_xyzrgb(xyz.ctypes.data_as(ctypes.c_void_p), rgb_ptr, n,
                        out.ctypes.data_as(ctypes.c_void_p))
    return out.tobytes()


def native_compact(xyz: np.ndarray, rgb: np.ndarray | None,
                   mask: np.ndarray):
    """Masked compaction → (dense_xyz, dense_rgb|None), or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    n = xyz.shape[0]
    out_xyz = np.empty_like(xyz)
    out_rgb = None
    rgb_ptr = out_rgb_ptr = None
    if rgb is not None:
        rgb = np.ascontiguousarray(rgb, dtype=np.float32)
        out_rgb = np.empty_like(rgb)
        rgb_ptr = rgb.ctypes.data_as(ctypes.c_void_p)
        out_rgb_ptr = out_rgb.ctypes.data_as(ctypes.c_void_p)
    m = lib.txr_compact_points(
        xyz.ctypes.data_as(ctypes.c_void_p), rgb_ptr,
        mask.ctypes.data_as(ctypes.c_void_p), n,
        out_xyz.ctypes.data_as(ctypes.c_void_p), out_rgb_ptr)
    return (out_xyz[:m], out_rgb[:m] if out_rgb is not None else None)
