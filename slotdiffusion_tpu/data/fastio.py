"""ctypes bindings for the native input-pipeline hot path (native/fastio.cpp).

`decode_jpeg_norm(path, res)` fuses JPEG decode -> bilinear resize ->
[-1, 1] normalize into one C call writing a float32 [h, w, 3] array —
replacing the PIL decode/convert/resize/normalize chain in the frame
datasets (MOVi/Physion read thousands of JPEG frames per epoch on a
1-core host).

The library is built on demand with `make -C native` (g++ + libjpeg are
in the image). Every entry point falls back to PIL when the build or a
decode fails, so the package works without the native piece.
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libfastio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SLOTDIFFUSION_NO_FASTIO"):
            return None
        try:
            if not osp.isfile(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"], check=True,
                    capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fastio_decode_jpeg_resize_norm.restype = ctypes.c_int
            lib.fastio_decode_jpeg_resize_norm.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float]
            lib.fastio_u8_to_f32.restype = None
            lib.fastio_u8_to_f32.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_float, ctypes.c_float]
            lib.fastio_decode_png_resize_nearest_u8.restype = ctypes.c_int
            lib.fastio_decode_png_resize_nearest_u8.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
                ctypes.c_int, ctypes.c_int]
            lib.fastio_decode_png_norm.restype = ctypes.c_int
            lib.fastio_decode_png_norm.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float]
            lib.fastio_png_dims.restype = ctypes.c_int
            lib.fastio_png_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except (OSError, subprocess.SubprocessError):
            _lib = None
        return _lib


def fastio_available():
    return _load() is not None


def decode_jpeg_norm(path, res, out=None):
    """JPEG file -> float32 [h, w, 3] in [-1, 1]. `out` may be a
    preallocated C-contiguous float32 array (e.g. a batch slice) to write
    into. Returns None on failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            buf = f.read()
    except OSError:
        return None
    h, w = res
    if out is None:
        out = np.empty((h, w, 3), np.float32)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    rc = lib.fastio_decode_jpeg_resize_norm(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, 1.0 / 127.5, -1.0)
    if rc != 0:
        return None
    return out


def decode_png_mask(path, res, out=None):
    """Segmentation-mask PNG -> uint8 [h, w] id map, nearest-resized.
    Covers the mask layouts the datasets read with PIL today (MOVi/
    CLEVRTex store per-pixel instance ids in gray/palette PNGs).
    Returns None on failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            buf = f.read()
    except OSError:
        return None
    h, w = res
    if out is None:
        out = np.empty((h, w), np.uint8)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    rc = lib.fastio_decode_png_resize_nearest_u8(
        buf, len(buf), out.ctypes.data_as(ctypes.c_char_p), h, w)
    if rc != 0:
        return None
    return out


def decode_png_norm(path, out=None, scale=1.0 / 127.5, shift=-1.0):
    """RGB PNG -> float32 [h, w, 3] at native size, normalized in one
    pass. Returns None on failure."""
    lib = _load()
    if lib is None:
        return None
    try:
        with open(path, "rb") as f:
            buf = f.read()
    except OSError:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.fastio_png_dims(buf, len(buf), ctypes.byref(h),
                           ctypes.byref(w)) != 0:
        return None
    if out is None:
        out = np.empty((h.value, w.value, 3), np.float32)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    rc = lib.fastio_decode_png_norm(
        buf, len(buf), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h.value, w.value, scale, shift)
    if rc != 0:
        return None
    return out


def u8_to_f32_norm(src, out=None, scale=1.0 / 127.5, shift=-1.0):
    """Fused uint8 -> normalized float32 (single pass). Falls back to
    numpy when the native lib is unavailable."""
    src = np.ascontiguousarray(src, np.uint8)
    if out is None:
        out = np.empty(src.shape, np.float32)
    lib = _load()
    if lib is None:
        np.multiply(src, scale, out=out, casting="unsafe")
        out += shift
        return out
    lib.fastio_u8_to_f32(
        src.ctypes.data_as(ctypes.c_char_p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size, scale, shift)
    return out
