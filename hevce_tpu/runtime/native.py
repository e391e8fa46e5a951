"""ctypes binding to the native host engine, with build-on-first-use.

The C++ engine (csrc/hevce_host.cpp) implements the full sequential encode
path — CABAC + syntax + RD arbiter + host math fallback — matching the
reference contract HEVCImageEncoder (reference src/HEVCe.h:5-12).
"""
import ctypes
import pathlib
import subprocess
import sys
import threading

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_LIB_PATH = pathlib.Path(__file__).resolve().parent / "libhevce_host.so"
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            subprocess.run(
                [sys.executable, str(_ROOT / "tools" / "build_native.py")],
                check=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hevce_encode.restype = ctypes.c_longlong
        lib.hevce_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return lib


def encode_image_native(img: np.ndarray, qpd6: int):
    """Encode one 8-bit grayscale image with the native engine.

    Returns (stream bytes, recon ndarray with CTU-padded dims).
    """
    assert img.dtype == np.uint8 and img.ndim == 2
    assert 0 <= qpd6 <= 4
    lib = _load()
    img = np.ascontiguousarray(img)
    ysz = ctypes.c_int(img.shape[0])
    xsz = ctypes.c_int(img.shape[1])
    yp = -(-img.shape[0] // 32) * 32
    xp = -(-img.shape[1] // 32) * 32
    stream = np.empty(yp * xp + (1 << 16), np.uint8)
    rcon = np.empty((yp, xp), np.uint8)
    n = lib.hevce_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(ysz), ctypes.byref(xsz), qpd6,
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rcon.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n < 0:
        raise ValueError("hevce_encode failed")
    assert (ysz.value, xsz.value) == (yp, xp)
    return bytes(stream[:n]), rcon
