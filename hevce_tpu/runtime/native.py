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
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return lib


def stream_capacity(ysz: int, xsz: int) -> int:
    """Worst-case stream bytes for one image: the reference bounds each CTU's
    entropy payload by 3*CTU^2+128 B (reference src/HEVCe.c:795-806), i.e.
    3.125 B/pixel of padded area, plus headers. Streams CAN exceed
    1 B/pixel (512x512 noise @ qpd6=0 measures ~1.31 B/px)."""
    yp, xp = -(-ysz // 32) * 32, -(-xsz // 32) * 32
    return 3 * yp * xp + yp * xp // 8 + (1 << 16)


def _clip_dims(img: np.ndarray) -> np.ndarray:
    """Clamp to the 8192x8192 engine maximum BEFORE handing the buffer to C:
    the native engine indexes with its clamped xsz as the row stride, so an
    oversized image must be sliced host-side to keep strides consistent
    (reference clamps at src/HEVCe.c:1581-1582 but keeps the true stride
    via GET2D; we slice instead)."""
    if img.shape[0] > 8192 or img.shape[1] > 8192:
        img = img[:8192, :8192]
    return np.ascontiguousarray(img, np.uint8)


def encode_many_native(imgs, qpd6: int, nthreads: int = 0, hints=None):
    """Parallel native batch encode: nthreads C++ workers drain the image
    queue (host math). The production throughput path on many-core hosts;
    bit-exact per image. nthreads=0 -> os.cpu_count().

    hints: optional (n, n_ctus, 106) int8 device-oracle decision records
    ([lay 21 | pm 21 | pm4 64] per CTU, the wavefront fast mode's record
    prefix). Hints only REORDER trial evaluation in the exact RDO — streams
    are bit-identical with or without them, just found faster.

    Returns (list of stream bytes, list of recon arrays (padded dims)).
    """
    import os as _os
    imgs = [_clip_dims(im) for im in imgs]
    shape = imgs[0].shape
    assert all(im.shape == shape for im in imgs)
    assert 0 <= qpd6 <= 4
    n = len(imgs)
    ysz, xsz = shape
    yp, xp = -(-ysz // 32) * 32, -(-xsz // 32) * 32
    cap = stream_capacity(ysz, xsz)
    lib = _load()
    if not hasattr(lib.hevce_encode_many_hinted, "_bound"):
        lib.hevce_encode_many_hinted.restype = ctypes.c_int
        lib.hevce_encode_many_hinted.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.hevce_encode_many_hinted._bound = True
    blob = np.concatenate([im.reshape(-1) for im in imgs])
    streams = np.empty(n * cap, np.uint8)
    lens = np.empty(n, np.int64)
    rcons = np.empty((n, yp, xp), np.uint8)
    hptr = ctypes.POINTER(ctypes.c_int8)()
    if hints is not None:
        hints = np.ascontiguousarray(hints, np.int8)
        assert hints.size == n * (yp // 32) * (xp // 32) * 106, hints.shape
        hptr = hints.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
    rc = lib.hevce_encode_many_hinted(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, ysz, xsz, qpd6,
        hptr, nthreads or (_os.cpu_count() or 1),
        streams.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        rcons.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError("hevce_encode_many failed")
    return ([bytes(streams[i * cap:i * cap + lens[i]]) for i in range(n)],
            [rcons[i] for i in range(n)])


def pack_forest(lay, pm, pm4, qc, ysz: int, xsz: int, qpd6: int) -> bytes:
    """Pack a pre-decided CU forest (wavefront fast mode) into a compliant
    stream with the exact CABAC machinery (csrc pack_stream). Per-CTU record
    layout is documented at csrc PackRec: lay/pm 21 nodes, pm4 64 NxN PU
    modes, qc 1024 composed z-order quant leaves. Arrays may be any integer
    dtype/shape; they are flattened to int32 in raster CTU order."""
    lib = _load()
    if not hasattr(lib.hevce_pack, "_bound"):
        lib.hevce_pack.restype = ctypes.c_longlong
        lib.hevce_pack.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 4 + [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
        lib.hevce_stream_capacity.restype = ctypes.c_longlong
        lib.hevce_stream_capacity.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.hevce_pack._bound = True
    cap = int(lib.hevce_stream_capacity(ysz, xsz))
    buf = np.empty(cap, np.uint8)
    arrs = [np.ascontiguousarray(a, np.int32).reshape(-1)
            for a in (lay, pm, pm4, qc)]
    n = lib.hevce_pack(
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs),
        ysz, xsz, qpd6,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(cap))
    if n <= 0:
        raise ValueError(f"hevce_pack failed: {n}")
    return bytes(buf[:n])


def pack_forest_img(lay, pm, pm4, img: np.ndarray, qpd6: int):
    """Pack a pre-decided CU forest from DECISIONS ONLY: quant levels are
    recomputed on the host from (lay, pm, pm4) + the original image with the
    same deterministic integer candidate pipeline the device ran (csrc
    replay_cu) — bit-identical levels, so the device fast path only ships
    ~106 B/CTU of decisions instead of the 1 KB/CTU quant planes (the
    dominant device->host cost on tunneled TPUs, ROADMAP round-3).

    Returns (stream bytes, recon ndarray with CTU-padded dims) — the recon
    equals what a decoder reconstructs from the stream."""
    lib = _load()
    if not hasattr(lib, "hevce_pack_img"):
        raise RuntimeError("stale libhevce_host.so: rebuild via tools/build_native.py")
    if not hasattr(lib.hevce_pack_img, "_bound"):
        lib.hevce_pack_img.restype = ctypes.c_longlong
        lib.hevce_pack_img.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 3 + [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.hevce_stream_capacity.restype = ctypes.c_longlong
        lib.hevce_stream_capacity.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.hevce_pack_img._bound = True
    img = _clip_dims(img)
    ysz, xsz = img.shape
    yp, xp = -(-ysz // 32) * 32, -(-xsz // 32) * 32
    cap = int(lib.hevce_stream_capacity(ysz, xsz))
    buf = np.empty(cap, np.uint8)
    rcon = np.empty((yp, xp), np.uint8)
    arrs = [np.ascontiguousarray(a, np.int32).reshape(-1)
            for a in (lay, pm, pm4)]
    n = lib.hevce_pack_img(
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ysz, xsz, qpd6,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(cap),
        rcon.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n <= 0:
        raise ValueError(f"hevce_pack_img failed: {n}")
    return bytes(buf[:n]), rcon


def last_pack_stats():
    """Realized CABAC stats of this thread's LAST pack_forest/_img call:
    (payload_bits, n_context_bins, n_bypass_bins). The fast mode's
    corrective pass derives the realized average context-bin cost
    (payload_bits - n_bypass_bins) / n_context_bins — the measured value of
    the price the greedy rate model assumes as CTX_BIT (wavefront.py)."""
    lib = _load()
    if not hasattr(lib, "hevce_last_pack_stats"):
        raise RuntimeError(
            "stale libhevce_host.so: rebuild via tools/build_native.py")
    if not hasattr(lib.hevce_last_pack_stats, "_bound"):
        lib.hevce_last_pack_stats.restype = None
        lib.hevce_last_pack_stats.argtypes = [
            ctypes.POINTER(ctypes.c_longlong)]
        lib.hevce_last_pack_stats._bound = True
    out = (ctypes.c_longlong * 3)()
    lib.hevce_last_pack_stats(out)
    return int(out[0]), int(out[1]), int(out[2])


def decode_stream(stream: bytes) -> np.ndarray:
    """Decode an .h265 stream produced by this encoder subset with the
    independent native decoder (spec-side arithmetic decoding + syntax
    parsing; csrc/hevce_host.cpp `namespace dec`). Returns the luma plane
    with the padded stream dimensions — equal to the encoder's recon output
    for every valid stream (the compliance verification oracle;
    reference README.md:21-22 delegates this to third-party decoders).
    """
    lib = _load()
    if not hasattr(lib.hevce_decode, "_bound"):
        lib.hevce_decode.restype = ctypes.c_longlong
        lib.hevce_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.hevce_decode._bound = True
    buf = np.frombuffer(bytes(stream), np.uint8)
    y, x = ctypes.c_int(0), ctypes.c_int(0)
    rc = lib.hevce_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(y), ctypes.byref(x), None)
    if rc < 0:
        raise ValueError(f"hevce_decode: malformed/unsupported stream ({rc})")
    luma = np.empty((y.value, x.value), np.uint8)
    rc = lib.hevce_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(y), ctypes.byref(x),
        luma.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != luma.size:
        raise ValueError(f"hevce_decode: decode failed ({rc})")
    return luma


def encode_image_native(img: np.ndarray, qpd6: int):
    """Encode one 8-bit grayscale image with the native engine.

    Returns (stream bytes, recon ndarray with CTU-padded dims).
    """
    assert img.dtype == np.uint8 and img.ndim == 2
    assert 0 <= qpd6 <= 4
    lib = _load()
    img = _clip_dims(img)
    ysz = ctypes.c_int(img.shape[0])
    xsz = ctypes.c_int(img.shape[1])
    yp = -(-img.shape[0] // 32) * 32
    xp = -(-img.shape[1] // 32) * 32
    cap = stream_capacity(img.shape[0], img.shape[1])
    stream = np.empty(cap, np.uint8)
    rcon = np.empty((yp, xp), np.uint8)
    n = lib.hevce_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(ysz), ctypes.byref(xsz), qpd6,
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        rcon.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n < 0:
        raise ValueError("hevce_encode failed")
    assert (ysz.value, xsz.value) == (yp, xp)
    return bytes(stream[:n]), rcon
