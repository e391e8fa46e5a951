"""Lockstep batched encoding: TPU device math + C++ host arbiters.

B same-sized images are encoded bit-exactly in parallel: B C++ worker threads
walk the (content-independent) CU search schedule; at every schedule event
their 35-mode candidate-math requests rendezvous into ONE device batch, a
single jitted TPU step computes all candidates, and the workers' RD arbiters
(live CABAC state, trial encodes) consume the results. Streams are identical
to the sequential/reference encoder.

This is ROADMAP.md Phase A: the 68%-of-runtime math runs on the device; the
host cost is the sequential entropy arbitration only.
"""
import ctypes
import functools

import numpy as np

from hevce_tpu.models import cu_eval
from hevce_tpu.runtime import native

MODES = 35
KIND_NODE, KIND_PU, KIND_DONE = 0, 1, 2


def _bind(lib):
    lib.hevce_batch_create.restype = ctypes.c_void_p
    lib.hevce_batch_create.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
    lib.hevce_batch_next.restype = ctypes.c_int
    lib.hevce_batch_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.hevce_batch_supply.argtypes = [ctypes.c_void_p]
    lib.hevce_batch_buf.restype = ctypes.c_void_p
    lib.hevce_batch_buf.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hevce_batch_stream.restype = ctypes.c_longlong
    lib.hevce_batch_stream.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_uint8)]
    lib.hevce_batch_rcon.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_uint8)]
    lib.hevce_batch_destroy.argtypes = [ctypes.c_void_p]


def _view(lib, handle, which, dtype, count):
    ptr = lib.hevce_batch_buf(handle, which)
    ctype = ctypes.c_int32 if dtype == np.int32 else ctypes.c_uint8
    return np.ctypeslib.as_array(ctypes.cast(ptr, ctypes.POINTER(ctype)),
                                 shape=(count,))


@functools.lru_cache(maxsize=None)
def _jit_pu_step(qpd6: int):
    import jax
    return jax.jit(functools.partial(cu_eval.eval_2nx2n, 4, qpd6))


def encode_batch(images, qpd6: int):
    """Encode a list of same-shaped uint8 grayscale images bit-exactly.

    Returns (list of stream bytes, list of recon arrays (padded dims)).
    """
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    shape = images[0].shape
    assert all(im.shape == shape for im in images), "batch must share dims"
    B = len(images)
    ysz, xsz = shape
    yp, xp = -(-ysz // 32) * 32, -(-xsz // 32) * 32

    lib = native._load()
    _bind(lib)
    blob = np.concatenate([im.reshape(-1) for im in images])  # keep alive
    handle = lib.hevce_batch_create(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), B, ysz, xsz, qpd6)
    assert handle

    req_top = _view(lib, handle, 0, np.int32, B * 65).reshape(B, 65)
    req_left = _view(lib, handle, 1, np.int32, B * 64).reshape(B, 64)
    req_flags = _view(lib, handle, 2, np.uint8, B * 4).reshape(B, 4)
    req_orig = _view(lib, handle, 3, np.int32, B * 1024).reshape(B, 1024)
    res_quant = _view(lib, handle, 4, np.int32, B * MODES * 1024)
    res_recon = _view(lib, handle, 5, np.uint8, B * MODES * 1024)
    res_sse = _view(lib, handle, 6, np.int32, B * MODES)
    res_quant4 = _view(lib, handle, 7, np.int32, B * MODES * 1024)
    res_recon4 = _view(lib, handle, 8, np.uint8, B * MODES * 1024)
    res_sse4 = _view(lib, handle, 9, np.int32, B * MODES)

    szv = ctypes.c_int(0)
    try:
        while True:
            kind = lib.hevce_batch_next(handle, ctypes.byref(szv))
            if kind == KIND_DONE:
                break
            sz = szv.value
            nn = sz * sz
            top = req_top[:, :1 + 2 * sz]
            left = req_left[:, :2 * sz]
            flags = req_flags.astype(bool)
            orig = req_orig[:, :nn].reshape(B, sz, sz)
            if kind == KIND_NODE:
                fn = cu_eval.jit_eval_2nx2n(sz, qpd6)
                q1, r1, s1 = fn(top, left, flags, orig)
                fn4 = cu_eval.jit_eval_tusplit(sz, qpd6)
                q4, r4, s4 = fn4(top, left, flags, orig)
                res_quant[:B * MODES * nn] = np.asarray(q1).reshape(-1)
                res_recon[:B * MODES * nn] = np.asarray(r1, np.uint8).reshape(-1)
                res_sse[:] = np.asarray(s1).reshape(-1)
                res_quant4[:B * MODES * nn] = np.asarray(q4).reshape(-1)
                res_recon4[:B * MODES * nn] = np.asarray(r4, np.uint8).reshape(-1)
                res_sse4[:] = np.asarray(s4).reshape(-1)
            else:  # PU event: 4x4 single-TU only
                q1, r1, s1 = _jit_pu_step(qpd6)(top, left, flags, orig)
                res_quant[:B * MODES * 16] = np.asarray(q1).reshape(-1)
                res_recon[:B * MODES * 16] = np.asarray(r1, np.uint8).reshape(-1)
                res_sse[:] = np.asarray(s1).reshape(-1)
            lib.hevce_batch_supply(handle)

        streams, rcons = [], []
        for s in range(B):
            n = lib.hevce_batch_stream(handle, s, None)
            buf = np.empty(n, np.uint8)
            lib.hevce_batch_stream(
                handle, s, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            streams.append(bytes(buf))
            rc = np.empty((yp, xp), np.uint8)
            lib.hevce_batch_rcon(
                handle, s, rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            rcons.append(rc)
        return streams, rcons
    finally:
        lib.hevce_batch_destroy(handle)
