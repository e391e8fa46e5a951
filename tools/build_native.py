#!/usr/bin/env python3
"""Build the native host engine (csrc/hevce_host.cpp) into a shared library.

Usage: python tools/build_native.py [--debug] [--pgo]
Output: hevce_tpu/runtime/libhevce_host.so

--pgo builds profile-guided (instrumented run on a training image, then
-fprofile-use). Measured SLOWER than plain -O3 on this gcc/Xeon combo
(4.9s vs 4.55s on testimage/03 @ qpd6=2), so the default is plain -O3;
the flag is kept for re-evaluation on other hosts. Output streams are
identical either way — PGO changes only code layout/branch hints.
"""
import ctypes
import os
import pathlib
import subprocess
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "csrc" / "hevce_host.cpp"
OUT = ROOT / "hevce_tpu" / "runtime" / "libhevce_host.so"

BASE = ["g++", "-std=c++17", "-shared", "-fPIC", "-pthread", "-Wall", "-Wextra",
        "-Wno-unused-parameter", "-O3", "-march=native", "-funroll-loops",
        "-fopenmp-simd"]


def _run_training(lib_path: pathlib.Path):
    """Exercise the hot paths: encode + decode a textured image at all qpd6."""
    import numpy as np
    lib = ctypes.CDLL(str(lib_path))
    lib.hevce_encode.restype = ctypes.c_longlong
    lib.hevce_decode.restype = ctypes.c_longlong
    # representative content: a natural-image crop if available, else texture
    sz = 160
    try:
        from hevce_tpu.utils.imageio import read_pgm
        img = np.ascontiguousarray(
            read_pgm("/root/reference/testimage/03.pgm")[:sz, :sz])
    except Exception:  # noqa: BLE001
        rng = np.random.RandomState(7)
        yy, xx = np.mgrid[0:sz, 0:sz]
        img = ((yy * 3 + xx * 2) % 200 + rng.randint(0, 56, (sz, sz))).astype(np.uint8)
    stream = np.empty(sz * sz * 4 + 65536, np.uint8)
    rcon = np.empty(sz * sz, np.uint8)
    for q in (2, 4):
        y, x = ctypes.c_int(sz), ctypes.c_int(sz)
        n = lib.hevce_encode(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(y), ctypes.byref(x), q,
            stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_longlong(len(stream)),
            rcon.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        assert n > 0
        lib.hevce_decode(
            stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_longlong(n), ctypes.byref(y), ctypes.byref(x),
            rcon.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))


def build(debug=False, pgo=False):
    OUT.parent.mkdir(parents=True, exist_ok=True)
    if debug:
        cmd = [*BASE[:8], "-O0", "-g", str(SRC), "-o", str(OUT)]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)
        print(f"built {OUT} (debug)")
        return
    if pgo:
        try:
            with tempfile.TemporaryDirectory() as td:
                pdir = os.path.join(td, "pgo")
                inst = pathlib.Path(td) / "inst.so"
                subprocess.run([*BASE, f"-fprofile-generate={pdir}",
                                str(SRC), "-o", str(inst)],
                               check=True, capture_output=True)
                _run_training(inst)
                subprocess.run([*BASE, f"-fprofile-use={pdir}",
                                "-fprofile-correction", str(SRC), "-o", str(OUT)],
                               check=True, capture_output=True)
            print(f"built {OUT} (PGO)")
            return
        except Exception as e:  # noqa: BLE001 — fall back to plain build
            print(f"PGO build failed ({e}); falling back to plain -O3")
    cmd = [*BASE, str(SRC), "-o", str(OUT)]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {OUT}")


if __name__ == "__main__":
    build(debug="--debug" in sys.argv, pgo="--pgo" in sys.argv)
