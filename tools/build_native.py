#!/usr/bin/env python3
"""Build the native host engine (csrc/hevce_host.cpp) into a shared library.

Usage: python tools/build_native.py [--debug]
Output: hevce_tpu/runtime/libhevce_host.so
"""
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "csrc" / "hevce_host.cpp"
OUT = ROOT / "hevce_tpu" / "runtime" / "libhevce_host.so"


def build(debug=False):
    OUT.parent.mkdir(parents=True, exist_ok=True)
    flags = ["-O0", "-g"] if debug else ["-O3", "-march=native", "-funroll-loops"]
    cmd = ["g++", "-std=c++17", "-shared", "-fPIC", "-pthread", "-Wall", "-Wextra",
           "-Wno-unused-parameter", *flags, str(SRC), "-o", str(OUT)]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {OUT}")


if __name__ == "__main__":
    build(debug="--debug" in sys.argv)
