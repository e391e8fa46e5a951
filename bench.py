#!/usr/bin/env python3
"""Benchmark: bit-exact Kodak encode throughput at qpd6=2.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference C encoder measured at 0.044 MP/s on this host
(BASELINE.md: Kodak-24 @ qpd6=2, single core).

The encode path benchmarked here is the production bit-exact path (native
host engine). Sweeps the full 24-image Kodak set by default; set
HEVCE_BENCH_QUICK=1 for a 6-image smoke run (relabeled accordingly).
"""
import glob
import json
import os
import time

BASELINE_MPS = 0.044


def main():
    from hevce_tpu.runtime.native import encode_image_native
    from hevce_tpu.utils.imageio import read_pgm

    files = sorted(glob.glob("/root/reference/testimage/*.pgm"))
    if not files:
        files = sorted(glob.glob("tests/data/kodak/*.pgm"))
    quick = bool(os.environ.get("HEVCE_BENCH_QUICK"))
    if quick:
        files = files[:6]

    imgs = [read_pgm(f) for f in files]
    # warm up (library build / first-call effects)
    encode_image_native(imgs[0][:64, :64].copy(), 2)

    t0 = time.time()
    npix = 0
    nbytes = 0
    for img in imgs:
        stream, _ = encode_image_native(img, 2)
        npix += img.size
        nbytes += len(stream)
    dt = time.time() - t0
    mps = npix / 1e6 / dt

    name = "bit-exact Kodak-24 encode throughput @ qpd6=2"
    if quick:
        name = "bit-exact Kodak (6-image subset) encode throughput @ qpd6=2"
    print(json.dumps({
        "metric": name,
        "value": round(mps, 4),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_MPS, 2),
    }))


if __name__ == "__main__":
    main()
