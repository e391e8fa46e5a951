#!/usr/bin/env python3
"""BASELINE.json config validations beyond the test suite:
  - 4096x4096 (and non-mult-of-32 4000x4000) single-image encode
  - 256-image batched encode via the lockstep engine
Usage: python tools/config_checks.py [big|batch]
"""
import sys
import time

import numpy as np


def big_image():
    from hevce_tpu.runtime.native import encode_image_native
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:4096, 0:4096]
    img = ((yy // 13 + xx // 7) % 220 + rng.integers(0, 36, (4096, 4096))).astype(np.uint8)
    t0 = time.time()
    stream, rcon = encode_image_native(img, 2)
    dt = time.time() - t0
    print(f"4096x4096 @ qpd6=2: {len(stream)} B, {dt:.0f}s, {img.size / 1e6 / dt:.3f} MP/s, "
          f"recon {rcon.shape}")
    # non-multiple-of-32 large image (replicate-padding path at scale)
    img2 = img[:4001, :3990].copy()
    t0 = time.time()
    stream2, rcon2 = encode_image_native(img2, 2)
    dt = time.time() - t0
    assert rcon2.shape == (4032, 4000), rcon2.shape
    print(f"4001x3990 @ qpd6=2: {len(stream2)} B, {dt:.0f}s, recon {rcon2.shape} (padded)")


def batch256():
    from hevce_tpu.parallel.lockstep import encode_batch
    from hevce_tpu.runtime.native import encode_image_native
    rng = np.random.default_rng(1)
    base = (np.linspace(0, 255, 64 * 64).reshape(64, 64)).astype(np.uint8)
    imgs = [np.clip(base.astype(int) + rng.integers(-40, 40, (64, 64)), 0, 255).astype(np.uint8)
            for _ in range(256)]
    t0 = time.time()
    streams, rcons = encode_batch(imgs, 2)
    dt = time.time() - t0
    mp = sum(i.size for i in imgs) / 1e6
    print(f"batch-256 (64x64) @ qpd6=2: {dt:.0f}s, {mp / dt:.3f} MP/s aggregate")
    # spot-check 8 against sequential
    ok = 0
    for i in range(0, 256, 32):
        s, r = encode_image_native(imgs[i], 2)
        ok += (s == streams[i]) and np.array_equal(r, rcons[i])
    print(f"spot-check vs sequential: {ok}/8 bit-exact")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "batch"
    (big_image if mode == "big" else batch256)()
