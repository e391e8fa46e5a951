#!/usr/bin/env python3
"""BASELINE.json config validations beyond the quick test suite:
  - 4096x4096 (and non-mult-of-32 4001x3990) single-image encode
  - 256-image batched encode via the lockstep engine
Usage: python tools/config_checks.py [big|batch]

These also run as @pytest.mark.slow tests (tests/test_configs.py) so the
configs cannot silently rot.
"""
import sys
import time

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo-root import; never PYTHONPATH (breaks axon plugin)


def big_image(verbose=True):
    from hevce_tpu.runtime.native import encode_image_native
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:4096, 0:4096]
    img = ((yy // 13 + xx // 7) % 220 + rng.integers(0, 36, (4096, 4096))).astype(np.uint8)
    t0 = time.time()
    stream, rcon = encode_image_native(img, 2)
    dt = time.time() - t0
    if verbose:
        print(f"4096x4096 @ qpd6=2: {len(stream)} B, {dt:.0f}s, "
              f"{img.size / 1e6 / dt:.3f} MP/s, recon {rcon.shape}")
    assert rcon.shape == (4096, 4096)
    assert len(stream) > 0
    # non-multiple-of-32 large image (replicate-padding path at scale)
    img2 = img[:4001, :3990].copy()
    t0 = time.time()
    stream2, rcon2 = encode_image_native(img2, 2)
    dt = time.time() - t0
    assert rcon2.shape == (4032, 4000), rcon2.shape
    # padded recon must replicate-extend: bottom padded rows follow the
    # content continuation, and the stream must be parseable non-empty
    assert len(stream2) > 0
    if verbose:
        print(f"4001x3990 @ qpd6=2: {len(stream2)} B, {dt:.0f}s, recon {rcon2.shape} (padded)")
    return {"stream": len(stream), "stream_odd": len(stream2)}


def batch256(verbose=True, check_every=32):
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
    if verbose:
        print(f"batch-256 (64x64) @ qpd6=2: {dt:.0f}s, {mp / dt:.3f} MP/s aggregate")
    # spot-check against sequential
    nok = 0
    idxs = list(range(0, 256, check_every))
    for i in idxs:
        s, r = encode_image_native(imgs[i], 2)
        assert s == streams[i], f"stream {i} diverged"
        assert np.array_equal(r, rcons[i]), f"recon {i} diverged"
        nok += 1
    if verbose:
        print(f"spot-check vs sequential: {nok}/{len(idxs)} bit-exact")
    return {"mps": mp / dt, "checked": nok}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "batch"
    (big_image if mode == "big" else batch256)()
