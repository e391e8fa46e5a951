#!/usr/bin/env python3
"""Profile the host pack path (pack_forest_img) in isolation.

The round-5 batch sweep showed pack at ~20 ms per 768x512 image (~1.46 s
for 72 images) — the largest single host phase once the device is hidden.
This tool times pack_forest_img on real fast-mode decision records (from a
CPU-backend fast encode so it runs tunnel-free) and splits replay vs CABAC
via the HEVCE_PACK_PROFILE env knob if the library exposes it.

Usage: python tools/profile_pack.py [n_images]
"""
import sys
import time

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo-root import; never PYTHONPATH (breaks axon plugin)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from hevce_tpu.utils.imageio import read_pgm
    from hevce_tpu.models import wavefront as wf
    from hevce_tpu.runtime import native

    imgs = [read_pgm(f"/root/reference/testimage/{i:02d}.pgm")
            for i in range(1, n + 1)]
    recs = []
    for im in imgs:
        out, meta = wf._dispatch_batch([im], 2, want_recon=False)
        from hevce_tpu.utils.tracing import PhaseTimer
        rec = wf._fetch_lean(out, meta, PhaseTimer())
        recs.append((rec[0], meta))

    # warm
    r0, m0 = recs[0]
    native.pack_forest_img(r0[:, :, wf._REC_LAY], r0[:, :, wf._REC_PM],
                           r0[:, :, wf._REC_PM4], imgs[0], 2)
    t0 = time.time()
    REP = 10
    for _ in range(REP):
        for (rec, meta), im in zip(recs, imgs):
            native.pack_forest_img(rec[:, :, wf._REC_LAY],
                                   rec[:, :, wf._REC_PM],
                                   rec[:, :, wf._REC_PM4], im, 2)
    dt = time.time() - t0
    per = dt / (REP * n)
    mps = sum(im.size for im in imgs) / 1e6 * REP / dt
    print(f"pack_forest_img: {per * 1e3:.2f} ms/image  {mps:.1f} MP/s/core "
          f"({n} images x{REP})")


if __name__ == "__main__":
    main()
