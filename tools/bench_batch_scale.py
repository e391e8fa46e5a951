#!/usr/bin/env python3
"""Measure fast-mode throughput vs batch size B (VERDICT r4 item 2).

The wavefront front step is fixed-overhead bound (~140 us per dense eval,
ROADMAP round-4 xplane analysis), so lanes should be ~free until some knee:
this tool measures that curve on the live backend and prints one JSON line
per B. Work list = the 18 landscape Kodak images duplicated REP times (one
program shape per B; portrait images would add a second compile per B).

Usage: python tools/bench_batch_scale.py [B ...]   (default 18 36 54 72)
Env:   HEVCE_BBS_REP=4  duplication factor (constant work across Bs)
"""
import glob
import json
import os
import sys
import time

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo-root import; never PYTHONPATH (breaks axon plugin)


def main():
    bs = [int(a) for a in sys.argv[1:]] or [18, 36, 54, 72]
    rep = int(os.environ.get("HEVCE_BBS_REP", "4"))
    from hevce_tpu.utils.imageio import read_pgm
    imgs = [read_pgm(f)
            for f in sorted(glob.glob("/root/reference/testimage/*.pgm"))]
    land = [im for im in imgs if im.shape[0] < im.shape[1]]
    work = land * rep
    npix = sum(im.size for im in work)

    from hevce_tpu.models import wavefront as wf
    from hevce_tpu.utils.tracing import PhaseTimer

    for B in bs:
        t0 = time.time()
        wf.encode_many_fast(work[:B], 2, batch=B, want_recon=False)  # compile
        compile_s = time.time() - t0
        timer = PhaseTimer()
        t0 = time.time()
        streams, _ = wf.encode_many_fast(work, 2, batch=B,
                                         want_recon=False, timer=timer)
        dt = time.time() - t0
        assert all(s is not None for s in streams)
        print(json.dumps({
            "B": B, "mps": round(npix / 1e6 / dt, 3),
            "wall_s": round(dt, 2), "compile_s": round(compile_s, 1),
            "images": len(work),
            "phases": {k: round(v, 2) for k, v in timer.totals.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
