"""Cross-platform (CPU vs TPU) fast-mode decision-record equality check.

History: through most of round 3 the wavefront fast mode produced DIFFERENT
decisions on CPU vs TPU for some grid shapes (R=1 multi-column slices, full
Kodak grids) while single-CTU probes matched. The probes (round-3 session
logs; summary in ROADMAP.md) localized it to a TPU-backend while-loop
hazard: a lax.scan whose body both USES and INCREMENTS a carried scalar
counter (the front index d) executed parts of the next iteration's flag
math against the already-incremented value — lanes at step 0 behaved
exactly as if cc = (d+1) - 2r, so availability flags went wrong and
unavailable borders read the zero-filled context instead of the 128
fallback (quant DC 189 vs -67 with IDENTICAL recon was the smoking gun:
at qpd6=2 the recon re-absorbs the bad prediction, only rates/decisions
shift). Direct argument-fed calls and every isolated pipeline stage match
bit-for-bit; only the >=2-iteration carried-counter scan diverged.

Fix: the front index d and the quadrant counter qi ride scan xs (iota
arrays), never the carry (wavefront.py). This script is the regression
check: run `cpu` first, then `tpu`; every record set must be BIT-IDENTICAL.

Round 4 extension: `--full` replays the PRODUCTION bench configuration —
all 24 Kodak images in shape-grouped batches (landscape 18 + portrait 6,
bench.py's HEVCE_BENCH_BATCH default) under both rmd=None (dense) and
rmd=(12, 4) — because the round-3 B=1 coverage missed a divergence that
only the full-batch shapes exhibit (round-4 finding: TPU dense full-24
quality stats differ from CPU's while RMD's match). rmd is always passed
EXPLICITLY so a stray HEVCE_RMD cannot skew the comparison (ADVICE r3).

Usage:  python tools/verify_cross_platform.py cpu [--full]
        python tools/verify_cross_platform.py tpu [--full]
"""
import glob
import os
import sys

import numpy as np

# repo-root import when run as a script (do NOT use PYTHONPATH for TPU runs
# — it breaks the axon plugin registration, CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cases(full):
    from hevce_tpu.utils.imageio import read_pgm

    k1 = read_pgm('/root/reference/testimage/01.pgm')
    cases = {  # name -> (image list, rmd)
        "r1c5": ([np.ascontiguousarray(k1[100:132, 100:260])], None),
        "r3c5": ([np.ascontiguousarray(k1[60:156, 300:460])], None),
        "kodak01": ([k1], None),
        "r3c5_rmd": ([np.ascontiguousarray(k1[60:156, 300:460])], (12, 4)),
        "kodak01_rmd": ([k1], (12, 4)),
    }
    if full:
        imgs = [read_pgm(f)
                for f in sorted(glob.glob('/root/reference/testimage/*.pgm'))]
        land = [im for im in imgs if im.shape[0] < im.shape[1]]
        port = [im for im in imgs if im.shape[0] >= im.shape[1]]
        for rmd, tag in ((None, "dense"), ((12, 4), "rmd")):
            cases[f"land18_{tag}"] = (land, rmd)
            cases[f"port_{tag}"] = (port, rmd)
    return cases


def main():
    plat = sys.argv[1]
    full = "--full" in sys.argv[2:]
    if plat == "cpu":
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from hevce_tpu.models import wavefront as wf
    from hevce_tpu.utils.tracing import PhaseTimer

    tag = "_full" if full else ""
    res = {}
    for name, (imgs, rmd) in _cases(full).items():
        out, meta = wf._dispatch_batch(imgs, 2, rmd=rmd)
        res[name] = wf._fetch_lean(out, meta, PhaseTimer())
        print(f"{name} records fetched {res[name].shape}", flush=True)
    np.savez(f"/tmp/xplat{tag}_{plat}.npz", **res)
    if plat == "tpu":
        a = np.load(f"/tmp/xplat{tag}_cpu.npz")
        fail = False
        for name in res:
            d = int((a[name] != res[name]).sum())
            print(f"cross {name:12s}: "
                  f"{'BIT-IDENTICAL' if d == 0 else f'DIFF {d}'}")
            fail |= d != 0
        sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
