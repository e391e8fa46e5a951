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

Usage:  python tools/verify_cross_platform.py cpu
        python tools/verify_cross_platform.py tpu
"""
import sys

import numpy as np


def main():
    plat = sys.argv[1]
    if plat == "cpu":
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from hevce_tpu.models import wavefront as wf
    from hevce_tpu.utils.tracing import PhaseTimer
    from hevce_tpu.utils.imageio import read_pgm

    k1 = read_pgm('/root/reference/testimage/01.pgm')
    cases = {
        "r1c5": np.ascontiguousarray(k1[100:132, 100:260]),   # R=1 slice
        "r3c5": np.ascontiguousarray(k1[60:156, 300:460]),    # multi-row
        "kodak01": k1,                                        # full grid
    }
    res = {}
    for name, im in cases.items():
        out, meta = wf._dispatch_batch([im], 2)
        res[name] = wf._fetch_lean(out, meta, PhaseTimer())
        print(f"{name} records fetched {res[name].shape}", flush=True)
    np.savez(f"/tmp/xplat_{plat}.npz", **res)
    if plat == "tpu":
        a = np.load("/tmp/xplat_cpu.npz")
        fail = False
        for name in cases:
            d = int((a[name] != res[name]).sum())
            print(f"cross {name:8s}: {'BIT-IDENTICAL' if d == 0 else f'DIFF {d}'}")
            fail |= d != 0
        sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
