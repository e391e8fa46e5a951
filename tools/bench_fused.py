#!/usr/bin/env python3
"""Live-backend A/B of the fused Pallas eval kernel vs the XLA op pipeline.

Timing through the axon tunnel is RTT-dominated (a trivial program costs
~23 ms wall end-to-end), so marginal per-eval cost comes from TWO scan
lengths: (wall(n2) - wall(n1)) / (n2 - n1). Each scan body is one
production-shaped eval with an iteration-dependent input (prevents CSE/
hoisting). Also asserts the fused kernel's outputs are bit-identical to the
XLA ops on the live backend.

Usage: python tools/bench_fused.py [sz,M ...]   (default: 8,12 4,35)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BR = 288                      # B=18 x R=16 production lanes
N1 = int(os.environ.get("BF_N1", "32"))
N2 = int(os.environ.get("BF_N2", "160"))


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from hevce_tpu.models import cu_eval
    from hevce_tpu.ops import fused_eval, rdcost

    print("backend:", jax.default_backend())
    shapes = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] \
        or [(8, 12), (4, 35)]

    for sz, M in shapes:
        rng = np.random.default_rng(sz + M)
        pred = jnp.asarray(rng.integers(0, 256, (BR, M, sz, sz)), jnp.uint8)
        blk = jnp.asarray(rng.integers(0, 256, (BR, sz, sz)), jnp.uint8)

        def xla_eval(p, b):
            q, r = cu_eval._pipeline(sz, qpd6=2, pred=p, blk_orig=b)
            sse = rdcost.block_sse(b[:, None], r)
            return q, r, sse

        def fused(p, b):
            return fused_eval.pipeline_sse(sz, 2, p, b)

        # live-backend bit-identity
        qw, rw, sw = jax.jit(xla_eval)(pred, blk)
        qg, rg, sg = jax.jit(fused)(pred, blk)
        okq = np.array_equal(np.asarray(qg), np.asarray(qw))
        okr = np.array_equal(np.asarray(rg), np.asarray(rw))
        oks = np.array_equal(np.asarray(sg), np.asarray(sw))
        print(f"sz={sz} M={M}: exactness q={'OK' if okq else 'BAD'} "
              f"r={'OK' if okr else 'BAD'} sse={'OK' if oks else 'BAD'}")
        if not (okq and okr and oks):
            continue

        def chain(ev, n):
            @jax.jit
            def run(p, b):
                def body(c, _):
                    pc = jnp.clip(p.astype(jnp.int32)
                                  + c[None, None, None, None], 0, 255) \
                        .astype(jnp.uint8)
                    q, r, sse = ev(pc, b)
                    return (c + 1 + (q.astype(jnp.int32).sum()
                                     + sse.sum()) % 2).astype(jnp.int32), ()
                out, _ = lax.scan(body, jnp.int32(0), None, length=n)
                return out
            return lambda: np.asarray(run(pred, blk))

        for name, ev in (("xla  ", xla_eval), ("fused", fused)):
            r1, r2 = chain(ev, N1), chain(ev, N2)
            r1()  # compile
            r2()
            t1, t2 = timeit(r1), timeit(r2)
            marg = (t2 - t1) / (N2 - N1) * 1e6
            print(f"  {name}: {marg:8.1f} us/eval  "
                  f"(walls {t1 * 1e3:6.1f} / {t2 * 1e3:6.1f} ms)")


if __name__ == "__main__":
    main()
