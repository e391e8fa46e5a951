#!/usr/bin/env python3
"""Feasibility probes for the fused-front-core Pallas work (VERDICT r4 #1).

Measures, on the live backend:
  P1  pallas_call launch overhead: trivial kernel iterated in a lax.scan
  P2  int8 x int8 -> int32 matmul inside a Pallas kernel (MXU int8 path)
  P3  a fused 4x4 eval pipeline (predict-matmul -> resid -> DST4 Kronecker
      fwd -> RDOQ quant -> dequant -> inv -> recon -> SSE) as ONE kernel,
      vs the same math as plain jnp/XLA inside a scan, at matched shapes
      -- correctness vs the jnp ops (bit-exact) + marginal us/eval.

Each probe prints one line; failures print the exception and continue.
Timing: end-to-end wall with a real np.asarray fetch (block_until_ready is
unreliable through the axon tunnel, CLAUDE.md).
"""
import functools
import os
import sys
import time

import numpy as np

# hevce_tpu import path when run as a script. NOTE: do NOT use
# PYTHONPATH=/root/repo for TPU runs instead — it breaks the axon PJRT
# plugin registration (backend 'axon' vanishes from the known list).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def probe_launch_overhead():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    def call(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    def runner(N):
        @jax.jit
        def run(x):
            def body(c, _):
                return call(c), ()
            y, _ = lax.scan(body, x, None, length=N)
            return y
        return run

    x = jnp.zeros((8, 128), jnp.int32)
    r1, r2 = runner(64), runner(1024)
    assert np.asarray(r1(x))[0, 0] == 64
    assert np.asarray(r2(x))[0, 0] == 1024
    d1 = _timeit(lambda: np.asarray(r1(x)))
    d2 = _timeit(lambda: np.asarray(r2(x)))
    # two lengths separate the fixed dispatch+RTT from the per-iter cost
    print(f"P1 launch-overhead: {(d2 - d1) / (1024 - 64) * 1e6:.2f} us/iter "
          f"(walls {d1 * 1e3:.1f} / {d2 * 1e3:.1f} ms at 64 / 1024 iters)")


def probe_int8_matmul():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, Nn = 512, 64, 64
    rng = np.random.default_rng(0)
    a = rng.integers(-128, 128, (M, K)).astype(np.int8)
    b = rng.integers(-128, 128, (K, Nn)).astype(np.int8)
    want = a.astype(np.int32) @ b.astype(np.int32)

    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.matmul(a_ref[...], b_ref[...],
                                preferred_element_type=jnp.int32)

    got = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, Nn), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))
    ok = np.array_equal(np.asarray(got), want)
    print(f"P2 int8-matmul-in-pallas: {'EXACT' if ok else 'MISMATCH'}")


def _kron_stage(sz):
    """(sz^2, sz^2) int8 constant: stage-1 fwd transform as one matmul on
    row-major flattened blocks: out[(i,j)] = sum_k M[i,k] x[(k,j)]."""
    from hevce_tpu.ops.constants import TRANSFORM_MAT
    m = TRANSFORM_MAT[sz]
    K1 = np.zeros((sz * sz, sz * sz), np.int64)
    for i in range(sz):
        for j in range(sz):
            for k in range(sz):
                K1[i * sz + j, k * sz + j] = m[i, k]
    K2 = np.zeros((sz * sz, sz * sz), np.int64)  # out[(i,j)] = sum_l t[(i,l)] M[j,l]
    for i in range(sz):
        for j in range(sz):
            for l in range(sz):
                K2[i * sz + j, i * sz + l] = m[j, l]
    return K1.astype(np.int8), K2.astype(np.int8)


def probe_fused_pipeline():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hevce_tpu.ops import constants as C
    from hevce_tpu.ops import quant as qops
    from hevce_tpu.ops import xform

    sz, qpd6 = 4, 2
    BR = 512                       # lanes (B=32 x R=16 class)
    MODES = 35
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 256, (BR, MODES, sz, sz)).astype(np.uint8)
    blk = rng.integers(0, 256, (BR, sz, sz)).astype(np.uint8)

    # reference jnp pipeline (cu_eval._pipeline + SSE), as scanned today
    @jax.jit
    def jnp_chain(pred, blk, n):
        def body(c, _):
            p = jnp.clip(pred + c[None, None, None].astype(jnp.uint8), 0, 255)
            resid = (blk[:, None].astype(jnp.int16) - p.astype(jnp.int16))
            coef = xform.forward_transform(sz, resid)
            q = qops.quantize(sz, qpd6, coef)
            dq = qops.dequantize(sz, qpd6, q)
            r = xform.inverse_transform(sz, dq)
            recon = jnp.clip(r.astype(jnp.int32) + p, 0, 255).astype(jnp.uint8)
            sse = ((blk[:, None].astype(jnp.int32) - recon) ** 2).sum((-1, -2))
            return c + (q.astype(jnp.int32).sum() + sse.sum()) % 3, ()
        out, _ = lax.scan(body, jnp.int32(0), None, length=16)
        return out

    K1, K2 = _kron_stage(sz)
    a_sft = int(C.FWD_SHIFT_A[sz])

    # fused Pallas version of ONE pipeline eval, layout (BR, 35*nn)
    nn = sz * sz
    W = MODES * nn

    def kern(pred_ref, blk_ref, k1_ref, k2_ref, ik1_ref, ik2_ref, seg_ref,
             segt_ref, q_ref, sse_ref):
        p = pred_ref[...].astype(jnp.int32)            # (BR, W)
        b = blk_ref[...].astype(jnp.int32)             # (BR, W) pre-tiled
        resid = b - p
        k1 = k1_ref[...]
        k2 = k2_ref[...]

        def mm(x, m_i8, bits):
            ndig = max(2, -(-(bits - 7) // 7) + 1)
            out = None
            r = x
            for k in range(ndig):
                d = (r & 127) if k < ndig - 1 else r
                r = r >> 7
                pp = jnp.matmul(d.astype(jnp.bfloat16),
                                m_i8.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.int32)
                out = pp if out is None else out + (pp << (7 * k))
            return out

        def segsum(x, bits):
            # (BR, W) -> (BR, MODES): per-mode sums via the constant 0/1
            # segment matrix (Mosaic cannot shape-cast (BR, W)->(BR, M, nn))
            return mm(x, seg_ref[...], bits)

        tmp = (mm(resid, k1, 10) + (1 << a_sft >> 1)) >> a_sft
        coef = (mm(tmp, k2, 18) + (1 << (a_sft + 7) >> 1)) >> (a_sft + 7)

        # RDOQ quantize (ops/quant.py, closed form)
        dist_sft = C.QUANT_DIST_SHIFT[sz]
        sft = C.QUANT_LEVEL_SHIFT[sz] + qpd6
        add = 1 << sft >> 1
        I32M = int(C.I32_MAX)
        maxd = I32M - add
        thr = 9 << sft >> 2
        absval = jnp.abs(coef)
        dlevel = jnp.where(absval > 0x1FFFF, maxd,
                           jnp.minimum((absval & 0x1FFFF) << 14, maxd))
        level0 = jnp.clip((dlevel + add) >> sft, C.COEF_MIN, C.COEF_MAX)
        wd = int(C.RDCOST_WEIGHT_DIST[qpd6])
        wb = int(C.RDCOST_WEIGHT_BITS[qpd6])

        def rate_of(lv):
            small = jnp.full_like(lv, int(C.LEVEL_RATE_TABLE[5]))
            for k in range(5):
                small = jnp.where(lv == k, int(C.LEVEL_RATE_TABLE[k]), small)
            vp1 = jnp.maximum(lv - 5, 1).astype(jnp.float32)
            i = (lax.bitcast_convert_type(vp1, jnp.int32) >> 23) - 127
            return jnp.where(lv < 6, small, 92000 + ((4 + 2 * i) << 15))

        def cost_of(lv):
            d1 = jnp.abs(dlevel - (lv << sft)) >> dist_sft
            dist = jnp.where(d1 < 46340, d1 * d1, I32M) >> 7
            r = (rate_of(lv) + (1 << 14)) >> 15
            c = wd * dist + wb * r
            big = (dist > (I32M - wb * r) // wd)
            return jnp.where(big, I32M, c)

        best_l, best_c = level0, cost_of(level0)
        for dd in (1, 2):
            lv = level0 - dd
            valid = level0 >= dd
            cst = cost_of(jnp.maximum(lv, 0))
            take = valid & (cst < best_c)
            best_l = jnp.where(take, lv, best_l)
            best_c = jnp.where(take, cst, best_c)
        signed = jnp.where(coef < 0, -best_l, best_l)
        dl = jnp.minimum(dlevel, thr)
        cg = segsum(dl, 26)                            # (BR, MODES); sz=4: 1 CG
        # expand (BR, MODES) -> (BR, W) via the transposed segment matrix:
        # one nonzero per row and |cg| < 2^26 -> f32 matmul partials... use
        # the same digit-split mm for exactness
        keepm = (cg >= thr).astype(jnp.int32)          # 0/1
        keep = jnp.matmul(keepm.astype(jnp.bfloat16),
                          segt_ref[...].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(jnp.int32)
        q = jnp.where(keep > 0, signed, 0)
        q_ref[...] = q

        dq = jnp.clip(q << (C.DEQUANT_SHIFT[sz] + qpd6), C.COEF_MIN, C.COEF_MAX)
        t1 = jnp.clip((mm(dq, ik1_ref[...], 16)
                       + (1 << 6)) >> 7, C.COEF_MIN, C.COEF_MAX)
        r2 = jnp.clip((mm(t1, ik2_ref[...], 16)
                       + (1 << 11)) >> 12, C.COEF_MIN, C.COEF_MAX)
        recon = jnp.clip(r2 + p, 0, 255)
        d = b - recon
        sse_ref[...] = segsum(d * d, 17)

    eye = np.eye(MODES, dtype=np.int8)
    k1c = jnp.asarray(np.kron(eye, K1))
    k2c = jnp.asarray(np.kron(eye, K2))
    ik1c = jnp.asarray(np.kron(eye, _kron_inv(sz)[0]))
    ik2c = jnp.asarray(np.kron(eye, _kron_inv(sz)[1]))
    segc = jnp.asarray(np.kron(eye, np.ones((nn, 1), np.int8)))  # (W, MODES)
    segtc = jnp.asarray(np.kron(eye, np.ones((1, nn), np.int8)))  # (MODES, W)

    def call(pred2, blk2):
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((BR, W), jnp.int32),
                       jax.ShapeDtypeStruct((BR, MODES), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        )(pred2, blk2, k1c, k2c, ik1c, ik2c, segc, segtc)

    @jax.jit
    def pallas_chain(pred, blk, n):
        pred2 = pred.reshape(BR, W)
        blk2 = jnp.tile(blk.reshape(BR, 1, nn), (1, MODES, 1)).reshape(BR, W)

        def body(c, _):
            q, sse = call(jnp.clip(pred2 + c.astype(jnp.uint8), 0, 255), blk2)
            return c + (q.sum() + sse.sum()) % 3, ()
        out, _ = lax.scan(body, jnp.int32(0), None, length=16)
        return out

    # correctness: one eval, pallas vs jnp ops
    jp, jb = jnp.asarray(pred), jnp.asarray(blk)
    resid = (blk[:, None].astype(np.int16) - pred.astype(np.int16))
    coef = xform.forward_transform(sz, jnp.asarray(resid))
    q_want = np.asarray(qops.quantize(sz, qpd6, coef)).reshape(BR, W)
    dq = qops.dequantize(sz, qpd6, jnp.asarray(q_want.reshape(BR, MODES, sz, sz)))
    rinv = xform.inverse_transform(sz, dq)
    recon_w = np.clip(np.asarray(rinv).astype(np.int64)
                      + pred.astype(np.int64), 0, 255)
    sse_want = ((blk[:, None, :, :].astype(np.int64) - recon_w) ** 2
                ).sum((-1, -2)).astype(np.int32)
    q_got, sse_got = call(jp.reshape(BR, W),
                          jnp.tile(jb.reshape(BR, 1, nn),
                                   (1, MODES, 1)).reshape(BR, W))
    okq = np.array_equal(np.asarray(q_got), q_want)
    oks = np.array_equal(np.asarray(sse_got), sse_want)
    print(f"P3 fused-pipeline correctness: quant "
          f"{'EXACT' if okq else 'MISMATCH'}, sse {'EXACT' if oks else 'MISMATCH'}")

    np.asarray(jnp_chain(jp, jb, 0))
    np.asarray(pallas_chain(jp, jb, 0))
    tj = _timeit(lambda: np.asarray(jnp_chain(jp, jb, 0)))
    tp = _timeit(lambda: np.asarray(pallas_chain(jp, jb, 0)))
    print(f"P3 16-eval scan: jnp/XLA {tj * 1e3:.1f} ms "
          f"({tj / 16 * 1e6:.0f} us/eval)  pallas {tp * 1e3:.1f} ms "
          f"({tp / 16 * 1e6:.0f} us/eval)")


@functools.lru_cache(maxsize=None)
def _kron_inv(sz):
    """inverse-transform stages as Kronecker constants: stage1
    out[(i,j)] = sum_k M[k,i] x[(k,j)]  (M^T @ x); stage2
    out[(i,j)] = sum_l t[(i,l)] M[l,j]  (t @ M)."""
    from hevce_tpu.ops.constants import TRANSFORM_MAT
    m = TRANSFORM_MAT[sz]
    A = np.zeros((sz * sz, sz * sz), np.int64)
    for i in range(sz):
        for j in range(sz):
            for k in range(sz):
                A[i * sz + j, k * sz + j] = m[k, i]
    B = np.zeros((sz * sz, sz * sz), np.int64)
    for i in range(sz):
        for j in range(sz):
            for l in range(sz):
                B[i * sz + j, i * sz + l] = m[l, j]
    return A.astype(np.int8), B.astype(np.int8)


if __name__ == "__main__":
    import jax
    print("backend:", jax.default_backend())
    for p in (probe_launch_overhead, probe_int8_matmul, probe_fused_pipeline):
        try:
            p()
        except Exception as e:  # noqa: BLE001
            print(f"{p.__name__} FAILED: {type(e).__name__}: {e}")
