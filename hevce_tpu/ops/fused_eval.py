"""Fused CU-candidate pipeline as ONE Pallas TPU kernel (VERDICT r4 item 1).

The dense candidate evaluation (residual -> fwd DST/DCT -> RDOQ quantize ->
dequant -> inverse transform -> reconstruct -> SSE; reference per-candidate
loop src/HEVCe.c:1422-1448) runs as ~10 separate XLA fusions per eval, each
staging its (lanes, K, sz, sz) intermediates through HBM — the round-4
xplane profile measured ~140 us of fixed fusion-boundary cost per eval and
0.67% MXU utilization at ~85 sequential evals per wavefront front step. This
module fuses the whole chain into one Pallas kernel whose intermediates stay
in VMEM/registers, with every matmul an int8 x int8 -> int32 MXU pass.

Layout (the part that makes it fast on the VPU/MXU):
  * candidate blocks flatten row-major to length nn = sz*sz vectors; all
    leading axes (lanes x modes) flatten to kernel ROWS;
  * for sz < 12 the natural lane count nn is far below the TPU's 128-lane
    vector width, so G = 128//nn whole blocks pack side by side into one
    128-lane row ("G-packing": a contiguous reshape (N, nn) -> (N/G, G*nn));
  * each transform stage becomes ONE constant matmul on the packed rows: the
    (sz, sz) two-sided stage M @ X / X @ M^T is expressed as a flat
    (nn, nn) operator on the vectorized block (a Kronecker rearrangement of
    the stage matrix), block-diagonal-tiled G times for packed rows. Rows
    only ever combine within their own block, so packing changes nothing.
  * per-coefficient-group (CG) sums, the CG-kill rule, and per-block SSE
    reductions are 0/1 segment-matrix matmuls on the same rows.

Exactness: identical int32 results to ops/xform.py + ops/quant.py (the
golden-tested device ops). Wide operands are base-128 digit-split so every
int8 matmul partial fits int32 exactly (ops/xform.exact_matmul rationale);
shifts/clips are ported verbatim. The toolchain probe (tools/pallas_probe.py)
validates int8-matmul exactness inside Pallas on the live backend, and
tests/test_fused_eval.py asserts bit-identity against the XLA ops for every
production shape.

This path is TPU-only (Mosaic kernels): the CPU/default backend keeps the
XLA op pipeline, and tools/verify_cross_platform.py proves the two produce
bit-identical fast-mode decision records.
"""
import functools
import os

import numpy as np

from hevce_tpu.ops import constants as C

_LANES = 128          # TPU vector lane width: pack G=_LANES//nn blocks/row
_TR = 128             # row-tile height for gridded (large) problems
_TR_CAP = 512         # single-tile cap: smaller problems run grid=1
I32_MAX = int(C.I32_MAX)


def enabled() -> bool:
    """Fused kernels ship ON for TPU backends, OFF elsewhere (Mosaic only
    lowers on TPU; the XLA path remains the reference semantics and the two
    are bit-identical). HEVCE_FUSED=0/1 overrides."""
    env = os.environ.get("HEVCE_FUSED", "").strip()
    if env:
        return env != "0"
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 — no backend: behave like CPU
        return False


# Sizes routed to the fused kernel by default. Live-TPU marginal per-eval
# A/B (tools/bench_fused.py, ROADMAP round 5): the fused kernel wins in
# isolation where XLA is overhead-bound on many tiny transposed ops (sz=4:
# 65.9 -> 29.8 us/eval at M=35) and loses where XLA's fusions are already
# lean (sz=8 M=12: 19.6 vs 56.7). HOWEVER, integrated into the wavefront
# front scan the kernel boundaries shatter XLA's fusion/layout planning —
# the xplane profile shows 310 us reduce ops over the kernel outputs'
# relaid-out views and a storm of small cross-memory copy-starts, 41.5 ms/
# front vs ~9 ms XLA-only, bench 8.4 -> 2.2 MP/s — so the default routing
# is EMPTY and the kernel is an env-gated option (HEVCE_FUSED_SZ=4) plus a
# validated building block for a future whole-front kernel. Full writeup:
# ROADMAP round-5 fused-kernel entry.
_DEFAULT_FUSED_SZ = frozenset()


def use_for(sz: int, M: int) -> bool:
    """Route one (size, mode-lane) eval shape to the fused kernel?
    HEVCE_FUSED_SZ='4,8' overrides the measured default set."""
    if not enabled():
        return False
    env = os.environ.get("HEVCE_FUSED_SZ", "").strip()
    if env:
        return sz in {int(s) for s in env.split(",") if s.strip()}
    return sz in _DEFAULT_FUSED_SZ


# ---------------------------------------------------------------- constants

@functools.lru_cache(maxsize=None)
def _flat_stage_mats(sz: int):
    """The four transform stages as flat (nn, nn) int8 operators on
    row-major vectorized blocks x[(i, j)] = X[i, j]:

      fwd1[(i,j),(k,j)] = M[i,k]      (tmp = M  @ X)
      fwd2[(i,j),(i,l)] = M[j,l]      (out = tmp @ M^T)
      inv1[(i,j),(k,j)] = M[k,i]      (tmp = M^T @ X)
      inv2[(i,j),(i,l)] = M[l,j]      (out = tmp @ M)

    Returned TRANSPOSED so the kernel computes rows @ mat directly
    (mat[in_flat, out_flat]). Entries are the transform matrix's (|.|<=90).
    """
    m = C.TRANSFORM_MAT[sz].astype(np.int64)
    nn = sz * sz
    f1 = np.zeros((nn, nn), np.int64)
    f2 = np.zeros((nn, nn), np.int64)
    i1 = np.zeros((nn, nn), np.int64)
    i2 = np.zeros((nn, nn), np.int64)
    for i in range(sz):
        for j in range(sz):
            o = i * sz + j
            for k in range(sz):
                f1[o, k * sz + j] = m[i, k]
                i1[o, k * sz + j] = m[k, i]
            for l in range(sz):
                f2[o, i * sz + l] = m[j, l]
                i2[o, i * sz + l] = m[l, j]
    # transpose: out = x_row @ mat with mat[in, out]
    return tuple(a.T.astype(np.int8).copy() for a in (f1, f2, i1, i2))


@functools.lru_cache(maxsize=None)
def _packed_consts(sz: int, G: int):
    """G-block-diagonal packed stage operators + CG / block segment
    matrices, as numpy int8."""
    nn = sz * sz
    eye = np.eye(G, dtype=np.int8)
    packed = tuple(np.kron(eye, a) for a in _flat_stage_mats(sz))

    ncg = max(1, (sz // C.CG_SZ) ** 2)
    cg_of = np.zeros(nn, np.int64)
    if sz >= C.CG_SZ:
        for i in range(sz):
            for j in range(sz):
                cg_of[i * sz + j] = (i // C.CG_SZ) * (sz // C.CG_SZ) \
                    + (j // C.CG_SZ)
    seg = np.zeros((nn, ncg), np.int8)
    seg[np.arange(nn), cg_of] = 1
    cg_fwd = np.kron(eye, seg)                       # (G*nn, G*ncg)
    cg_bwd = np.kron(eye, seg.T.copy())              # (G*ncg, G*nn)
    blk_seg = np.kron(eye, np.ones((nn, 1), np.int8))  # (G*nn, G) block sums
    return packed, cg_fwd, cg_bwd, blk_seg, ncg


# ------------------------------------------------------------------ kernel

def _mm_i8(jnp, x, mat_ref, bits: int):
    """x @ mat exactly, |x| < 2^bits: base-128 digit split into int8 MXU
    matmuls (ops/xform.exact_matmul, kernel-local form); bits <= 7 needs no
    split at all."""
    ndig = 1 if bits <= 7 else max(2, -(-(bits - 7) // 7) + 1)
    mat = mat_ref[...]
    out = None
    r = x
    for k in range(ndig):
        d = (r & 127) if k < ndig - 1 else r
        r = r >> 7
        p = jnp.matmul(d.astype(jnp.int8), mat,
                       preferred_element_type=jnp.int32)
        out = p if out is None else out + (p << (7 * k))
    return out


def _make_kernel(sz: int, qpd6: int):
    """Kernel body: pred/blk (TR, G*nn) u8 rows + 7 constant operators ->
    q i32 (TR, G*nn), recon i32 (TR, G*nn), sse i32 (TR, G). Exact port of
    cu_eval._pipeline + rdcost.block_sse."""
    import jax.numpy as jnp
    from jax import lax

    a_sft = int(C.FWD_SHIFT_A[sz])
    b_sft = a_sft + 7
    dist_sft = int(C.QUANT_DIST_SHIFT[sz])
    sft = int(C.QUANT_LEVEL_SHIFT[sz]) + qpd6
    add = 1 << sft >> 1
    max_dlevel = I32_MAX - add
    thr = 9 << sft >> 2
    q_sft = int(C.DEQUANT_SHIFT[sz]) + qpd6
    wd = int(C.RDCOST_WEIGHT_DIST[qpd6])
    wb = int(C.RDCOST_WEIGHT_BITS[qpd6])
    cmin, cmax = int(C.COEF_MIN), int(C.COEF_MAX)
    lvl_tab = [int(v) for v in C.LEVEL_RATE_TABLE[:6]]

    def rnd(x, s):
        return (x + (1 << s >> 1)) >> s

    def clip16(x):
        return jnp.clip(x, cmin, cmax)

    def rate_of(lv):
        # estimateCoeffRate (src/HEVCe.c:526-535): 6-entry unrolled table +
        # the f32-exponent log2 form (ops/quant.estimate_coeff_rate)
        small = jnp.full_like(lv, lvl_tab[5])
        for k in range(5):
            small = jnp.where(lv == k, lvl_tab[k], small)
        vp1 = jnp.maximum(lv - 5, 1).astype(jnp.float32)
        i = (lax.bitcast_convert_type(vp1, jnp.int32) >> 23) - 127
        return jnp.where(lv < 6, small, 92000 + ((4 + 2 * i) << 15))

    def kern(pred_ref, blk_ref, f1_ref, f2_ref, i1_ref, i2_ref,
             cgf_ref, cgb_ref, bs_ref, q_ref, rec_ref, sse_ref):
        p = pred_ref[...].astype(jnp.int32)
        b = blk_ref[...].astype(jnp.int32)
        resid = b - p
        # forward transform (src/HEVCe.c:469-516 semantics, flat operators)
        tmp = rnd(_mm_i8(jnp, resid, f1_ref, 10), a_sft)
        coef = rnd(_mm_i8(jnp, tmp, f2_ref, 18), b_sft)
        # RDOQ quantize (src/HEVCe.c:526-592 / ops/quant.quantize)
        absval = jnp.abs(coef)
        dlevel = jnp.where(absval > 0x1FFFF, max_dlevel,
                           jnp.minimum((absval & 0x1FFFF) << 14, max_dlevel))
        level0 = jnp.clip((dlevel + add) >> sft, cmin, cmax)

        def cost_of(lv):
            d1 = jnp.abs(dlevel - (lv << sft)) >> dist_sft
            dist = jnp.where(d1 < 46340, d1 * d1, I32_MAX) >> 7
            r = rate_of(lv)
            c1 = jnp.where(I32_MAX // wd <= dist, I32_MAX, wd * dist)
            c2 = jnp.where(I32_MAX // wb <= r, I32_MAX, wb * r)
            return jnp.where(I32_MAX - c1 <= c2, I32_MAX, c1 + c2)

        best_l, best_c = level0, cost_of(level0)
        for dd in (1, 2):
            lv = level0 - dd
            valid = level0 >= dd
            cst = cost_of(jnp.maximum(lv, 0))
            take = valid & (cst < best_c)
            best_l = jnp.where(take, lv, best_l)
            best_c = jnp.where(take, cst, best_c)
        signed = jnp.where(coef < 0, -best_l, best_l)
        # per-CG kill rule: CG sums via the 0/1 segment matmul; dl <= thr
        # so the digit split at 26 bits covers every qpd6
        dl = jnp.minimum(dlevel, thr)
        cg_sum = _mm_i8(jnp, dl, cgf_ref, 26)         # (TR, G*ncg)
        keep = (cg_sum >= thr).astype(jnp.int32)
        keep_full = _mm_i8(jnp, keep, cgb_ref, 2)     # back to (TR, G*nn)
        q = jnp.where(keep_full > 0, signed, 0)
        q_ref[...] = q
        # dequant + inverse transform + reconstruct
        dq = clip16(q << q_sft)
        t1 = clip16(rnd(_mm_i8(jnp, dq, i1_ref, 16), 7))
        r2 = clip16(rnd(_mm_i8(jnp, t1, i2_ref, 16), 12))
        recon = jnp.clip(r2 + p, 0, 255)
        rec_ref[...] = recon
        d = b - recon
        sse_ref[...] = _mm_i8(jnp, d * d, bs_ref, 17)  # per-block row sums

    return kern


@functools.lru_cache(maxsize=None)
def _caller(sz: int, qpd6: int, G: int, rows: int):
    """pallas_call wrapper for a (rows, G*nn) packed problem; rows must be
    a multiple of the tile chosen here (see _pad_rows)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    kern = _make_kernel(sz, qpd6)
    consts, cg_f, cg_b, blk_m, ncg = _packed_consts(sz, G)
    # numpy, NOT jnp: _caller is lru_cached across traces, and a jnp array
    # materialized inside one jit trace is that trace's tracer (leak)
    const_arrs = [np.ascontiguousarray(a) for a in (*consts, cg_f, cg_b, blk_m)]
    nn = sz * sz
    L = G * nn
    TR = rows if rows <= _TR_CAP else _TR
    assert rows % TR == 0
    grid = rows // TR
    # off-TPU (tests, CPU fallback with HEVCE_FUSED=1): interpret mode runs
    # the same kernel logic through lax — bit-identical, just slow
    interpret = jax.default_backend() != "tpu"

    def io_spec(width):
        return pl.BlockSpec((TR, width), lambda i: (i, 0))

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0))

    def call(pred2, blk2):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[io_spec(L), io_spec(L)] + [const_spec(a)
                                                for a in const_arrs],
            out_specs=(io_spec(L), io_spec(L), io_spec(G)),
            out_shape=(jax.ShapeDtypeStruct((rows, L), jnp.int32),
                       jax.ShapeDtypeStruct((rows, L), jnp.int32),
                       jax.ShapeDtypeStruct((rows, G), jnp.int32)),
            interpret=interpret,
        )(pred2, blk2, *const_arrs)

    return call


def _pad_rows(rows_raw: int) -> int:
    """small problems: one tile, sublane-aligned; large: _TR-tile grid."""
    if rows_raw <= _TR_CAP:
        return -(-rows_raw // 8) * 8
    return -(-rows_raw // _TR) * _TR


# -------------------------------------------------------------- public API

def pipeline_sse(sz: int, qpd6: int, pred, blk):
    """Fused drop-in for cu_eval._pipeline + rdcost.block_sse.

    pred (..., M, sz, sz) uint8 candidate predictions, blk (..., sz, sz)
    uint8 originals. Returns (q int16 (..., M, sz, sz),
    recon uint8 (..., M, sz, sz), sse int32 (..., M)) — bit-identical to the
    XLA op pipeline (tests/test_fused_eval.py)."""
    import jax.numpy as jnp

    nn = sz * sz
    G = max(1, _LANES // nn)
    lead = pred.shape[:-2]            # (..., M)
    N = 1
    for s in lead:
        N *= int(s)
    rows = _pad_rows(-(-N // G))
    Np = rows * G

    p2 = pred.reshape(N, nn)
    b2 = jnp.broadcast_to(blk[..., None, :, :],
                          blk.shape[:-2] + (pred.shape[-3], sz, sz)
                          ).reshape(N, nn)
    if Np != N:
        pad = ((0, Np - N), (0, 0))
        p2 = jnp.pad(p2, pad)
        b2 = jnp.pad(b2, pad)
    call = _caller(sz, qpd6, G, rows)
    q, rec, sseg = call(p2.reshape(rows, G * nn), b2.reshape(rows, G * nn))
    q = q.reshape(Np, nn)[:N].astype(jnp.int16).reshape(lead + (sz, sz))
    rec = rec.reshape(Np, nn)[:N].astype(jnp.uint8).reshape(lead + (sz, sz))
    sse = sseg.reshape(Np)[:N].reshape(lead)
    return q, rec, sse
