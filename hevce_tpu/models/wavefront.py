"""Wavefront fast mode: device-side greedy RDO over anti-diagonal CTU fronts.

Why this exists (SURVEY §2.4 SP row, VERDICT r1 item 4): the reference's RD
decisions rate every candidate against the LIVE CABAC coder state, which flows
through the slice in strict raster order (reference src/HEVCe.c:1578-1624).
A decision at CTU (r, c) therefore depends on every bin of every CTU before
it in raster order — including CTUs to its RIGHT in the previous row that are
on the same anti-diagonal front. Bit-exact cross-CTU wavefront *decisions*
are impossible; only the candidate *math* has the classic wavefront lattice
(recon deps: left, above, above-right — src/HEVCe.c:1614-1618).

This module is the TPU-native answer: a clearly-flagged NON-bit-exact
"serving" mode (ROADMAP Phase C) that makes greedy decisions on device using
an estimated rate model instead of live-CABAC trial encodes. That breaks the
raster decision chain, so whole anti-diagonal fronts of CTUs (2r + c = d,
the HEVC WPP skew: left/above/above-right/above-left all land on earlier
fronts) are searched as ONE batched tensor program. The host then emits an
exact, standard-compliant stream in a single CABAC pack pass over the chosen
forest (csrc pack_stream; real contexts, real arithmetic coding) — the
stream decodes bit-exactly to the device-computed reconstruction, verified
by the independent decoder (runtime/native.decode_stream_native).

The greedy rate model (round 3; closes the round-2 quality gap):
  * coefficient bits: the reference's own estimateCoeffRate table
    (src/HEVCe.c:526-535), as before;
  * pmode bits: MPM-aware (3-entry probable-mode derivation per
    src/HEVCe.c:958-977; 2/3/6-bit signalling estimate) with a real
    neighbor-pmode map threaded through the CTU z-order walk (left-CTU edge
    pmodes ride the scan carry; above-CTU pmode is DC by the reference's
    non-scrolling line-buffer rule, src/HEVCe.c:1636);
  * last-significant-XY bits: exact last scan position per candidate
    (gather-free: constant inverse-scan vectors + one-hot coordinate sums)
    fed through the H.265 last-XY group-code length;
  * per-layout header constants replacing round-2's single flat constant;
  * sub-bit pricing (late round 3, worth ~0.25 dB): CABAC *context* bins
    cost CTX_BIT = 0.75 bit (adapted contexts average under a bit; pricing
    them at 1 bit made the greedy under-split — image 13: 176 TU-split
    leaves vs the exact encoder's 1521), and the sig-map bins of zeros
    scanned before the last significant coefficient — absent from the
    level-rate table — cost SIG_ZERO = 0.30 bit each, EXCEPT zeros in
    all-zero middle coefficient groups, which the real coder skips with
    one sig_cg flag (CG_BIN each per middle group; reference put_coef
    sig_cg semantics, src/HEVCe.c:1199-1212). Knobs tuned on a 6-image
    Kodak subset (full sweep tables in ROADMAP round 3).
All 3 partitions are searched per 8x8 leaf: 2Nx2N single-TU, 2Nx2N TU-split,
and NxN (4 independent 4x4 PUs with chained winner recon + the reference's
MPM neighbor wiring, src/HEVCe.c:1491-1557) — round 2 skipped NxN entirely.

The bit-exact reference-identical path remains the default everywhere; this
mode trades reference-identical bytes for device-speed encoding.

Storage is SKEWED at CTU granularity so every front is a static-shape column:
tile (r, c) lives at front column 2*r + c. The whole slice is ONE jitted
lax.scan over front-major columns with a 3-column recon-window carry (see
_make_front_core) — no gathers (this backend compiles dynamic gathers
pathologically, CLAUDE.md) and no per-front dynamic slicing of the big
skewed arrays (measured to dominate the step cost on v5e).
"""
import functools
import os

import numpy as np

from hevce_tpu.models import cu_eval
from hevce_tpu.ops import quant as qops
from hevce_tpu.ops import rdcost
from hevce_tpu.runtime import native

CTU = 32
MODES = 35
DC = 1
# Estimated rates live in the reference's own <<15 fixed-point bit domain
# (estimateCoeffRate scale, src/HEVCe.c:526-535). Bypass bins cost exactly
# BIT; CABAC *context* bins are priced at CTX_BIT < BIT because adapted
# contexts average well under a bit — pricing them at 1 bit systematically
# overcharged the layouts that differ by a few context bins (TU-split pays
# +3 Y-cbf bins + 3 last-XY prefixes vs single-TU; a split pays 4 child
# headers), which made the greedy under-split vs the exact encoder
# (measured: image 13 exact picks 8x8 TU-split 1521 times, the 1-bit model
# 176). CTX_BIT was tuned on a 6-image Kodak subset (see ROADMAP round 3).
BIT = 1 << 15


def _env_bits(name: str, default: int) -> int:
    """Rate-model knob override in BITS (float), e.g. HEVCE_CTX_BIT=0.80.
    Read once at import; the knobs reshape every compiled front core, so
    they are process-level by design (tests pin them in conftest)."""
    v = os.environ.get(name, "").strip()
    if not v:
        return default
    try:
        bits = float(v)
    except ValueError:
        raise ValueError(f"{name} must be a float bit count, got {v!r}") \
            from None
    if not 0.0 <= bits <= 4.0:
        raise ValueError(f"{name}={bits} outside the sane [0, 4] bit range")
    return int(round(bits * BIT))


CTX_BIT = _env_bits("HEVCE_CTX_BIT", 24576)   # 0.75 bit per context bin
SIG_ZERO = _env_bits("HEVCE_SIG_ZERO", 9830)  # 0.30 bit per pre-last zero
CG_BIN = CTX_BIT              # sig_cg flag of a middle coefficient group


def _ctx_default(qpd6: int) -> int:
    """Per-qpd6 default context-bin price. qpd6=1 measured wanting a
    cheaper price than the qpd6=2-tuned 0.75: full-24 Kodak at a global
    0.60 improves mean dPSNR −0.371 → −0.273 at ×1.0006 → ×1.0060 size
    (ROADMAP round 5; the rate-density degradation is monotone in
    quantization fineness, and q1's median bpp ≈ 3.5 sits in the regime
    the q2 sweep priced at 0.60). An explicit HEVCE_CTX_BIT overrides
    every level (the knob's documented semantic)."""
    if os.environ.get("HEVCE_CTX_BIT", "").strip():
        return CTX_BIT
    return int(0.60 * BIT) if qpd6 == 1 else CTX_BIT
HALF = 1 << 14                # fixed->integer-bit rounding
# per-layout header context-bin counts: a non-split CU writes split_cu
# (sz>=16) or part_size (sz==8) [1] + UV pmode [1] + 2x UV cbf [2] +
# TU-split flag [1, layouts 1/2 only] + Y cbf [1 per TU]. The packed
# stream's real header bits come from the exact CABAC pass; these only
# steer the greedy decisions.
HDR_LAY1_BINS = 6             # flag + uv + 2 uvcbf + tusplit + 1 ycbf
HDR_LAY2_BINS = 9             # flag + uv + 2 uvcbf + tusplit + 4 ycbf
HDR_NXN_BINS = 4              # part + uv + 2 uvcbf (per-PU ycbf per PU)

_SUB = ((0, 0), (0, 1), (1, 0), (1, 1))   # z-order, units of half-size


def _est_rate(q, axes):
    """greedy coefficient-rate estimate: reference estimateCoeffRate summed
    over the block (<<15 fixed point)."""
    import jax.numpy as jnp
    return qops.estimate_coeff_rate(jnp.abs(q)).sum(axes)


def _mpm_triplet(pml, pma):
    """(lanes,) neighbor pmodes -> three (lanes,) most-probable modes
    (reference MPM derivation, src/HEVCe.c:958-977)."""
    import jax.numpy as jnp
    pml = pml.astype(jnp.int32)
    pma = pma.astype(jnp.int32)
    neq = pml != pma
    gt1 = pml > 1
    e0 = jnp.where(gt1, pml, 0)
    e1 = jnp.where(gt1, ((pml + 29) % 32) + 2, 1)
    e2 = jnp.where(gt1, ((pml - 1) % 32) + 2, 26)
    u2 = jnp.where((pml != 0) & (pma != 0), 0,
                   jnp.where(pml + pma < 2, 26, 1))
    m0 = jnp.where(neq, pml, e0)
    m1 = jnp.where(neq, pma, e1)
    m2 = jnp.where(neq, u2, e2)
    return m0, m1, m2


def _pmode_rate(pml, pma, ctxv):
    """(lanes,) neighbor pmodes -> (lanes, 35) estimated pmode signalling
    rate (<<15): 3-entry MPM derivation (reference src/HEVCe.c:958-977) —
    1 context bin (priced at the per-lane ctxv) + 1/2/5 bypass bits for MPM
    hit 0 / hits 1-2 / miss. Matches the reference's last-match-wins hit
    scan (no break in the j loop)."""
    import jax.numpy as jnp
    m0, m1, m2 = _mpm_triplet(pml, pma)
    modes = jnp.arange(MODES, dtype=jnp.int32)
    cv = ctxv[:, None]
    bits = jnp.broadcast_to(cv + 5 * BIT, pml.shape + (MODES,))
    bits = jnp.where(modes[None, :] == m0[:, None], cv + BIT, bits)
    bits = jnp.where(modes[None, :] == m1[:, None], cv + 2 * BIT, bits)
    bits = jnp.where(modes[None, :] == m2[:, None], cv + 2 * BIT, bits)
    return bits


def _np_group_rate(v, gmax: int):
    """H.265 last-XY coordinate code rate components (numpy, setup time):
    prefix ctx-bin COUNT (group-index ones + terminating zero if below
    gmax) and bypass suffix bits ((g-2)>>1 for g>3). Reference put_last_xy
    semantics (src/HEVCe.c:1046-1087); v in [0, 31]."""
    from hevce_tpu.bitstream import syntax as syn
    g = syn.GROUP_INDEX[v]
    ctx = g + (g < gmax).astype(np.int32)
    byp = np.where(g > 3, (g - 2) >> 1, 0)
    return ctx, byp


@functools.lru_cache(maxsize=None)
def _scan_consts(sz: int):
    """Constant vectors for the last-XY estimate, per scan type: inverse
    scan (flat pixel position -> scan index), the last-XY context-bin
    COUNT and bypass rate (<<15) if the last significant coefficient sits
    at that pixel (group-code lengths precomputed at setup, SCAN_VER's x/y
    swap folded in; the ctx count is kept separate so the per-lane ctx
    price multiplies at trace time). Plus the per-mode scan type
    (src/HEVCe.c:1134-1150)."""
    from hevce_tpu.bitstream import syntax as syn
    nn = sz * sz
    gmax = int(syn.GROUP_INDEX[sz - 1])
    inv = np.zeros((3, nn), np.int32)
    cnt = np.zeros((3, nn), np.int32)
    byp = np.zeros((3, nn), np.int32)
    ys = (np.arange(nn) // sz).astype(np.int32)
    xs = (np.arange(nn) % sz).astype(np.int32)
    for st in range(3):
        tab = syn.scan_table(sz, st)                  # (nn, 2) of (y, x)
        inv[st, tab[:, 0] * sz + tab[:, 1]] = np.arange(nn, dtype=np.int32)
        ty, tx = (xs, ys) if st == syn.SCAN_VER else (ys, xs)
        cx, bx = _np_group_rate(tx, gmax)
        cy, by = _np_group_rate(ty, gmax)
        cnt[st] = cx + cy
        byp[st] = (bx + by) * BIT
    stm = np.zeros(MODES, np.int32)
    if sz <= 8:
        for m in range(MODES):
            if abs(m - 26) <= 4:
                stm[m] = syn.SCAN_HOR
            elif abs(m - 10) <= 4:
                stm[m] = syn.SCAN_VER
    return inv, cnt, byp, stm


def _lastxy_rate(sz: int, q, ctxv, sigv, stv=None):
    """(..., M, sz, sz) quant levels -> (..., M) estimated last-XY rate
    (<<15), at per-lane context/sig-zero prices ctxv/sigv (lanes,).

    Exact last significant scan position, computed gather-free: the inverse
    scan is a CONSTANT vector, so i_last = max(inv_scan * sig), and the rate
    at that position falls out of one-hot sums against constant per-pixel
    count/bypass tables (context-bin counts multiply the per-lane price at
    trace time — integer-identical to the old price-folded tables at the
    default prices). Mode-dependent scan types (sz <= 8) select among the
    three per-type results. All-zero blocks (cbf=0) contribute 0.

    stv=None: the lane axis is all 35 modes (per-mode constant scan types).
    stv (..., M) int32: per-lane scan types (RMD-preselected lanes)."""
    import jax.numpy as jnp
    inv, cnt, byp, stm = _scan_consts(sz)
    nn = sz * sz
    sig = (q.reshape(q.shape[:-2] + (nn,)) != 0)
    nz = sig.any(-1)
    sigi = sig.astype(jnp.int32)
    nnz = sigi.sum(-1)
    cv = ctxv.reshape(ctxv.shape + (1,) * (nz.ndim - 1))   # (lanes, 1...)
    sv = sigv.reshape(sigv.shape + (1,) * (nz.ndim - 1))
    sts = (0, 1, 2) if sz <= 8 else (0,)
    outs = {}
    for st in sts:
        invv = jnp.asarray(inv[st])
        il = jnp.max(invv * sigi, axis=-1)
        # sig-map bins of the ZEROS scanned before the last significant
        # coefficient: real CABAC pays one context bin per scanned zero
        # (the level-rate table covers only nonzeros), priced at sigv
        zb = il + 1 - nnz
        oh = (invv == il[..., None]).astype(jnp.int32)
        # ONE one-hot sum: the per-position (ctx count, bypass rate) pair
        # packs into a single int32 constant (byp_sum < 2^19 <<15-bits in
        # bits 0..19, cnt <= 20 in bits 20+), unpacked after the select —
        # the two-sum form doubled the stage's VPU work (ROADMAP round 5)
        packed = jnp.asarray(byp[st] + (cnt[st] << 20))
        sel = (oh * packed).sum(-1)
        rate = ((sel >> 20) * cv + (sel & ((1 << 20) - 1)) + zb * sv)
        if nn > 16:
            # CG refinement (reference put_coef sig_cg flags,
            # src/HEVCe.c:1199-1212): a MIDDLE coefficient group (strictly
            # between CG 0 and the group holding the last coefficient) that
            # is all-zero costs ONE sig_cg context bin, not 16 sig bins —
            # remove the per-zero charge for those groups; and every middle
            # group pays its sig_cg flag (priced ctxv), which the per-zero
            # model never charged for nonzero groups. Gather-free: CG
            # membership in scan order is a CONSTANT one-hot of
            # (inv_scan >> 4).
            ncg = nn // 16
            C = ((invv >> 4)[:, None]
                 == jnp.arange(ncg, dtype=jnp.int32)[None, :])
            nnz_cg = jnp.matmul(
                sigi.astype(jnp.float32),
                C.astype(jnp.float32)).astype(jnp.int32)   # (..., ncg) exact
            cg_last = il >> 4
            cgi = jnp.arange(ncg, dtype=jnp.int32)
            mid = (cgi >= 1) & (cgi < cg_last[..., None])
            n_mid = jnp.maximum(cg_last - 1, 0)
            n_mid_zero = (mid & (nnz_cg == 0)).sum(-1)
            rate = rate - 16 * n_mid_zero * sv + n_mid * cv
        outs[st] = rate
    if len(outs) == 1:
        bits = outs[0]
    else:
        if stv is None:
            stv = jnp.asarray(stm)                    # (35,)
        bits = jnp.where(stv == 1, outs[1],
                         jnp.where(stv == 2, outs[2], outs[0]))
    return jnp.where(nz, bits, 0)


def _sub_flags(fl):
    """z-order sub-block border existence (reference src/HEVCe.c:1376-1379);
    fl = (bll, blb, baa, bar) bool tensors."""
    import jax.numpy as jnp
    bll, blb, baa, bar = fl
    t = jnp.ones_like(bll)
    f = jnp.zeros_like(bll)
    return ((bll, bll, baa, baa),
            (t, f, baa, bar),
            (bll, blb, t, t),
            (t, f, t, f))


def _node_ctx(A, y0, x0, sz):
    """Border context for a node at (y0, x0, sz) inside the CTU — y0/x0 may
    be TRACED scalars (the quadrant/leaf scans index dynamically). A is the
    augmented border canvas (B', 65, 65) int32: A[:, 1+y, 1+x] = plane(y, x)
    for y, x in [0, 31], row 0 = the above-CTU context row (plane(-1, -1..63),
    real above/above-right tiles or clamp-replicated, masked by flags), col 0
    = the left-CTU context column (plane(0..63, -1)). Positions beyond the
    committed interior hold zeros — every such read is masked by the
    availability flags (reference clamped-read semantics, src/HEVCe.c:119;
    the substituted values never reach an unmasked lane)."""
    from jax import lax
    B = A.shape[0]
    top = lax.dynamic_slice(A, (0, y0, x0), (B, 1, 1 + 2 * sz))[:, 0, :]
    left = lax.dynamic_slice(A, (0, y0 + 1, x0), (B, 2 * sz, 1))[:, :, 0]
    return top, left


def _pix(P, r, c):
    """one (B',) cell of a small per-lane map at traced (r, c)."""
    from jax import lax
    return lax.dynamic_slice(P, (0, r, c), (P.shape[0], 1, 1))[:, 0, 0]


def _eval_node(qpd6, A, orig, fl, pml, pma, y0, x0, sz, prices,
               return_sub0=False):
    """Greedy-evaluate one node: both 2Nx2N TU layouts x 35 modes. Returns
    (cost (B',), lay (B',) in {1,2}, pm (B',), quant (B', sz*sz),
     recon (B', sz, sz)). fl is the stacked (B', 4) availability flags;
    y0/x0 may be traced; prices = (ctxv, sigv) per-lane (B',) <<15 context/
    sig-zero bin prices."""
    import jax.numpy as jnp
    from jax import lax

    ctxv, sigv = prices
    top, left = _node_ctx(A, y0, x0, sz)
    blk = lax.dynamic_slice(orig, (0, y0, x0), (orig.shape[0], sz, sz))
    q1, r1, s1 = cu_eval.eval_2nx2n(sz, qpd6, top, left, fl, blk)
    q4, r4, s4 = cu_eval.eval_tusplit(sz, qpd6, top, left, fl, blk)

    h = sz // 2
    pmr = _pmode_rate(pml, pma, ctxv)                   # (B', 35) <<15
    last1 = _lastxy_rate(sz, q1, ctxv, sigv)
    last3 = sum(_lastxy_rate(h, q4[..., k, :, :], ctxv, sigv)
                for k in range(4))
    cvc = ctxv[:, None]
    r1f = _est_rate(q1, (-1, -2)) + last1 + pmr + HDR_LAY1_BINS * cvc
    r3f = _est_rate(q4, (-1, -2, -3)) + last3 + pmr + HDR_LAY2_BINS * cvc
    cost1 = rdcost.calc_rd_cost(qpd6, s1, (r1f + HALF) >> 15)   # (B', 35)
    cost3 = rdcost.calc_rd_cost(qpd6, s4, (r3f + HALF) >> 15)
    costs = jnp.concatenate([cost1, cost3], axis=1)     # (B', 70)
    sel = jnp.argmin(costs, axis=1).astype(jnp.int32)   # flat winner
    cost = jnp.min(costs, axis=1)
    lay = jnp.where(sel < MODES, 1, 2)
    pm = jnp.where(sel < MODES, sel, sel - MODES)

    # winner selection by one-hot masked sums (no gathers); the sums have a
    # single nonzero term, so int16/uint8 accumulation is exact and keeps
    # the big (B, 35, sz*sz) reads narrow
    B = costs.shape[0]
    nn = sz * sz
    iota = jnp.arange(MODES, dtype=jnp.int32)
    oh1 = (iota[None, :] == sel[:, None])
    oh3 = (iota[None, :] == (sel[:, None] - MODES))
    o1q, o3q = oh1.astype(jnp.int16), oh3.astype(jnp.int16)
    o1r, o3r = oh1.astype(jnp.uint8), oh3.astype(jnp.uint8)
    quant = ((q1.reshape(B, MODES, nn) * o1q[:, :, None])
             .sum(1, dtype=jnp.int16)
             + (q4.reshape(B, MODES, nn) * o3q[:, :, None])
             .sum(1, dtype=jnp.int16))
    recon = ((r1.reshape(B, MODES, nn) * o1r[:, :, None])
             .sum(1, dtype=jnp.uint8)
             + (r4.reshape(B, MODES, nn) * o3r[:, :, None])
             .sum(1, dtype=jnp.uint8))
    out = cost, lay, pm, quant, recon.reshape(B, sz, sz)
    if not return_sub0:
        return out
    # TU-split sub0's dense eval is EXACTLY the NxN PU0 eval (same borders,
    # same flags, all 35 modes from the pre-leaf canvas) — hand it to
    # _eval_nxn instead of re-tracing a fifth 4x4 pipeline per leaf
    q0 = q4[..., 0, :, :]
    r0 = r4[..., 0:h, 0:h]
    s0 = rdcost.block_sse(blk[:, None, 0:h, 0:h], r0)
    return out, (q0, r0, s0)


def _topk_mask(cost, K: int):
    """(..., M) int32 costs -> (..., K, M) bool top-K one-hots. The selected
    SET equals K sequential argmin rounds (ties broken toward lower index);
    row k enumerates that set in ascending INDEX order (so downstream argmin
    tie-breaks toward the lower original index, matching the dense path).
    Gather-free: one sort for the K-th-smallest threshold, then keep every
    strictly-smaller entry unconditionally and admit threshold TIES in index
    order only up to the K-slot budget — trimming by index over ALL
    candidates (not just ties) would drop strictly better high-index entries
    when ties exist at the threshold (tests/test_wavefront.py oracle).
    K >= M degenerates to the identity — the RMD=(35, 35) configuration is
    bit-identical to the dense evaluation (tested:
    test_fast_mode_rmd_full_is_dense_identity)."""
    import jax.numpy as jnp
    M = cost.shape[-1]
    if K >= M:
        eye = jnp.eye(M, dtype=bool)
        return jnp.broadcast_to(eye, cost.shape[:-1] + (M, M))
    thr = jnp.sort(cost, axis=-1)[..., K - 1:K]       # K-th smallest value
    strict = cost < thr
    tie = cost == thr
    budget = K - strict.sum(-1, keepdims=True)        # >= 1 tie always fits
    mask = strict | (tie & (jnp.cumsum(tie.astype(jnp.int32), -1) <= budget))
    rank = jnp.cumsum(mask.astype(jnp.int32), -1) - 1
    ks = jnp.arange(K, dtype=jnp.int32)
    return mask[..., None, :] & (rank[..., None, :] == ks[:, None])


def _sel_i32(oh, v):
    """one-hot select integer per-mode values: oh (..., K, 35) bool,
    v (35,) or (..., 35) int -> (..., K) int32 (masked sum, single nonzero
    term per row — exact, gather-free)."""
    import jax.numpy as jnp
    return (oh.astype(jnp.int32)
            * jnp.asarray(v, jnp.int32)[..., None, :]).sum(-1)


def _compress_u8(oh, x):
    """compress the mode axis of a uint8 tensor through top-K one-hots:
    oh (B, K, 35) bool, x (B, 35, sz, sz) u8 -> (B, K, sz, sz) u8. One bf16
    MXU matmul — exact (pixels <= 255 are bf16-exact; the f32-accumulated
    sum has a single nonzero term)."""
    import jax.numpy as jnp
    B, M = x.shape[0], x.shape[1]
    nn = x.shape[-2] * x.shape[-1]
    acc = jnp.einsum('bkm,bmp->bkp', oh.astype(jnp.bfloat16),
                     x.reshape(B, M, nn).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return acc.astype(jnp.uint8).reshape(B, oh.shape[-2], *x.shape[-2:])


def _eval_node_rmd(qpd6, A, orig, fl, pml, pma, y0, x0, sz, prices,
                   K: int, T: int):
    """RMD (rough-mode-decision) variant of _eval_node: preselect K of the
    35 modes by SATD (+ forced planar/DC/MPMs), run the dense
    fwd/RDOQ/rate/inv/recon pipeline on K modes only, and search the
    TU-split layout on the top-T of those by 2Nx2N RD cost (the standard
    HM/x265 preselection shape; src/HEVCe.c:1422-1484 searches all 35x2).
    Every dense tensor in the hot pipeline shrinks 35 -> K (the front step
    is HBM-traffic bound, ROADMAP round-4 plan); selection is deterministic
    integer math, so CPU/TPU decision identity is preserved. Returns the
    same (cost, lay, pm, quant, recon) contract as _eval_node."""
    import jax.numpy as jnp
    from jax import lax
    from hevce_tpu.ops import intra
    from hevce_tpu.ops import satd as satd_ops

    ctxv, sigv = prices
    top, left = _node_ctx(A, y0, x0, sz)
    blk = lax.dynamic_slice(orig, (0, y0, x0), (orig.shape[0], sz, sz))
    S = intra.build_borders(sz, top[..., 0], left, top[..., 1:],
                            fl[..., 0], fl[..., 1], fl[..., 2], fl[..., 3])
    pred35 = intra.predict_all_modes(sz, S)            # (B, 35, sz, sz) u8
    resid = (blk[:, None].astype(jnp.int16) - pred35.astype(jnp.int16))
    sat_d = satd_ops.block_satd(sz, resid)             # (B, 35) i32
    # forced candidates always survive preselection: planar, DC, and the 3
    # MPMs (they carry the cheap-signalling advantage SATD cannot see) —
    # bias them below any unforced SATD, preserving order among themselves
    m0, m1, m2 = _mpm_triplet(pml, pma)
    modes = jnp.arange(MODES, dtype=jnp.int32)
    forced = ((modes[None, :] <= 1) | (modes[None, :] == m0[:, None])
              | (modes[None, :] == m1[:, None])
              | (modes[None, :] == m2[:, None]))
    ohK = _topk_mask(sat_d - (forced.astype(jnp.int32) << 29), K)
    predK = _compress_u8(ohK, pred35)
    qK, rK, sseK = cu_eval.pipeline_sse(sz, qpd6, predK, blk)

    pmr35 = _pmode_rate(pml, pma, ctxv)                # (B, 35)
    _, _, _, stm = _scan_consts(sz)
    pmrK = _sel_i32(ohK, pmr35)
    lastK = _lastxy_rate(sz, qK, ctxv, sigv,
                         stv=_sel_i32(ohK, stm) if sz <= 8 else None)
    cvc = ctxv[:, None]
    r1f = _est_rate(qK, (-1, -2)) + lastK + pmrK + HDR_LAY1_BINS * cvc
    cost1 = rdcost.calc_rd_cost(qpd6, sseK, (r1f + HALF) >> 15)   # (B, K)

    # TU-split searched only on the top-T modes by 2Nx2N RD cost (per-lane
    # chained borders make a wider split search pay K-fold in prediction)
    ohT_K = _topk_mask(cost1, min(T, K))               # (B, T, K)
    ohT = (ohT_K[..., :, :, None] & ohK[..., None, :, :]).any(-2)  # (B,T,35)
    q4, r4, s4 = cu_eval.eval_tusplit(sz, qpd6, top, left, fl, blk,
                                      sel_oh=ohT)
    h = sz // 2
    _, _, _, stmh = _scan_consts(h)
    stvT = _sel_i32(ohT, stmh) if h <= 8 else None
    last3 = sum(_lastxy_rate(h, q4[..., k, :, :], ctxv, sigv, stv=stvT)
                for k in range(4))
    pmrT = _sel_i32(ohT, pmr35)
    r3f = _est_rate(q4, (-1, -2, -3)) + last3 + pmrT + HDR_LAY2_BINS * cvc
    cost3 = rdcost.calc_rd_cost(qpd6, s4, (r3f + HALF) >> 15)     # (B, T)

    Tn = cost3.shape[-1]
    costs = jnp.concatenate([cost1, cost3], axis=1)    # (B, K+T)
    sel = jnp.argmin(costs, axis=1).astype(jnp.int32)
    cost = jnp.min(costs, axis=1)
    lay = jnp.where(sel < K, 1, 2)
    B = costs.shape[0]
    nn = sz * sz
    oh1 = (jnp.arange(K, dtype=jnp.int32)[None, :] == sel[:, None])
    oh3 = (jnp.arange(Tn, dtype=jnp.int32)[None, :] == (sel[:, None] - K))
    # winner mode in 35-space: route the K/T-space one-hot through the
    # selection one-hots (single-True rows, so .any is an exact select)
    moh = jnp.where((lay == 1)[:, None],
                    (oh1[..., None] & ohK).any(-2),
                    (oh3[..., None] & ohT).any(-2))    # (B, 35)
    pm = (moh * modes[None, :]).sum(-1).astype(jnp.int32)
    quant = ((qK.reshape(B, K, nn) * oh1.astype(jnp.int16)[:, :, None])
             .sum(1, dtype=jnp.int16)
             + (q4.reshape(B, Tn, nn) * oh3.astype(jnp.int16)[:, :, None])
             .sum(1, dtype=jnp.int16))
    recon = ((rK.reshape(B, K, nn) * oh1.astype(jnp.uint8)[:, :, None])
             .sum(1, dtype=jnp.uint8)
             + (r4.reshape(B, Tn, nn) * oh3.astype(jnp.uint8)[:, :, None])
             .sum(1, dtype=jnp.uint8))
    return cost, lay, pm, quant, recon.reshape(B, sz, sz)


def _eval_nxn(qpd6, A, orig, fl8, pml, pma, pl_lo, pa_hi, y0, x0, sub0,
              prices):
    """NxN partition of one 8x8 leaf: four independent 4x4 PUs, each
    35-mode-searched against the committed recon of earlier PUs (reference
    step 4, src/HEVCe.c:1491-1557). MPM neighbor wiring per PU follows the
    reference (src/HEVCe.c:1531-1538): pl_lo / pa_hi are the map pmodes left
    of PU2 and above PU1. PU0 reuses the TU-split sub0 dense eval (sub0).
    Returns (cost (B',), pm4 (B', 4), quant (B', 64) z-order,
    recon (B', 8, 8))."""
    import jax.numpy as jnp
    from jax import lax

    ctxv, sigv = prices
    f4 = _sub_flags((fl8[:, 0], fl8[:, 1], fl8[:, 2], fl8[:, 3]))
    local = A
    sat = jnp.int32(rdcost.I32_MAX)
    hdr_bits = (HDR_NXN_BINS * ctxv + HALF) >> 15
    total = rdcost.calc_rd_cost(qpd6, jnp.zeros_like(pml), hdr_bits)
    iota = jnp.arange(MODES, dtype=jnp.int32)
    sub_pm, quants = [], []
    for isub, (dy, dx) in enumerate(_SUB):
        y, x = y0 + 4 * dy, x0 + 4 * dx
        if isub == 0 and sub0 is not None:
            q, r, s = sub0           # == TU-split sub0's dense eval
        else:
            top, left = _node_ctx(local, y, x, 4)
            blk = lax.dynamic_slice(orig, (0, y, x), (orig.shape[0], 4, 4))
            q, r, s = cu_eval.eval_2nx2n(
                4, qpd6, top, left, jnp.stack(f4[isub], axis=-1), blk)
        if isub == 0:
            pl, pa = pml, pma
        elif isub == 1:
            pl, pa = sub_pm[0], pa_hi
        elif isub == 2:
            pl, pa = pl_lo, sub_pm[0]
        else:
            pl, pa = sub_pm[2], sub_pm[1]
        rf = (_pmode_rate(pl, pa, ctxv) + _lastxy_rate(4, q, ctxv, sigv)
              + _est_rate(q, (-1, -2)) + ctxv[:, None])  # +ctx: per-PU Y cbf
        cost = rdcost.calc_rd_cost(qpd6, s, (rf + HALF) >> 15)   # (B', 35)
        sel = jnp.argmin(cost, axis=1).astype(jnp.int32)
        c = jnp.min(cost, axis=1)
        B = sel.shape[0]
        oh = (iota[None, :] == sel[:, None])
        qw = (q.reshape(B, MODES, 16) * oh.astype(jnp.int16)[:, :, None]) \
            .sum(1, dtype=jnp.int16)
        rw = (r.reshape(B, MODES, 16) * oh.astype(jnp.uint8)[:, :, None]) \
            .sum(1, dtype=jnp.uint8).reshape(B, 4, 4)
        local = lax.dynamic_update_slice(local, rw, (0, y + 1, x + 1))
        total = jnp.where(total > sat - c, sat, total + c)
        sub_pm.append(sel)
        quants.append(qw)
    recon = lax.dynamic_slice(local, (0, y0 + 1, x0 + 1),
                              (local.shape[0], 8, 8))
    return (total, jnp.stack(sub_pm, axis=-1),
            jnp.concatenate(quants, axis=-1), recon)


def _make_front_core(qpd6: int, R: int, rmd=None):
    """Build the (unjitted) per-front core for an R-row CTU grid.

    rmd=None evaluates every node densely over all 35 modes x both TU
    layouts (round-2/3 behavior). rmd=(K, T) switches every node to the
    SATD-preselected RMD evaluation (_eval_node_rmd): the 2Nx2N pipeline
    runs on K modes, the TU-split on the top-T by 2Nx2N cost, and the NxN
    leaf partition evaluates its PU0 densely instead of reusing the
    TU-split sub0 (which no longer spans all 35 modes). rmd=(35, 35) is
    bit-identical to rmd=None (tested: test_fast_mode_rmd_full_is_dense_
    identity) — the masks degenerate to identity.

    Signature: (W, PME, o_col, d, C) -> (S_col, lay_col, pm_col, pm4_col,
    qc_col, pme_col) where
      W (B, R, 3, 32, 32) i32 = the previous THREE committed front columns
      (W[..., 0] is front d-3, 1 is d-2, 2 is d-1 — all the recon context a
      front needs: left = same row col d-1, above = row-1 col d-2,
      above-right = row-1 col d-1, above-left = row-1 col d-3),
      PME (B, R, 8) i32 = front d-1's committed right-edge pmode column at
      4-pel granularity (the left-CTU MPM context for this front),
      o_col (B, R, 32, 32) uint8 original tiles of front d,
      d / C traced scalars (front index, CTU columns).
    Returns the committed recon column (B, R, 32, 32) i32, the decision /
    NxN-PU-mode / composed-quant columns, and the new pmode edge column.

    Two structural choices exist purely for performance:
      * the rolling 3-column window (round 2): carrying whole skewed
        (B, R, D, ...) arrays and dynamic-slicing the d column made XLA
        spend ~80% of each front step on strided DMA;
      * the CTU z-order walk runs as ONE lax.scan over the 4 quadrants of
        an augmented border canvas A (lanes, 65, 65); each quadrant slices
        one dynamic (33, 33) window and walks its 4 leaves Python-unrolled
        at STATIC window offsets (round 3): the rolled leaf-scan form spent
        ~75% of device time on per-leaf dynamic-offset slice/update
        plumbing (xplane), while fully unrolling BOTH loops made compile
        explode (>50 min for one Kodak shape round 3 mid-round; the final
        leaf=4/quad=4 variant compiled in 11 min but ran 40% SLOWER).
        Decision order is IDENTICAL to the fully sequential form (leaf
        evals of quadrant q+1 see quadrant q's committed 16-vs-leaves
        winner, as the packed stream requires for decoder-recon
        consistency).
    """
    import jax.numpy as jnp
    from jax import lax

    def shift_down(t):
        """tile row r -> r-1 view: out[:, r] = t[:, r-1] (row 0 zero)."""
        return jnp.pad(t, ((0, 0), (1, 0)) + ((0, 0),) * (t.ndim - 2))[:, :-1]

    def core(W, PME, o_col, d, C, ctx_lane, sig_lane):
        """ctx_lane / sig_lane: per-lane (B*R,) <<15 context / sig-zero bin
        prices (per-IMAGE values tiled over rows by the caller; constants
        CTX_BIT/SIG_ZERO reproduce the fixed-price behavior exactly)."""
        Bb = W.shape[0]
        rr = jnp.arange(R, dtype=jnp.int32)             # CTU row per lane
        cc = d - 2 * rr                                  # CTU col per lane
        valid = (cc >= 0) & (cc < C)                     # (R,)

        left_t = W[:, :, 2]                              # (B, R, 32, 32)
        above_t = shift_down(W[:, :, 1])
        abr_t = shift_down(W[:, :, 2])
        abl_t = shift_down(W[:, :, 0])
        orig_t = o_col

        # CTU-level border context with clamped-plane semantics
        corner = jnp.where((cc > 0)[None, :], abl_t[:, :, CTU - 1, CTU - 1],
                           above_t[:, :, CTU - 1, 0])
        top_mid = above_t[:, :, CTU - 1, :]              # (B, R, 32)
        top_right = jnp.where(
            (cc + 1 < C)[None, :, None], abr_t[:, :, CTU - 1, :],
            jnp.repeat(above_t[:, :, CTU - 1, CTU - 1:], CTU, axis=2))
        ctop = jnp.concatenate([corner[:, :, None], top_mid, top_right], axis=2)
        lcol = left_t[:, :, :, CTU - 1]                  # (B, R, 32)
        cleft = jnp.concatenate(
            [lcol, jnp.repeat(lcol[:, :, CTU - 1:], CTU, axis=2)], axis=2)

        # flatten (B, R) -> lanes; pixels stay uint8 end-to-end (the dense
        # eval is bandwidth-bound; consumers upcast locally)
        BR = Bb * R
        ctop = ctop.reshape(BR, 1 + 2 * CTU)
        cleft = cleft.reshape(BR, 2 * CTU)
        orig = orig_t.reshape(BR, CTU, CTU)
        bll = jnp.tile(cc > 0, Bb)
        blb = jnp.zeros_like(bll)
        baa = jnp.tile(rr > 0, Bb)
        bar = baa & jnp.tile(cc + 1 < C, Bb)
        ctu_fl = (bll, blb, baa, bar)

        # augmented border canvas: row 0 / col 0 = outside-CTU context,
        # interior filled with committed recon as the walk proceeds
        A = jnp.zeros((BR, 65, 65), jnp.uint8)
        A = A.at[:, 0, :].set(ctop)
        A = A.at[:, 1:, 0].set(cleft)
        # augmented pmode map at 4-pel granularity: row 0 = DC (the
        # reference's map_pmode line buffer never scrolls across CTU rows),
        # col 0 = the left-CTU edge from the carry
        pm_left = jnp.where(jnp.tile(cc > 0, Bb)[:, None],
                            PME.reshape(BR, 8), DC)
        P = jnp.full((BR, 9, 9), DC, jnp.int32)
        P = P.at[:, 1:, 0].set(pm_left)

        # Per-quadrant availability flags are computed IN-BODY from the
        # xs quadrant index (cheap (BR,) boolean ops) rather than fed as
        # stacked scan xs: the xs form staged the tiny pred tensors
        # through per-iteration cross-memory copies (xplane: a pred[4]
        # copy-start alone was 8.5% of slice time).
        bll_c, blb_c, baa_c, bar_c = ctu_fl

        # saturating int32 accumulation (jnp int64 silently degrades to
        # int32 without x64 mode; costs are <= I32_MAX, sums must not wrap)
        sat = jnp.int32(rdcost.I32_MAX)

        def sat_add(a, c_):
            return jnp.where(a > sat - c_, sat, a + c_)

        # parent's split_cu=1 context bin, priced sub-bit directly in cost
        # units (w_bits * ctx >> 15) — rounding it to whole bits first
        # would erase the sub-bit context pricing exactly where the
        # merge-vs-split comparison is decided
        from hevce_tpu.ops import constants as Cst
        w_bits = int(Cst.RDCOST_WEIGHT_BITS[qpd6])
        split_bit = (w_bits * ctx_lane + HALF) >> 15
        prices = (ctx_lane, sig_lane)

        def quad_body(carry, qi):
            # ONE dynamic window slice per quadrant (canvas / orig / pmode
            # map), all 4 leaf evals Python-unrolled at STATIC offsets
            # inside the windows, ONE dynamic commit back. The rolled
            # leaf-scan form spent ~75% of device time on per-iteration
            # dynamic-offset slice/update plumbing (round-3 xplane profile:
            # the math itself is microseconds; unrolling alone did not help
            # — the offsets stayed traced), so the windows are what make
            # the leaf walk static.
            Ac, Pc = carry
            # quadrant flags from the z-order index (the _sub_flags rule
            # specialized to row qi): q0 (bll,bll,baa,baa) q1 (t,f,baa,bar)
            # q2 (bll,blb,t,t) q3 (t,f,t,f)
            odd = (qi & 1) == 1                      # quadrants 1, 3
            hi = qi >= 2                             # quadrants 2, 3
            qbll = bll_c | odd
            qblb = jnp.where(odd, False, jnp.where(hi, blb_c, bll_c))
            qbaa = baa_c | hi
            qbar = jnp.where(odd, jnp.where(hi, False, bar_c),
                             jnp.where(hi, True, baa_c))
            qf = jnp.stack([qbll, qblb, qbaa, qbar], -1)
            lf = jnp.stack([jnp.stack(t, -1)
                            for t in _sub_flags((qbll, qblb, qbaa, qbar))])
            dy, dx = qi >> 1, qi & 1                 # z-order, half-size
            y16, x16 = 16 * dy, 16 * dx
            cy, cx = y16 // 4, x16 // 4
            WQ = lax.dynamic_slice(Ac, (0, y16, x16), (BR, 33, 33))
            OQ = lax.dynamic_slice(orig, (0, y16, x16), (BR, 16, 16))
            PW = lax.dynamic_slice(Pc, (0, cy, cx), (BR, 5, 5))

            lsum = jnp.zeros((BR,), jnp.int32)
            leaf_la, leaf_pm, leaf_pm4, leaf_qb = [], [], [], []
            for li, (ldy, ldx) in enumerate(_SUB):
                y8, x8 = 8 * ldy, 8 * ldx            # static, window-local
                lcy, lcx = y8 // 4, x8 // 4
                pml_n = _pix(PW, lcy + 1, lcx)
                pma_n = _pix(PW, lcy, lcx + 1)
                if rmd is None:
                    (c12, la12, p12, qb12, rc12), sub0 = _eval_node(
                        qpd6, WQ, OQ, lf[li], pml_n, pma_n, y8, x8, 8,
                        prices, return_sub0=True)
                else:
                    c12, la12, p12, qb12, rc12 = _eval_node_rmd(
                        qpd6, WQ, OQ, lf[li], pml_n, pma_n, y8, x8, 8,
                        prices, *rmd)
                    sub0 = None
                pl_lo = _pix(PW, lcy + 2, lcx)
                pa_hi = _pix(PW, lcy, lcx + 2)
                cN, pm4_i, qbN, rcN = _eval_nxn(
                    qpd6, WQ, OQ, lf[li], pml_n, pma_n, pl_lo, pa_hi,
                    y8, x8, sub0, prices)
                nxn = cN <= c12        # tie -> NxN (reference tries it last)
                c = jnp.where(nxn, cN, c12)
                leaf_la.append(jnp.where(nxn, 3, la12))
                leaf_pm.append(p12)
                leaf_pm4.append(pm4_i)
                leaf_qb.append(jnp.where(nxn[:, None], qbN, qb12))
                rc = jnp.where(nxn[:, None, None], rcN, rc12)
                WQ = WQ.at[:, y8 + 1:y8 + 9, x8 + 1:x8 + 9].set(rc)
                pm_blk = jnp.where(nxn[:, None, None],
                                   pm4_i.reshape(-1, 2, 2),
                                   p12[:, None, None])
                PW = PW.at[:, lcy + 1:lcy + 3, lcx + 1:lcx + 3].set(pm_blk)
                lsum = sat_add(lsum, c)
            leaf_ys = (jnp.stack(leaf_la), jnp.stack(leaf_pm),
                       jnp.stack(leaf_pm4), jnp.stack(leaf_qb))

            # 16x16 alternative reads only the window's context row/col,
            # which the leaf commits never touch
            pml_n = _pix(PW, 1, 0)
            pma_n = _pix(PW, 0, 1)
            if rmd is None:
                c, la, p, qb, rc = _eval_node(
                    qpd6, WQ, OQ, qf, pml_n, pma_n, 0, 0, 16, prices)
            else:
                c, la, p, qb, rc = _eval_node_rmd(
                    qpd6, WQ, OQ, qf, pml_n, pma_n, 0, 0, 16, prices, *rmd)
            split_c = sat_add(lsum, split_bit)
            own = c < split_c
            cost_q = jnp.where(own, c, split_c)
            new16 = jnp.where(own[:, None, None], rc, WQ[:, 1:17, 1:17])
            Ac = lax.dynamic_update_slice(Ac, new16, (0, y16 + 1, x16 + 1))
            newP = jnp.where(own[:, None, None], p[:, None, None],
                             PW[:, 1:5, 1:5])
            Pc = lax.dynamic_update_slice(Pc, newP, (0, cy + 1, cx + 1))
            la16 = jnp.where(own, la, 0)
            return (Ac, Pc), (leaf_ys, la16, p, qb, cost_q)

        # the quadrant counter rides xs (a 4-element iota), NEVER the carry:
        # a carried-and-incremented loop counter whose value feeds the body
        # is exactly the TPU while-loop aliasing hazard found for the front
        # index d (see the scan below) — and an iota xs is a 16-byte feed,
        # unlike the stacked flag tensors the xs used to stage (the pred[4]
        # copy-start that was 8.5% of slice time in the xplane profile)
        (A, P), (leaf_ys, la16, pm16, q16, cost16) = lax.scan(
            quad_body, (A, P), jnp.arange(4, dtype=jnp.int32))
        leaf_la, leaf_pm, leaf_pm4, leaf_qb = leaf_ys   # (4, 4, BR, ...)

        fl32 = jnp.stack(ctu_fl, -1)
        pml_n = _pix(P, 1, 0)
        pma_n = _pix(P, 0, 1)
        if rmd is None:
            c, la, p, qb, rc = _eval_node(
                qpd6, A, orig, fl32, pml_n, pma_n, 0, 0, 32, prices)
        else:
            c, la, p, qb, rc = _eval_node_rmd(
                qpd6, A, orig, fl32, pml_n, pma_n, 0, 0, 32, prices, *rmd)
        split_cost = cost16[0]
        for t in (cost16[1], cost16[2], cost16[3]):
            split_cost = sat_add(split_cost, t)
        split_cost = sat_add(split_cost, split_bit)
        own = c < split_cost
        la32 = jnp.where(own, la, 0)
        canvas = jnp.where(own[:, None, None], rc, A[:, 1:33, 1:33])
        P = jnp.where(own[:, None, None],
                      P.at[:, 1:, 1:].set(
                          jnp.broadcast_to(p[:, None, None], (BR, 8, 8))), P)

        # node order 0..15 leaves (qi*4+li), 16..19 quads, 20 root
        lay_all = jnp.concatenate(
            [leaf_la.reshape(16, BR).T, la16.T, la32[:, None]], axis=1)
        pm_all = jnp.concatenate(
            [leaf_pm.reshape(16, BR).T, pm16.T, p[:, None]], axis=1)
        pm4_all = jnp.moveaxis(leaf_pm4.reshape(16, BR, 4), 1, 0).reshape(BR, 64)

        # compose the chosen forest's quant leaves (static-layout selects,
        # z-order layout pack_cu expects — csrc PackRec): leaves partition
        # the CTU, so this is all the pack needs, 1/6 of the raw winner data
        q8cat = jnp.moveaxis(leaf_qb.reshape(16, BR, 64), 1, 0)  # (BR, 16, 64)
        q16cat = jnp.moveaxis(q16, 1, 0)                 # (BR, 4, 256)
        own16 = (jnp.moveaxis(la16, 1, 0) != 0)          # (BR, 4)
        qc = jnp.where(own16[:, :, None],
                       q16cat,
                       q8cat.reshape(BR, 4, 256)).reshape(BR, 1024)
        qc = jnp.where((la32 != 0)[:, None], qb, qc)

        # commit the front column (masked by row validity; invalid lanes
        # stay zero, matching the zero-initialised window/outputs)
        def msk(a):
            vm = valid[None, :].reshape((1, R) + (1,) * (a.ndim - 2))
            return jnp.where(vm, a, 0)

        S_col = msk(canvas.reshape(Bb, R, CTU, CTU))
        lay_col = msk(lay_all.reshape(Bb, R, 21))
        pm_col = msk(pm_all.reshape(Bb, R, 21))
        pm4_col = msk(pm4_all.reshape(Bb, R, 64))
        qc_col = msk(qc.reshape(Bb, R, 1024))
        pme_col = msk(P[:, 1:9, 8].reshape(Bb, R, 8))
        return S_col, lay_col, pm_col, pm4_col, qc_col, pme_col

    return core


# per-CTU record layout in the fetched int8 buffer (see _slice_runner_cache)
_REC_LAY = slice(0, 21)
_REC_PM = slice(21, 42)
_REC_PM4 = slice(42, 106)
_REC_QC8 = slice(106, 1130)
_REC_DEC = 106                    # decision-only (lean) record length
_REC_LEN = 1130


@functools.lru_cache(maxsize=None)
def _cksum_weights(n: int):
    """host-side copy of the device checksum weights (position-sensitive so
    reordered/shifted corruption is caught, unlike a plain sum)."""
    return (np.arange(n, dtype=np.int32) % 8191) + 1


def _host_cksum(flat):
    """int32 wrap-around weighted checksum of a (B, n) int8/uint8/int16 host
    array (same astype-widening the device applies: signed types sign-extend,
    uint8 zero-extends)."""
    w = _cksum_weights(flat.shape[-1])
    return (flat.astype(np.int32) * w).sum(axis=-1, dtype=np.int32)


# Production default for the RMD preselection (None = dense 35-mode search;
# override per call via rmd=, or globally via HEVCE_RMD="K,T" / "off").
# (12, 4) measured round 4 on the full Kodak-24 vs dense: -0.003 dB mean /
# +0.07% size for 1.75x device throughput (7.04 vs 4.01 MP/s on v5e) and
# 1.5x even on the CPU backend — quality cost is negligible at every knob
# point tried, so preselection is the production default (ROADMAP round-4).
RMD_DEFAULT = (12, 4)
_RMD_ENV = object()                    # sentinel: resolve from env/default


def _resolve_rmd(rmd):
    if rmd is not _RMD_ENV:
        return rmd
    import os
    v = os.environ.get("HEVCE_RMD", "").strip().lower()
    if not v:
        return RMD_DEFAULT
    if v in ("off", "none", "0"):
        return None
    try:
        ks, ts = v.split(",")
        k, t = int(ks), int(ts)
    except ValueError:
        raise ValueError(
            f"HEVCE_RMD must be 'K,T' (e.g. '12,4'), 'off', or unset; "
            f"got {v!r}") from None
    k = max(1, min(k, MODES))               # clamp K first, then T against it
    return (k, max(1, min(t, k)))


@functools.lru_cache(maxsize=None)
def _slice_runner_cache(qpd6: int, R: int, Cc: int, want_recon: bool,
                        mesh=None, fetch_qc: bool = True, rmd=None):
    """Whole-slice runner: device-side skew of the raster input tiles, one
    lax.scan over front-major columns with a 3-column recon window + pmode
    edge carry (see _make_front_core for why), then device-side UNSKEW and
    packing of the results — all ONE jitted dispatch per slice.

    Transfers are the dominant cost on a tunneled device, so both directions
    ship exactly the useful payload:
      * upload: raster (B, R, Cc, 32, 32) uint8 tiles (the skewed layout has
        D*R/(R*Cc) ~ 2.25x padding waste; skewing costs one device transpose);
      * download, DEFAULT (fetch_qc=False, round 3): ONE int8 buffer
        (B, R*Cc*106 + 4) = the per-CTU DECISION records [lay 21 | pm 21 |
        pm4 64] plus a 4-byte little-endian position-weighted int32 checksum
        tail. The quant levels are NOT transferred at all — the host pack
        recomputes them bit-identically from the decisions + original image
        (runtime/native.pack_forest_img; csrc replay_cu), cutting the fetch
        ~10x (1130 -> ~106 B/CTU). The recon/quant compose work in the scan
        is dead code under this output set and XLA eliminates it.
      * download, fetch_qc=True (kept for A/B + the record-format tests):
        the full (B, R, Cc, 1130) [lay|pm|pm4|qc8] records with an int16
        escape sideband and optional recon plane, as in round 2.
    Checksums are ALWAYS verified host-side in _finish_batch — the axon
    tunnel has corrupted large transfers before (round-1 VERIFICATION.md),
    and corrupted decisions would otherwise pack into a well-formed stream
    that silently decodes to the wrong image.

    Signature: (O (B, R, Cc, 32, 32) uint8) ->
      lean: (B, R*Cc*106 + 4) i8
      full: (buf (B, R, Cc, 1130) i8, side (B, 4) i32,
             qc16 (B, R, Cc, 1024) i16[, S (B, yp, xp) u8 when want_recon])
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    core = _make_front_core(qpd6, R, rmd)
    D = 2 * (R - 1) + Cc

    def run(O, cv, sv):
        """O (B, R, Cc, 32, 32) u8 tiles; cv / sv (B,) int32 per-image
        context / sig-zero bin prices (<<15) — the corrective second pass
        feeds measured prices here; the default is the constant knobs."""
        B = O.shape[0]
        ctx_lane = jnp.repeat(cv, R)        # lane b*R + r -> image b
        sig_lane = jnp.repeat(sv, R)
        # skew on device: Osk[d, b, r] = O[b, r, d - 2r] (zeros elsewhere)
        cols = [jnp.pad(O[:, r], ((0, 0), (2 * r, D - Cc - 2 * r),
                                  (0, 0), (0, 0))) for r in range(R)]
        Osk = jnp.moveaxis(jnp.stack(cols, axis=2), 1, 0)  # (D, B, R, 32, 32)

        W0 = jnp.zeros((B, R, 3, CTU, CTU), jnp.uint8)
        P0 = jnp.zeros((B, R, 8), jnp.int32)

        def body(carry, xs):
            # The front index d rides xs (an iota), NEVER the carry. A
            # carried d incremented in the body is read CLOBBERED (as d+1)
            # by part of the next iteration's flag math on the TPU backend
            # — the root cause of the long-open CPU-vs-TPU fast-mode
            # decision divergence (round-3 probes 5-10: direct call and
            # every isolated stage match bit-for-bit; only a >=2-iteration
            # scan whose body both uses and increments a carried counter
            # diverges, with lanes behaving exactly as if cc = (d+1) - 2r).
            o_col, d = xs
            W, PME = carry
            S_col, lay_col, pm_col, pm4_col, qc_col, pme_col = core(
                W, PME, o_col, d, jnp.int32(Cc), ctx_lane, sig_lane)
            W = jnp.concatenate([W[:, :, 1:], S_col[:, :, None]], axis=2)
            ys = (lay_col.astype(jnp.int8), pm_col.astype(jnp.int8),
                  pm4_col.astype(jnp.int8))
            if fetch_qc:
                ys = (S_col.astype(jnp.uint8),) + ys + (qc_col.astype(jnp.int16),)
            return (W, pme_col), ys

        _, ys = lax.scan(body, (W0, P0),
                         (Osk, jnp.arange(D, dtype=jnp.int32)))

        def unskew(a):                    # (D, B, R, ...) -> (B, R, Cc, ...)
            rows = [a[2 * r:2 * r + Cc, :, r] for r in range(R)]
            return jnp.moveaxis(jnp.stack(rows, axis=0), 2, 0)

        if not fetch_qc:
            lay, pm, pm4 = ys
            lay_u, pm_u, pm4_u = unskew(lay), unskew(pm), unskew(pm4)
            n = R * Cc * _REC_DEC
            rec = jnp.concatenate([lay_u, pm_u, pm4_u], axis=-1).reshape(B, n)
            w = jnp.asarray(_cksum_weights(n))
            ck = (rec.astype(jnp.int32) * w).sum(-1)          # (B,)
            tail = jnp.stack([(ck >> (8 * k)) & 0xFF for k in range(4)],
                             axis=-1).astype(jnp.int8)
            return jnp.concatenate([rec, tail], axis=-1)

        S, lay, pm, pm4, qc16 = ys
        lay_u, pm_u, pm4_u = unskew(lay), unskew(pm), unskew(pm4)
        qc16_u = unskew(qc16)
        esc = ((qc16_u < -128) | (qc16_u > 127)).reshape(B, -1).any(-1)
        qc8 = jnp.clip(qc16_u, -128, 127).astype(jnp.int8)
        buf = jnp.concatenate([lay_u, pm_u, pm4_u, qc8], axis=-1)

        n = R * Cc * _REC_LEN
        w = jnp.asarray(_cksum_weights(n))
        ck = (buf.reshape(B, n).astype(jnp.int32) * w).sum(-1)
        w16 = jnp.asarray(_cksum_weights(R * Cc * 1024))
        ck16 = (qc16_u.reshape(B, -1).astype(jnp.int32) * w16).sum(-1)
        outs = [buf, None, qc16_u]
        if want_recon:
            S_u = unskew(S)               # (B, R, Cc, 32, 32)
            plane = S_u.transpose(0, 1, 3, 2, 4).reshape(B, R * CTU, Cc * CTU)
            wS = jnp.asarray(_cksum_weights(R * Cc * CTU * CTU))
            ckS = (plane.reshape(B, -1).astype(jnp.int32) * wS).sum(-1)
            outs.append(plane)
        else:
            ckS = jnp.zeros((B,), jnp.int32)
        outs[1] = jnp.stack([ck, esc.astype(jnp.int32), ckS, ck16], axis=-1)
        return tuple(outs)

    if mesh is None:
        return jax.jit(run)
    # data parallelism over the image axis (SURVEY §2.4 DP row): fronts have
    # no cross-image dependency, so the whole slice shards trivially over an
    # 'img' mesh axis — XLA inserts no collectives
    from jax.sharding import NamedSharding, PartitionSpec
    sh = NamedSharding(mesh, PartitionSpec('img'))
    if not fetch_qc:
        return jax.jit(run, in_shardings=(sh, sh, sh), out_shardings=sh)
    n_out = 4 if want_recon else 3
    return jax.jit(run, in_shardings=(sh, sh, sh),
                   out_shardings=(sh,) * n_out)


def _orig_tiles_raster(imgs, yp, xp):
    """(B, R, Cc, 32, 32) uint8 original tiles in raster CTU order,
    edge-replicated from the UNPADDED dims (reference src/HEVCe.c:1620-1622).
    The upload ships exactly the image pixels; the device skews to the
    front-major lax.scan layout."""
    B = len(imgs)
    ysz, xsz = imgs[0].shape
    R, Cc = yp // CTU, xp // CTU
    yy = np.clip(np.arange(yp), 0, ysz - 1)
    xx = np.clip(np.arange(xp), 0, xsz - 1)
    O = np.empty((B, R, Cc, CTU, CTU), np.uint8)
    for b, im in enumerate(imgs):
        plane = im[np.ix_(yy, xx)]
        O[b] = plane.reshape(R, CTU, Cc, CTU).transpose(0, 2, 1, 3)
    return O


def _dispatch_batch(images, qpd6: int, mesh=None, want_recon=True,
                    fetch_qc=False, rmd=_RMD_ENV, prices=None):
    """Upload + dispatch the slice runner for one same-shaped batch (async —
    JAX queues the execution; nothing blocks). Returns (out, meta). With a
    mesh, the batch axis is sharded over its 'img' axis (B must divide).
    fetch_qc=False (default): lean decision-only records; the host pack
    recomputes quant levels (and the recon) from them + the images.
    prices: optional (ctx, sig) per-image arrays (B,) of <<15 bin prices
    (the corrective pass); None = the constant CTX_BIT/SIG_ZERO knobs."""
    import jax.numpy as jnp

    images = [native._clip_dims(im) for im in images]
    shape = images[0].shape
    assert all(im.shape == shape for im in images), "batch must share dims"
    if mesh is not None:
        assert len(images) % mesh.devices.size == 0, \
            "batch must be a multiple of the mesh size"
    ysz, xsz = shape
    yp, xp = -(-ysz // CTU) * CTU, -(-xsz // CTU) * CTU
    R, Cc = yp // CTU, xp // CTU
    O = jnp.asarray(_orig_tiles_raster(images, yp, xp))
    B = len(images)
    if prices is None:
        cv = np.full(B, _ctx_default(qpd6), np.int32)
        sv = np.full(B, SIG_ZERO, np.int32)
    else:
        cv = np.asarray(prices[0], np.int32).reshape(B)
        sv = np.asarray(prices[1], np.int32).reshape(B)
    # the lean program's output set does not depend on want_recon (the host
    # replay produces the recon) — normalize the cache key so the
    # want_recon=False production pass reuses the warm-pass compilation
    run = _slice_runner_cache(qpd6, R, Cc, want_recon and fetch_qc, mesh,
                              fetch_qc, _resolve_rmd(rmd))
    out = run(O, jnp.asarray(cv), jnp.asarray(sv))
    return out, (images, qpd6, ysz, xsz, yp, xp, R, Cc)


def _fetch_lean(out, meta, timer):
    """Fetch one lean-dispatched batch's decision records (ONE device->host
    array round trip) and verify the embedded checksum tail. Returns the
    (B, R, Cc, 106) int8 record array."""
    images, qpd6, ysz, xsz, yp, xp, R, Cc = meta
    B = len(images)
    with timer.phase("fetch"):
        flat = np.asarray(out)                       # (B, n + 4) int8
    n = R * Cc * _REC_DEC
    rec = flat[:, :n]
    t = flat[:, n:].astype(np.int64) & 0xFF
    ck_dev = ((t[:, 0] | (t[:, 1] << 8) | (t[:, 2] << 16) | (t[:, 3] << 24))
              .astype(np.uint32).view(np.int32))
    got = _host_cksum(rec)
    if not np.array_equal(got, ck_dev):
        raise IOError("fast-mode record transfer checksum mismatch "
                      f"(tunnel corruption): {got} != {ck_dev}")
    return rec.reshape(B, R, Cc, _REC_DEC)


def _pack_lean(rec, meta, want_recon, timer, stats_out=None):
    """Host pack from decision records: recompute quant levels + recon from
    the original images (native.pack_forest_img) and emit the streams.
    stats_out: optional list — appends one (cabac_bits, n_ctx_bins,
    n_bypass_bins, recon) tuple per image (native.last_pack_stats; the
    adaptive-price corrective pass reads the realized context-bin cost and
    needs the recon for its RD keep-better comparison even when the caller
    asked want_recon=False)."""
    images, qpd6, ysz, xsz, yp, xp, R, Cc = meta
    streams, recons = [], []
    with timer.phase("pack"):
        for b in range(len(images)):
            s, r = native.pack_forest_img(
                rec[b, :, :, _REC_LAY], rec[b, :, :, _REC_PM],
                rec[b, :, :, _REC_PM4], images[b], qpd6)
            streams.append(s)
            recons.append(r if want_recon else None)
            if stats_out is not None:
                stats_out.append(native.last_pack_stats() + (r,))
    return streams, recons


def _finish_batch(out, meta, want_recon, timer, fetch_qc=False):
    """Fetch one dispatched batch's results, verify transfer checksums, and
    pack streams on the host. fetch_qc must match the dispatch."""
    if not fetch_qc:
        rec = _fetch_lean(out, meta, timer)
        return _pack_lean(rec, meta, want_recon, timer)
    images, qpd6, ysz, xsz, yp, xp, R, Cc = meta
    B = len(images)
    with timer.phase("fetch"):
        side = np.asarray(out[1])
        buf = np.asarray(out[0])
        hS = np.asarray(out[3]) if want_recon else None

    # transfer integrity (always on): device-computed position-weighted
    # checksums must match the received bytes — see _slice_runner_cache
    got = _host_cksum(buf.reshape(B, -1))
    if not np.array_equal(got, side[:, 0]):
        raise IOError("fast-mode record transfer checksum mismatch "
                      f"(tunnel corruption): {got} != {side[:, 0]}")
    if want_recon:
        gotS = _host_cksum(hS.reshape(B, -1))
        if not np.array_equal(gotS, side[:, 2]):
            raise IOError("fast-mode recon transfer checksum mismatch "
                          f"(tunnel corruption): {gotS} != {side[:, 2]}")

    qc_exact = {}
    if side[:, 1].any():                 # rare |level| > 127 escapes
        with timer.phase("fetch"):
            for b in np.flatnonzero(side[:, 1]):
                q16 = np.asarray(out[2][int(b)])
                got16 = _host_cksum(q16.reshape(1, -1))[0]
                if got16 != side[b, 3]:
                    raise IOError("fast-mode qc16 transfer checksum mismatch "
                                  f"(tunnel corruption) on image {b}")
                qc_exact[int(b)] = q16.astype(np.int32)

    streams, recons = [], []
    with timer.phase("pack"):
        for b in range(B):
            qc = qc_exact.get(b, buf[b, :, :, _REC_QC8])
            streams.append(native.pack_forest(
                buf[b, :, :, _REC_LAY], buf[b, :, :, _REC_PM],
                buf[b, :, :, _REC_PM4], qc, ysz, xsz, qpd6))
            recons.append(hS[b] if want_recon else None)
    return streams, recons


def encode_batch_fast(images, qpd6: int, timer=None, want_recon=True,
                      mesh=None, fetch_qc=False, rmd=_RMD_ENV):
    """Wavefront fast mode: encode B same-shaped uint8 grayscale images.

    Returns (streams, recons) like lockstep.encode_batch. Streams are
    standard-compliant HEVC (exact CABAC pack of the device-chosen forest)
    but NOT bit-identical to the reference encoder: decisions use an
    estimated rate model (estimateCoeffRate + MPM-aware pmode bits +
    last-XY length) instead of live-CABAC trial rates. All three partition
    layouts (single TU, TU-split, NxN) are searched. The returned recon is
    exactly what a decoder reconstructs (verified in tests against the
    independent decoder); want_recon=False returns None recons.

    fetch_qc=False (default, round 3): only the ~106 B/CTU decision records
    cross the device->host link; the host pack recomputes the quant levels
    and recon bit-identically from them + the original image (csrc
    replay_cu). fetch_qc=True ships the full 1130 B/CTU records incl. the
    int8 quant planes + the device recon, as in round 2 (the two paths
    produce identical streams/recons — tested — so this is an A/B and
    format-compat knob).

    timer: optional utils.tracing.PhaseTimer — accumulates device_fronts /
    fetch / pack phases (same reporting surface as lockstep.encode_batch).
    mesh: optional jax.sharding.Mesh with an 'img' axis — the batch axis is
    sharded over it (pure data parallelism: fronts have no cross-image
    dependency; streams are identical to the unsharded path).
    """
    if timer is None:
        from hevce_tpu.utils.tracing import PhaseTimer
        timer = PhaseTimer()
    with timer.phase("device_fronts"):
        out, meta = _dispatch_batch(images, qpd6, mesh, want_recon, fetch_qc,
                                    rmd)
        if fetch_qc:
            # block_until_ready can return early on the tunneled axon backend
            # (CLAUDE.md) — a real fetch of the tiny sideband is the only
            # reliable sync, so the device/fetch phase split stays honest.
            # The lean path has no tiny sideband: its single-array fetch
            # includes the device wait (the split is folded into 'fetch').
            np.asarray(out[1])
    return _finish_batch(out, meta, want_recon, timer, fetch_qc)


def encode_many_fast(images, qpd6: int, batch: int = 8, timer=None,
                     want_recon=True, mesh=None, fetch_qc=False,
                     rmd=_RMD_ENV):
    """Throughput-oriented fast-mode encode of a mixed-shape image list.

    Groups images by shape into batches of `batch` and PIPELINES the
    batches: up to 4 batches are dispatched (async) ahead of the
    fetch+pack drain, so the device executes queue back-to-back while the
    host fetches records and packs streams (round-3 tunnel A/B: all-ahead
    3.2 MP/s vs 2.84 for fetch-before-dispatch — the lean fetch is small
    enough that keeping the device busy dominates). Returns (streams,
    recons) in input order; recons entries are None when
    want_recon=False.

    mesh: optional jax.sharding.Mesh with an 'img' axis, forwarded to each
    batch dispatch (image-axis data parallelism). Trailing batches are
    padded by repeating the last image up to the mesh size; the padded
    copies' outputs are dropped.

    Adaptive rate-price correction (lean path, mesh=None; HEVCE_ADAPT=0
    disables): after the primary pass, images whose packed stream exceeds
    ADAPT_BPP_TRIGGER bits/pixel are re-encoded once with a bpp-scaled
    context-bin price (texture-dense images are exactly where the greedy
    model under-splits vs exact RDO — measured calibration at _adapt_rule)
    and the better stream by REAL RD cost is kept, so the pass is strictly
    non-worsening in reference RD terms. Re-dispatches reuse the pass-1
    compiled programs (prices are program inputs).
    """
    if timer is None:
        from hevce_tpu.utils.tracing import PhaseTimer
        timer = PhaseTimer()

    groups = {}
    for i, im in enumerate(images):
        groups.setdefault(im.shape, []).append(i)
    batches = []                     # list of index lists
    for shape in sorted(groups, key=str):
        idx = groups[shape]
        for k in range(0, len(idx), batch):
            batches.append(idx[k:k + batch])

    if not batches:
        return [], []
    streams = [None] * len(images)
    recons = [None] * len(images)

    mode = adapt_mode()

    def dispatch(idx):
        batch_imgs = [images[i] for i in idx]
        n_real = len(batch_imgs)
        if mesh is not None:
            msize = mesh.devices.size
            pad = (-n_real) % msize
            batch_imgs = batch_imgs + [batch_imgs[-1]] * pad
        # 'pre' adaptation: per-image prices predicted from content, set
        # directly in the primary dispatch (no second pass)
        pr = _predict_prices(batch_imgs, qpd6) if mode == "pre" else None
        with timer.phase("dispatch"):
            out, meta = _dispatch_batch(batch_imgs, qpd6, mesh, want_recon,
                                        fetch_qc, rmd, prices=pr)
        return out, meta, idx, n_real

    def place(p_idx, n_real, s, r):
        for j, i in enumerate(p_idx[:n_real]):
            streams[i], recons[i] = s[j], r[j]

    if fetch_qc:
        # full-record mode: fetch+pack are one unit (escape sidebands);
        # simple dispatch-ahead pipelining as in round 2
        pending = None
        for bi, idx in enumerate(batches):
            p = dispatch(idx)
            if pending is not None:
                out, meta, p_idx, n_real = pending
                s, r = _finish_batch(out, meta, want_recon, timer, True)
                place(p_idx, n_real, s, r)
            pending = p
        out, meta, p_idx, n_real = pending
        s, r = _finish_batch(out, meta, want_recon, timer, True)
        place(p_idx, n_real, s, r)
        return streams, recons

    # lean mode: dispatch up to AHEAD batches before draining (measured on
    # the tunnel: all-ahead 3.2 MP/s vs 2.84 fetch-first — the device
    # executes queue back-to-back server-side while the host fetches, packs
    # and uploads; a window bounds in-flight in/out memory). Each batch's
    # D2H record transfer is started ASYNC at dispatch time
    # (copy_to_host_async — it begins as soon as the device finishes that
    # batch), so the tunnel round trip (~0.9 s per 72 images at B=18,
    # round-5 measurement) overlaps the host pack of earlier batches and
    # the blocking np.asarray in _fetch_lean finds the bytes already
    # landed. Single-threaded by design: concurrent tunnel access from a
    # fetch thread is a known backend-wedge risk (CLAUDE.md).
    AHEAD = 4
    from collections import deque
    inflight = deque()
    # 'post' adaptation re-dispatches through the unsharded pass-1
    # programs; the mesh path (CI/dryrun) stays single-pass
    adapt = mode == "post" and mesh is None

    def sse_of(img, rcon):
        h, w = img.shape
        d = img.astype(np.int64) - rcon[:h, :w].astype(np.int64)
        return int((d * d).sum())

    def enqueue(item):
        try:
            item[0].copy_to_host_async()
        except AttributeError:       # backend without async D2H
            pass
        inflight.append(item)

    def flag_and_redispatch(p_idx, n_real, st):
        """Corrective pass, PIPELINED (round-5: a single post-drain
        corrective batch serialized a full exposed device slice per call —
        bench 8.4 -> 3.0 MP/s — so corrections dispatch as soon as their
        source batch's realized stats exist and ride the same in-flight
        queue, overlapping the remaining drains)."""
        flags = []                   # (image index, sse1, (ctx, sig))
        for j, i in enumerate(p_idx[:n_real]):
            bits, nctx, nbyp, r1 = st[j]
            corr = _adapt_rule(bits, nctx, nbyp, int(images[i].size), qpd6)
            if corr is not None:
                flags.append((i, sse_of(images[i], r1), corr))
        if not flags:
            return
        # pad with the last flagged image up to the SOURCE batch's size so
        # the pass-1 compiled program is reused (no new compile)
        pad = [f[0] for f in flags] + [flags[-1][0]] * (n_real - len(flags))
        pad = pad[:n_real]
        prices = (np.array([flags[min(k, len(flags) - 1)][2][0]
                            for k in range(len(pad))], np.int32),
                  np.array([flags[min(k, len(flags) - 1)][2][1]
                            for k in range(len(pad))], np.int32))
        with timer.phase("dispatch"):
            out, meta = _dispatch_batch([images[i] for i in pad], qpd6,
                                        None, False, fetch_qc, rmd,
                                        prices=prices)
        enqueue((out, meta, pad, len(flags), flags))

    def drain_one():
        item = inflight.popleft()
        if len(item) == 4:           # primary batch
            out, meta, p_idx, n_real = item
            rec = _fetch_lean(out, meta, timer)
            st = [] if adapt else None
            s, r = _pack_lean(rec, meta, want_recon, timer, stats_out=st)
            place(p_idx, n_real, s, r)
            if adapt:
                flag_and_redispatch(p_idx, n_real, st)
            return
        out, meta, pad, n_flag, flags = item        # corrective batch
        rec = _fetch_lean(out, meta, timer)
        st2 = []
        s2, _ = _pack_lean(rec, meta, False, timer, stats_out=st2)
        for j, (i, sse1, _corr) in enumerate(flags):
            sse2 = sse_of(images[i], st2[j][3])
            dbits = (len(s2[j]) - len(streams[i])) * 8
            allow = int(ADAPT_BPP_ALLOW * images[i].size)
            if (sse2 < sse1 and dbits <= allow) or \
                    (sse2 <= sse1 and dbits < 0):
                streams[i] = s2[j]
                if want_recon:
                    recons[i] = st2[j][3]

    for idx in batches:
        if len(inflight) >= AHEAD:
            drain_one()
        enqueue(dispatch(idx))
    while inflight:
        drain_one()
    return streams, recons


def adapt_mode() -> str:
    """Adaptive per-image rate-price correction mode (VERDICT r4 item 3):
      'pre'  (default) — predict rate density from image gradients BEFORE
             encoding and set per-image prices in the primary dispatch:
             zero extra device/host work (the measured-bpp two-pass cost a
             full extra device slice per flagged shape batch — bench
             8.4 -> 3.6 MP/s even pipelined);
      'post' — measured-bpp two-pass with the SSE keep-policy (slower,
             but self-verifying: corrections only ever improve);
      '0'    — off."""
    v = os.environ.get("HEVCE_ADAPT", "pre").strip().lower()
    if v in ("1", "on", "pre", ""):
        return "pre"
    if v == "post":
        return "post"
    return "0"


# pre-pass predictor (calibrated on Kodak-24 @ qpd6=2): mean |horizontal| +
# |vertical| pixel gradient ranks the rate-density tail cleanly — grad >= 25
# captures exactly the >=3.04-bpp outliers (13: 34.0, 08: 30.6, 01: 25.6,
# 05: 25.2; next is 18 at 19.9) with no false positives, and the resulting
# prices match the measured-bpp rule on the worst image (0.60*25/34 = 0.44
# vs 0.439 from 4.07 bpp). Gradient is a pure content measure, so the
# trigger is qpd6-independent; qpd6=0 is excluded (the fast mode is not
# servable there at any price — ROADMAP round 5).
ADAPT_GRAD_TRIGGER = 25.0


def _grad_energy(img) -> float:
    im = img.astype(np.int32)
    return float(np.abs(np.diff(im, axis=1)).mean()
                 + np.abs(np.diff(im, axis=0)).mean())


def _predict_prices(imgs, qpd6: int):
    """per-image (ctx, sig) price arrays for one batch, or None if every
    image is below the trigger (the constant-knob fast path)."""
    if qpd6 == 0:
        return None
    base = _ctx_default(qpd6)
    cv = np.full(len(imgs), base, np.int32)
    hit = False
    for k, im in enumerate(imgs):
        g = _grad_energy(im)
        if g >= ADAPT_GRAD_TRIGGER:
            ctx = int(ADAPT_PRICE_AT_TRIGGER * ADAPT_GRAD_TRIGGER / g)
            cv[k] = max(ADAPT_FLOOR, min(ctx, base))
            hit = True
    if not hit:
        return None
    return cv, np.full(len(imgs), SIG_ZERO, np.int32)


# Adaptive-price rule (calibrated on Kodak-24, ROADMAP round 5): the
# fast mode's quality loss vs exact RDO correlates with packed BITS PER
# PIXEL, not with the realized per-bin cost (measured: realized avg ctx
# cost clusters at 0.67-0.81 bit across all 24 images with no relation to
# dPSNR, while the 5 worst images are exactly the 5 with >= 3.0 packed
# bpp). High-rate (texture-dense) images need a LOWER context price: the
# exact encoder splits/signals far more than the greedy model predicts
# profitable, and cheapening context bins reproduces that (the image-13
# under-split story, ROADMAP round 3). Flagged images re-encode once at a
# bpp-scaled price and the better stream by REAL RD cost is kept — the
# keep rule makes the pass strictly non-worsening in reference RD terms.
# Sweep evidence: image 13 (4.07 bpp) improves -0.353 -> -0.268 dB at
# price ~0.45; gains flatten below that (0.50 -> -0.273, 0.55 -> -0.287).
# per-qpd6 bpp triggers = 1.25 x the Kodak-24 exact-stream median bpp at
# that qpd6 (measured: 4.71 / 2.40 / 0.79 at qpd6 0/2/4; qpd6 1/3
# geometrically interpolated). Rate density is qpd6-relative — a 3.0-bpp
# stream is an outlier at qpd6=2 but below the median at qpd6=0.
ADAPT_BPP_TRIGGER = {0: 5.9, 1: 4.2, 2: 3.0, 3: 1.7, 4: 1.0}
ADAPT_PRICE_AT_TRIGGER = 0.60 * BIT   # price (<<15) at the trigger bpp
ADAPT_FLOOR = int(0.40 * BIT)         # price floor (sweep: gains flatten)
# keep policy: the corrected pass is kept only if SSE strictly improves AND
# the extra rate stays under this many bits/pixel (reference-λ RD keeps
# would reject the trade — measured on image 13: ΔSSE -7726 for +6440 bits
# is RD-negative at wd=11/wb=16 — but the published quality envelope is a
# PSNR floor under a SIZE CAP, so the policy buys bounded rate for tail
# quality; worst-case size impact is ADAPT_BPP_ALLOW/bpp < 0.7%)
ADAPT_BPP_ALLOW = 0.02


def _adapt_rule(bits: int, nctx: int, nbyp: int, npix: int, qpd6: int = 2):
    """(realized pack stats, pixel count, qpd6) -> corrected (ctx, sig)
    prices or None."""
    if npix <= 0 or bits <= 0:
        return None
    trigger = ADAPT_BPP_TRIGGER[qpd6]
    bpp = bits / npix
    if bpp < trigger:
        return None
    ctx = int(ADAPT_PRICE_AT_TRIGGER * trigger / bpp)
    ctx = max(ADAPT_FLOOR, min(ctx, _ctx_default(qpd6)))
    # SIG_ZERO stays UNSCALED: the image-13 A/B measured sig-default
    # strictly better than proportionally-scaled sig (47.382 vs 47.366 dB
    # at +124 B) — the pre-last-zero charge already prices a different
    # phenomenon than the context-bin average
    return ctx, SIG_ZERO


def encode_image_fast(img, qpd6: int):
    """single-image wavefront fast encode; returns (stream bytes, recon).
    NOTE: no adaptive price correction on this path (encode_many_fast's
    lean path carries it) — diagnosis tools rely on the single-pass
    behavior."""
    s, r = encode_batch_fast([img], qpd6)
    return s[0], r[0]


def encode_many_exact(images, qpd6: int, nthreads: int = 0, timer=None,
                      batch: int = 8):
    """BIT-EXACT batch encode accelerated by the device oracle.

    The wavefront fast mode's near-optimal decisions (lay/pm/pm4 — the
    record buffer's hint prefix) are computed on device, then the native
    engine re-runs the exact reference RDO with the hinted candidate FIRST
    in each node's trial order. Ordering is decision-safe (the arbiter's
    tie-break tracks reference indices, csrc process_cu), so streams are
    byte-identical to encode_image_native — the hints only make the
    provable prunes (dist floor, bit budget, mid-trial abort) bite
    immediately instead of after the first few SSE-ordered trials.

    Device slices for later batches overlap host encodes of earlier ones
    (the host RDO is the long pole). Returns (streams, recons)."""
    if timer is None:
        from hevce_tpu.utils.tracing import PhaseTimer
        timer = PhaseTimer()

    groups = {}
    for i, im in enumerate(images):
        groups.setdefault(im.shape, []).append(i)
    batches = []
    for shape in sorted(groups, key=str):
        idx = groups[shape]
        for k in range(0, len(idx), batch):
            batches.append(idx[k:k + batch])
    if not batches:
        return [], []

    streams = [None] * len(images)
    recons = [None] * len(images)
    pending = []
    for idx in batches:
        with timer.phase("dispatch"):
            out, meta = _dispatch_batch(
                [images[i] for i in idx], qpd6, want_recon=False)
        pending.append((out, meta, idx))
    for out, meta, idx in pending:
        # lean decision records (checksum-verified) ARE the hint payload
        hints = np.ascontiguousarray(_fetch_lean(out, meta, timer))
        with timer.phase("host_rdo"):
            s, r = native.encode_many_native(
                [images[i] for i in idx], qpd6, nthreads, hints=hints)
        for j, i in enumerate(idx):
            streams[i], recons[i] = s[j], r[j]
    return streams, recons


@functools.lru_cache(maxsize=None)
def front_macs_per_ctu(rmd=None) -> int:
    """Lower-bound MXU MAC count of the front core per CTU: the constant-
    matrix intra-prediction matmuls plus the digit-split transform matmuls
    (5 int8 matmuls forward, 6 inverse — ops/xform.exact_matmul digit
    counts). Elementwise RDOQ/SSE/rate-estimate work is excluded, so the
    bench's device-utilization number is a conservative lower bound.

    rmd=(K, T) counts the RMD-preselected core (_eval_node_rmd): SATD
    Hadamard matmuls added, pipeline on K modes, TU-split on T lanes."""
    from hevce_tpu.ops import intra

    def predict(sz):
        w = intra._angular_matrix(sz)              # (35, sz*sz, n_border)
        return int(w.shape[0]) * int(w.shape[1]) * int(w.shape[2])

    def xf(sz, m=MODES):                           # fwd 5 + inv 6 digit matmuls
        return 11 * m * sz ** 3

    def satd(sz):                                  # 2 Hadamard exact_matmuls,
        return MODES * 4 * sz ** 3                 # 2 int8 digits each

    if rmd is None:
        def node(sz):                              # _eval_node: 2Nx2N + TU-split
            h = sz // 2
            return predict(sz) + xf(sz) + 4 * (predict(h) + xf(h))

        pu4 = predict(4) + xf(4)                   # one extra 4x4 PU pipeline
        return 16 * (node(8) + 3 * pu4) + 4 * node(16) + node(32)

    K, T = rmd
    K, T = min(K, MODES), min(min(T, K), MODES)

    def node(sz):                                  # _eval_node_rmd
        h = sz // 2
        # all-35 prediction feeds the SATD ranking; the pipeline runs on K
        # modes; the TU-split runs on T lanes, each predicting all 35 modes
        # from its own chained borders (_select_pred one-hot selection)
        return (predict(sz) + satd(sz) + xf(sz, K)
                + 4 * (T * predict(h) + xf(h, T)))

    pu4 = predict(4) + xf(4)
    # NxN evaluates all four PUs densely (no TU-split sub0 reuse under RMD)
    return 16 * (node(8) + 4 * pu4) + 4 * node(16) + node(32)
