"""Device-side residual-coding op-string generation (ROADMAP Phase B, part 2).

Turns quantized TU blocks into the exact CABAC op strings that putCoef
(reference src/HEVCe.c:1173-1269) would encode, entirely as tensor ops:
combined with ops/cabac_sim.py this computes exact rates for thousands of
candidates with no host work.

Strategy: emit ops into a fixed "mega layout" with validity masks — a 40-slot
last-significant segment followed by one fixed-size segment per coefficient
group in reverse scan order — then compact valid ops to the front with a
prefix-sum scatter. All sequential dependencies (c1 context chain across CGs,
Golomb-Rice rparam within a CG) have closed forms or tiny static loops.

Layout per CG (reverse scan order): [cg_sig 1][sig 16][gt1 8][gt2 1][sign 16]
[escape 16 x E]. E = 34 covers the worst escape (value 32767, rparam 0).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hevce_tpu.bitstream import cabac as cb
from hevce_tpu.bitstream import syntax as syn
from hevce_tpu.ops import cabac_sim as sim

# ops per escaped coefficient: <=3 prefix chunks (plen <= 24) + 2 suffix
# chunks (slen <= 16), bypass runs of <= 8 bins each
E_ESC = 5
CG_SEG = 1 + 16 + 8 + 1 + 2 + 16 * E_ESC   # cg_sig, sig, gt1, gt2, signs, esc
LAST_SEG = 28


def _pack(kind, ctx, binv):
    return kind | (ctx << 2) | (binv << 10)


@functools.lru_cache(maxsize=None)
def _tables(sz: int):
    """static per-size tables for all three scan types.

    Returns dict of numpy arrays indexed [scan_type(3)][...]:
      pos:    (3, n) flat pixel index per scan index
      ypos/xpos: (3, n) coordinates
      sig_base:(3, 16) sig ctx index for positions in a NON-first CG given
               sig_ctx in 0..3  -> shaped (3, 4, 16)
      sig_first:(3, 4, 16) same for the first CG
      cg_right/cg_below: (3, ncg2) CG scan index of spatial right/below
               neighbor, -1 if outside
      gmax, group_idx, min_in_group, last addr/sft constants
    """
    n = sz * sz
    ncg = sz // 4
    ncg2 = ncg * ncg
    pos = np.zeros((3, n), np.int32)
    ypos = np.zeros((3, n), np.int32)
    xpos = np.zeros((3, n), np.int32)
    sig_idx = np.zeros((3, 4, n), np.int32)   # per scan pos, per sig_ctx value
    cg_right = np.full((3, ncg2), -1, np.int32)
    cg_below = np.full((3, ncg2), -1, np.int32)
    for st in range(3):
        if st != syn.SCAN_DIAG and sz > 8:
            continue
        tab = syn.scan_table(sz, st)
        pos[st] = tab[:, 0] * sz + tab[:, 1]
        ypos[st] = tab[:, 0]
        xpos[st] = tab[:, 1]
        # CG spatial -> scan index map
        cg_of_scan = {}
        for g in range(ncg2):
            y, x = tab[g * 16, 0] // 4, tab[g * 16, 1] // 4
            cg_of_scan[(y, x)] = g
        for g in range(ncg2):
            y, x = tab[g * 16, 0] // 4, tab[g * 16, 1] // 4
            if x + 1 < ncg:
                cg_right[st, g] = cg_of_scan[(y, x + 1)]
            if y + 1 < ncg:
                cg_below[st, g] = cg_of_scan[(y + 1, x)]
        for i in range(n):
            y, x = int(tab[i, 0]), int(tab[i, 1])
            for sc in range(4):
                sig_idx[st, sc, i] = syn.sig_ctx_idx(sz, False, st, y, x, sc)
    return dict(pos=pos, ypos=ypos, xpos=xpos, sig_idx=sig_idx,
                cg_right=cg_right, cg_below=cg_below)


def _group_index(t):
    """GROUP_INDEX[t] arithmetically (t in 0..31): t for t<4, else
    2*(bitlen(t)-1) + bit below the MSB (H.265 last-significant grouping)."""
    blen = (1 + (t >= 2).astype(jnp.int32) + (t >= 4) + (t >= 8) + (t >= 16))
    msb1 = (t >> jnp.maximum(blen - 2, 0)) & 1
    return jnp.where(t < 4, t, 2 * (blen - 1) + msb1)


def _min_in_group(g):
    """MIN_IN_GROUP[g] arithmetically: g for g<4, else (2+(g&1)) << (g/2 - 1)."""
    return jnp.where(g < 4, g, (2 + (g & 1)) << jnp.maximum((g >> 1) - 1, 0))


def _last_xy_ops(sz, st, y, x):
    """last-significant-XY segment ops (LAST_SEG slots) + valid mask.

    y/x/st: (lanes,). Mirrors put_last_significant_xy (src/HEVCe.c:1046-1087)
    for luma. Gather-free (table lookups are closed-form).
    """
    addr = int(syn._LAST_ADDR[0][sz // 8])
    sft = int(syn._LAST_SFT[0][sz // 8])
    gmax = int(syn.GROUP_INDEX[sz - 1])

    ty = jnp.where(st == syn.SCAN_VER, x, y)
    tx = jnp.where(st == syn.SCAN_VER, y, x)
    gy = _group_index(ty)
    gx = _group_index(tx)

    lanes = y.shape[0]
    ops = jnp.zeros((lanes, LAST_SEG), jnp.int32)
    val = jnp.zeros((lanes, LAST_SEG), bool)
    slot = 0

    def ctx_run(ops, val, slot, g, base_ctx):
        # g ctx-coded 1-bins at ctx base+(i>>sft), then a 0-bin if g < gmax
        for i in range(gmax):
            op = _pack(sim.KIND_CTX, 0, 1) + ((base_ctx + (i >> sft)) << 2)
            ops = ops.at[:, slot].set(op)
            val = val.at[:, slot].set(i < g)
            slot += 1
        op0 = _pack(sim.KIND_CTX, 0, 0)
        ops = ops.at[:, slot].set(op0 + ((base_ctx + (jnp.minimum(g, gmax - 1) >> sft)) << 2))
        val = val.at[:, slot].set(g < gmax)
        slot += 1
        return ops, val, slot

    ops, val, slot = ctx_run(ops, val, slot, gx, cb.CTX_LAST_X + 5 * addr)
    ops, val, slot = ctx_run(ops, val, slot, gy, cb.CTX_LAST_Y + 5 * addr)

    # suffix bypass bits, emitted one bin per op exactly like the reference's
    # per-bit CABACputBins calls (src/HEVCe.c:1076-1086)
    maxsuf = max((gmax - 2) >> 1, 0)
    for t_coord, g in ((tx, gx), (ty, gy)):
        rem = t_coord - _min_in_group(g)
        nb = jnp.where(g > 3, ((g - 2) >> 1), 0)
        for i in range(maxsuf):
            bitpos = nb - 1 - i
            b = (rem >> jnp.maximum(bitpos, 0)) & 1
            ops = ops.at[:, slot].set(sim.KIND_BYPASS + (1 << 2) + (b << 6))
            val = val.at[:, slot].set(bitpos >= 0)
            slot += 1
    assert slot <= LAST_SEG, slot
    return ops, val


def generate_put_coef_ops(sz: int, pmode, blk, code_zero_blocks: bool = False):
    """op strings for fresh/live putCoef of (lanes, sz, sz) blocks.

    pmode: (lanes,) int32 (selects the scan), blk int32 quantized levels.
    Returns (ops, valid): (lanes, TOTAL) mega-layout op words + validity.

    code_zero_blocks=False (cbf-guarded coding): all-zero lanes get no ops.
    code_zero_blocks=True mirrors the reference step-4 rate approximation
    (src/HEVCe.c:1516 calls putCoef unconditionally): an all-zero block
    encodes just last_significant_xy at (0,0).
    """
    T = _tables(sz)
    n = sz * sz
    ncg2 = n // 16
    lanes = blk.shape[0]
    li = jnp.arange(lanes)

    # scan type from pmode (src/HEVCe.c:1134-1150)
    if sz <= 8:
        st = jnp.where(jnp.abs(pmode - 26) <= 4, syn.SCAN_HOR,
                       jnp.where(jnp.abs(pmode - 10) <= 4, syn.SCAN_VER,
                                 syn.SCAN_DIAG))
    else:
        st = jnp.zeros_like(pmode)

    # scan reorder via static permutations selected by a where-chain
    # (dynamic gathers compile pathologically on the TPU backend)
    def sel3(f):
        a = f(0)
        if sz > 8:
            return a
        return jnp.where((st == 1)[:, None] if a.ndim > 1 else (st == 1), f(1),
                         jnp.where((st == 2)[:, None] if a.ndim > 1 else (st == 2),
                                   f(2), a))

    flat = blk.reshape(lanes, n)
    vals = sel3(lambda s: flat[:, T["pos"][s]])
    nz = vals != 0
    absv = jnp.abs(vals)
    sign = (vals < 0).astype(jnp.int32)
    has_any = jnp.any(nz, axis=1)
    i_last = jnp.where(has_any, n - 1 - jnp.argmax(nz[:, ::-1], axis=1), 0)
    g_last = i_last // 16
    k_last = i_last % 16

    cg_nz = nz.reshape(lanes, ncg2, 16)
    cg_abs = absv.reshape(lanes, ncg2, 16)
    cg_sign = sign.reshape(lanes, ncg2, 16)
    sig_cg = jnp.any(cg_nz, axis=2)

    # neighbor-CG significance -> sig_ctx per CG (src/HEVCe.c:1208-1211)
    def nbr(tab):
        def f(s):
            idx = tab[s]
            return jnp.where(idx >= 0, sig_cg[:, np.maximum(idx, 0)], False)
        return sel3(f)
    right = nbr(T["cg_right"])
    below = nbr(T["cg_below"])
    sig_ctx = (below.astype(jnp.int32) << 1) | right.astype(jnp.int32)

    # --- per-CG reverse-order nonzero ranking (k=15..0) ---
    rev = cg_nz[:, :, ::-1]
    rank_rev = jnp.cumsum(rev, axis=2) - rev                   # rank among nz, reverse order
    rank = rank_rev[:, :, ::-1]                                # (lanes, ncg2, 16) valid where nz
    nnz = cg_nz.sum(axis=2)

    # j-th (reverse-order) nonzero's |value| and sign, j = 0..15
    jj = jnp.arange(16)
    sel = (rank[:, :, :, None] == jj) & cg_nz[:, :, :, None]   # (l, g, 16, j)
    a_j = (cg_abs[:, :, :, None] * sel).sum(axis=2)            # (l, g, 16)
    s_j = (cg_sign[:, :, :, None] * sel).sum(axis=2)

    a8 = a_j[:, :, :8]
    gt1_any_before = jnp.cumsum((a8 > 1).astype(jnp.int32), axis=2) - (a8 > 1)
    c1_j = jnp.where(gt1_any_before > 0, 0, jnp.minimum(1 + jj[:8], 3))
    count8 = jnp.minimum(nnz, 8)
    ngt1 = (a8 > 1).sum(axis=2)
    c1_out = jnp.where(ngt1 > 0, 0, jnp.minimum(1 + count8, 3))
    # c1 chain across CGs in processing (reverse-scan) order (src/HEVCe.c:1230-1233):
    # c1 into CG g = c1_out of the previously PROCESSED CG with nnz>0, else 1.
    c1_in_per_g = [None] * ncg2
    c1_run = jnp.ones((lanes,), jnp.int32)
    for g in range(ncg2 - 1, -1, -1):
        c1_in_per_g[g] = c1_run
        processed = (g <= g_last) & (nnz[:, g] > 0)
        c1_run = jnp.where(processed, c1_out[:, g], c1_run)
    c1_in = jnp.stack(c1_in_per_g, axis=1)                      # (lanes, ncg2)

    # luma ctx_set: +2 if not the first CG, +1 if incoming c1 == 0
    ctx_set = (jnp.arange(ncg2)[None, :] != 0).astype(jnp.int32) * 2 \
        + (c1_in == 0).astype(jnp.int32)
    # first gt1 coefficient value (for gt2 + escape base); one-hot masked sum
    # instead of argmax+gather (per-element gathers lower to serial kCustom
    # fusions on TPU). Zero when no gt1 exists — guarded by has_gt1 below.
    gt1_mask = a8 > 1
    first_gt1_oh = gt1_mask & (jnp.cumsum(gt1_mask, axis=2) == 1)
    first_gt1_val = (a8 * first_gt1_oh).sum(axis=2)
    has_gt1 = ngt1 > 0
    escape = (nnz > 8) | (ngt1 >= 2) | (has_gt1 & (first_gt1_val > 2))

    # escape values + rparam/first_coeff2 evolution (src/HEVCe.c:1254-1266)
    esc_plen = jnp.zeros((lanes, ncg2, 16), jnp.int32)   # prefix bin count
    esc_slen = jnp.zeros((lanes, ncg2, 16), jnp.int32)   # suffix bin count
    esc_sval = jnp.zeros((lanes, ncg2, 16), jnp.int32)   # suffix value
    esc_do = jnp.zeros((lanes, ncg2, 16), bool)
    rparam = jnp.zeros((lanes, ncg2), jnp.int32)
    seen_ge2 = jnp.zeros((lanes, ncg2), bool)
    for j in range(16):
        a = a_j[:, :, j]
        base = jnp.where(j < 8, jnp.where(seen_ge2, 2, 3), 1)
        esc_v = a - base
        do = (j < nnz) & (esc_v >= 0) & escape
        r = rparam
        # case A: esc_v < 3<<r : prefix (len+1) bins; suffix r bins
        lenA = esc_v >> r
        # case B: find len via the reference loop (<= 15+4 iterations)
        vv = esc_v - (3 << r)
        lenB = r + 0
        for _ in range(16):
            cond = vv >= (1 << lenB)
            vv = jnp.where(cond, vv - (1 << lenB), vv)
            lenB = jnp.where(cond, lenB + 1, lenB)
        isA = esc_v < (3 << r)
        plen = jnp.where(isA, lenA + 1, 4 + lenB - r)
        slen = jnp.where(isA, r, lenB)
        sval = jnp.where(isA, esc_v & ((1 << jnp.maximum(r, 0)) - 1), vv)
        esc_plen = esc_plen.at[:, :, j].set(jnp.where(do, plen, 0))
        esc_slen = esc_slen.at[:, :, j].set(jnp.where(do, slen, 0))
        esc_sval = esc_sval.at[:, :, j].set(sval)
        esc_do = esc_do.at[:, :, j].set(do)
        rparam = jnp.where(do & (a > (3 << r)), jnp.minimum(r + 1, 4), rparam)
        seen_ge2 = seen_ge2 | ((j < nnz) & (a >= 2))

    # --- emit the mega layout via bulk tensor assembly (compile-friendly) ---
    gg = jnp.arange(ncg2)
    in_range = gg[None, :] <= g_last[:, None]                     # (lanes, ncg2)
    is_lastcg = gg[None, :] == g_last[:, None]

    # cg_sig column (lanes, ncg2, 1)
    cg_sig_op = (_pack(sim.KIND_CTX, 0, 0)
                 + ((cb.CTX_SIG_MAP + (sig_ctx != 0).astype(jnp.int32)) << 2)
                 + (sig_cg.astype(jnp.int32) << 10))[:, :, None]
    cg_sig_val = (in_range & ~is_lastcg & (gg[None, :] != 0))[:, :, None]

    # sig bins (lanes, ncg2, 16) built k-ascending then flipped to k=15..0.
    # ctx index per (st, sig_ctx) via static tables + where-chains.
    def cidx_for(s):
        tabs = T["sig_idx"][s].reshape(4, ncg2, 16)    # static numpy
        out = jnp.broadcast_to(jnp.asarray(tabs[0]), (lanes, ncg2, 16))
        for scv in (1, 2, 3):
            out = jnp.where((sig_ctx == scv)[:, :, None], jnp.asarray(tabs[scv]), out)
        return out
    if sz > 8:
        cidx = cidx_for(0)
    else:
        cidx = jnp.where((st == 1)[:, None, None], cidx_for(1),
                         jnp.where((st == 2)[:, None, None], cidx_for(2),
                                   cidx_for(0)))
    sig_op = (_pack(sim.KIND_CTX, 0, 0) + ((cb.CTX_SIG_SC + cidx) << 2)
              + (cg_nz.astype(jnp.int32) << 10))
    kk = jnp.arange(16)
    i_scan = gg[None, :, None] * 16 + kk[None, None, :]
    nnz_after = nnz[:, :, None] - jnp.cumsum(cg_nz, axis=2)
    sig_val = (in_range[:, :, None]
               & jnp.where(is_lastcg[:, :, None], i_scan < i_last[:, None, None], True)
               & ((gg[None, :, None] == 0)
                  | (sig_cg[:, :, None] & ((kk[None, None, :] != 0) | (nnz_after > 0)))))
    sig_op = sig_op[:, :, ::-1]
    sig_val = sig_val[:, :, ::-1]

    # gt1 (lanes, ncg2, 8)
    gt1_op = (_pack(sim.KIND_CTX, 0, 0)
              + ((cb.CTX_ONE_SC + 4 * ctx_set[:, :, None] + c1_j) << 2)
              + ((a8 > 1).astype(jnp.int32) << 10))
    gt1_val = in_range[:, :, None] & (jj[None, None, :8] < nnz[:, :, None])

    # gt2 (lanes, ncg2, 1)
    gt2_op = (_pack(sim.KIND_CTX, 0, 0) + ((cb.CTX_ABS_SC + ctx_set) << 2)
              + ((first_gt1_val > 2).astype(jnp.int32) << 10))[:, :, None]
    gt2_val = (in_range & has_gt1)[:, :, None]

    # signs: one or two bypass chunks per CG (MSB-first collected value)
    sign_value = (s_j << jnp.clip(nnz[:, :, None] - 1 - jj[None, None, :], 0, 31)).sum(axis=2)
    c1n = jnp.minimum(nnz, 8)
    c2n = jnp.clip(nnz - 8, 0, 8)
    s_chunk1 = (sign_value >> c2n) & 0xFF
    s_chunk2 = sign_value & ((1 << c2n) - 1)
    sign_op = jnp.stack([sim.KIND_BYPASS + (c1n << 2) + (s_chunk1 << 6),
                         sim.KIND_BYPASS + (c2n << 2) + (s_chunk2 << 6)], axis=2)
    sign_val = jnp.stack([in_range & (nnz > 0), in_range & (nnz > 8)], axis=2)

    # escapes: per coeff <=3 prefix chunks ((plen-1) ones + a 0) + 2 suffix chunks
    def chunk_lens(total, maxchunks):
        return [jnp.clip(total - 8 * k, 0, 8) for k in range(maxchunks)]

    p1, p2, p3 = chunk_lens(esc_plen, 3)
    # the chunk containing the final 0-bin is the last nonempty one
    def pre_val(lk, is_last):
        full = (1 << lk) - 1
        return jnp.where(is_last, full - 1, full)
    pv1 = pre_val(p1, esc_plen <= 8)
    pv2 = pre_val(p2, esc_plen <= 16)
    pv3 = pre_val(p3, True)
    s1, s2 = chunk_lens(esc_slen, 2)
    sv1 = (esc_sval >> s2) & 0xFF
    sv2 = esc_sval & ((1 << s2) - 1)
    esc_parts_op = [sim.KIND_BYPASS + (p1 << 2) + (pv1 << 6),
                    sim.KIND_BYPASS + (p2 << 2) + (pv2 << 6),
                    sim.KIND_BYPASS + (p3 << 2) + (pv3 << 6),
                    sim.KIND_BYPASS + (s1 << 2) + (sv1 << 6),
                    sim.KIND_BYPASS + (s2 << 2) + (sv2 << 6)]
    esc_parts_val = [p1 > 0, p2 > 0, p3 > 0, s1 > 0, s2 > 0]
    doin = esc_do & in_range[:, :, None]
    esc_op = jnp.stack(esc_parts_op, axis=3).reshape(lanes, ncg2, 16 * E_ESC)
    esc_val = jnp.stack([v & doin for v in esc_parts_val],
                        axis=3).reshape(lanes, ncg2, 16 * E_ESC)

    cg_ops = jnp.concatenate([cg_sig_op, sig_op, gt1_op, gt2_op, sign_op, esc_op],
                             axis=2)                                # (lanes, ncg2, CG_SEG)
    cg_vals = jnp.concatenate([cg_sig_val, sig_val, gt1_val, gt2_val, sign_val,
                               esc_val], axis=2)
    # layout wants CGs in processing order (g = ncg2-1 .. 0)
    cg_ops = cg_ops[:, ::-1, :].reshape(lanes, ncg2 * CG_SEG)
    cg_vals = cg_vals[:, ::-1, :].reshape(lanes, ncg2 * CG_SEG)

    # (y, x) of the last significant position via a masked sum (gather-free)
    onehot_last = (jnp.arange(n)[None, :] == i_last[:, None]).astype(jnp.int32)
    ypos = sel3(lambda s: jnp.broadcast_to(jnp.asarray(T["ypos"][s]), (lanes, n)))
    xpos = sel3(lambda s: jnp.broadcast_to(jnp.asarray(T["xpos"][s]), (lanes, n)))
    ly = (onehot_last * ypos).sum(axis=-1)
    lx = (onehot_last * xpos).sum(axis=-1)
    lops, lval = _last_xy_ops(sz, st, ly, lx)

    ops = jnp.concatenate([lops, cg_ops], axis=1)
    valid = jnp.concatenate([lval, cg_vals], axis=1)
    if not code_zero_blocks:
        valid = valid & has_any[:, None]
    return ops, valid


def compact_ops(ops, valid, cap: int):
    """compact valid ops to the front; returns ((lanes, cap) nop-padded array,
    overflow flag per lane (total ops > cap -> host fallback), op counts)."""
    lanes = ops.shape[0]
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    total = jnp.sum(valid, axis=1)
    out = jnp.full((lanes, cap + 1), sim.KIND_NOP, jnp.int32)
    tgt = jnp.where(valid, jnp.minimum(pos, cap), cap)
    out = out.at[jnp.arange(lanes)[:, None], tgt].set(
        jnp.where(valid, ops, sim.KIND_NOP))
    return out[:, :cap], total > cap, jnp.minimum(total, cap)


@functools.lru_cache(maxsize=None)
def _palette(sz: int, full_trial: bool):
    """static context palette: the set of ctx indices a trial at this size can
    touch (~60-70 of 142). Simulating over the palette instead of the full
    vector roughly halves the per-bin one-hot work (ROADMAP Phase B).

    Returns (palette (P,), remap (142,)): palette[p] = full ctx index,
    remap[full] = palette slot (unreachable -> 0, never emitted)."""
    idxs = set()
    # a full trial codes residuals at size sz (single TU) AND sz/2 (TU split)
    for s in ((sz, sz // 2) if full_trial and sz > 4 else (sz,)):
        T = _tables(s)
        gmax = int(syn.GROUP_INDEX[s - 1])
        addr = int(syn._LAST_ADDR[0][s // 8])
        sft = int(syn._LAST_SFT[0][s // 8])
        idxs.update((cb.CTX_SIG_SC + v) for v in np.unique(T["sig_idx"]).tolist())
        for g in range(gmax + 1):
            idxs.add(cb.CTX_LAST_X + 5 * addr + (g >> sft))
            idxs.add(cb.CTX_LAST_Y + 5 * addr + (g >> sft))
    idxs.update(cb.CTX_SIG_MAP + k for k in (0, 1))
    idxs.update(cb.CTX_ONE_SC + k for k in range(16))      # luma ctx_set 0..3
    idxs.update(cb.CTX_ABS_SC + k for k in range(4))
    if full_trial:
        idxs.update(cb.CTX_SPLIT_CU + k for k in range(3))
        idxs.update((cb.CTX_PARTSIZE, cb.CTX_Y_PMODE, cb.CTX_UV_PMODE))
        idxs.update(cb.CTX_SPLIT_TU + k for k in range(3))
        idxs.update(cb.CTX_Y_QT_CBF + k for k in (0, 1))
        idxs.add(cb.CTX_UV_QT_CBF)
    palette = np.array(sorted(idxs), np.int32)
    remap = np.zeros(256, np.int32)
    remap[palette] = np.arange(len(palette), dtype=np.int32)
    return palette, remap


def remap_ctx_ops(ops, remap_np):
    """rewrite the ctx-index field of context-coded ops into palette slots
    (bit-sliced lookup over the static 256-entry remap; gather-free)."""
    kind = ops & 3
    cidx = (ops >> 2) & 0xFF
    planes = _remap_planes(remap_np.tobytes())
    new_cidx = sim._lookup(planes, cidx)
    rebuilt = sim.KIND_CTX | (new_cidx << 2) | (ops & (1 << 10))
    return jnp.where(kind == sim.KIND_CTX, rebuilt, ops)


@functools.lru_cache(maxsize=None)
def _remap_planes(remap_bytes: bytes):
    return sim._bitsliced(np.frombuffer(remap_bytes, np.int32), 7)


def _mpm3(left, above):
    """vectorized 3-entry MPM derivation (src/HEVCe.c:958-977); (lanes,) ints."""
    third_neq = jnp.where((left != 0) & (above != 0), 0,
                          jnp.where(left + above < 2, 26, 1))
    m0 = jnp.where(left != above, left,
                   jnp.where(left > 1, left, 0))
    m1 = jnp.where(left != above, above,
                   jnp.where(left > 1, ((left + 29) % 32) + 2, 1))
    m2 = jnp.where(left != above, third_neq,
                   jnp.where(left > 1, ((left - 1) % 32) + 2, 26))
    return m0, m1, m2


def generate_cu_header_ops(sz: int, tu_split: bool, pmode, pmode_left, pmode_above,
                           gl, ga, split_cu_coded: bool = True):
    """ops for a 2Nx2N CU header up to (but excluding) the Y cbf + coefficients:
    [split_cu=0][part_size][pmode MPM bins][uv_pmode][split_tu][cbf U][cbf V].

    All (lanes,) inputs; returns (ops (lanes, 16), valid). Mirrors
    put_cu_2nx2n / put_cu_2nx2n_tusplit headers (src/HEVCe.c:1272-1316).
    """
    lanes = pmode.shape[0]
    ops = jnp.zeros((lanes, 16), jnp.int32)
    val = jnp.zeros((lanes, 16), bool)
    slot = 0
    t = jnp.ones((lanes,), bool)

    def put(ops, val, slot, kind, cidx, b, cond):
        op = _pack(kind, 0, 0) + (cidx << 2) + (b << 10)
        return (ops.at[:, slot].set(op), val.at[:, slot].set(cond), slot + 1)

    zero = jnp.zeros((lanes,), jnp.int32)
    if split_cu_coded and sz >= 16:
        cidx = cb.CTX_SPLIT_CU + gl.astype(jnp.int32) + ga.astype(jnp.int32)
        ops, val, slot = put(ops, val, slot, sim.KIND_CTX, cidx, zero, t)
    if sz == 8:   # part_size: 1 = 2Nx2N (src/HEVCe.c:952-955)
        ops, val, slot = put(ops, val, slot, sim.KIND_CTX,
                             zero + cb.CTX_PARTSIZE, zero + 1, t)
    # pmode MPM coding (src/HEVCe.c:985-1018)
    m0, m1, m2 = _mpm3(pmode_left, pmode_above)
    hit = jnp.where(pmode == m2, 2, jnp.where(pmode == m1, 1,
                    jnp.where(pmode == m0, 0, -1)))
    is_hit = hit >= 0
    ops, val, slot = put(ops, val, slot, sim.KIND_CTX, zero + cb.CTX_Y_PMODE,
                         is_hit.astype(jnp.int32), t)
    rem = pmode - ((pmode > m0).astype(jnp.int32) + (pmode > m1).astype(jnp.int32)
                   + (pmode > m2).astype(jnp.int32))
    # hit: two 1-bin bypass ops [hit>0][hit-1]; miss: ONE 5-bin bypass chunk
    # (the reference emits rem via a single CABACputBins(rem, 5))
    op_a = jnp.where(is_hit,
                     sim.KIND_BYPASS + (1 << 2) + ((hit > 0).astype(jnp.int32) << 6),
                     sim.KIND_BYPASS + (5 << 2) + ((rem & 31) << 6))
    ops = ops.at[:, slot].set(op_a)
    val = val.at[:, slot].set(t)
    slot += 1
    op_b = sim.KIND_BYPASS + (1 << 2) + (jnp.maximum(hit - 1, 0) << 6)
    ops = ops.at[:, slot].set(op_b)
    val = val.at[:, slot].set(is_hit & (hit > 0))
    slot += 1
    # uv pmode (always bin 0, src/HEVCe.c:1021-1023)
    ops, val, slot = put(ops, val, slot, sim.KIND_CTX, zero + cb.CTX_UV_PMODE, zero, t)
    # split_tu flag (src/HEVCe.c:1026-1033)
    if sz in (32, 16, 8):
        cidx = zero + cb.CTX_SPLIT_TU + {32: 0, 16: 1, 8: 2}[sz]
        ops, val, slot = put(ops, val, slot, sim.KIND_CTX, cidx,
                             zero + int(tu_split), t)
    # U/V cbf = 0 at depth 0 (src/HEVCe.c:1286-1287)
    for _ in range(2):
        ops, val, slot = put(ops, val, slot, sim.KIND_CTX,
                             zero + cb.CTX_UV_QT_CBF + 0, zero, t)
    assert slot <= 16
    return ops, val


def generate_cu_2nx2n_ops(sz: int, pmode, pmode_left, pmode_above, gl, ga, blk):
    """full step-2 trial ops: header + [Y cbf] + putCoef (src/HEVCe.c:1272-1291).

    blk: (lanes, sz, sz) quantized levels. Returns (ops, valid) mega layout.
    """
    h_ops, h_val = generate_cu_header_ops(sz, False, pmode, pmode_left,
                                          pmode_above, gl, ga)
    lanes = pmode.shape[0]
    cbf = jnp.any(blk.reshape(lanes, -1) != 0, axis=1)
    zero = jnp.zeros((lanes,), jnp.int32)
    cbf_op = (_pack(sim.KIND_CTX, 0, 0) + ((zero + cb.CTX_Y_QT_CBF + 1) << 2)
              + (cbf.astype(jnp.int32) << 10))
    c_ops, c_val = generate_put_coef_ops(sz, pmode, blk)
    c_val = c_val & cbf[:, None]
    return (jnp.concatenate([h_ops, cbf_op[:, None], c_ops], axis=1),
            jnp.concatenate([h_val, jnp.ones((lanes, 1), bool), c_val], axis=1))


def generate_cu_tusplit_ops(sz: int, pmode, pmode_left, pmode_above, gl, ga, blk4):
    """full step-3 trial ops: header + 4x([Y cbf@depth1] + putCoef(h))
    (src/HEVCe.c:1294-1316). blk4: (lanes, 4, h, h)."""
    h = sz // 2
    h_ops, h_val = generate_cu_header_ops(sz, True, pmode, pmode_left,
                                          pmode_above, gl, ga)
    lanes = pmode.shape[0]
    parts_o = [h_ops]
    parts_v = [h_val]
    for isub in range(4):
        sub = blk4[:, isub]
        cbf = jnp.any(sub.reshape(lanes, -1) != 0, axis=1)
        cbf_op = (_pack(sim.KIND_CTX, 0, 0) + ((cb.CTX_Y_QT_CBF + 0) << 2)
                  + (cbf.astype(jnp.int32) << 10))
        c_ops, c_val = generate_put_coef_ops(h, pmode, sub)
        parts_o += [jnp.broadcast_to(cbf_op[:, None], (lanes, 1)), c_ops]
        parts_v += [jnp.ones((lanes, 1), bool), c_val & cbf[:, None]]
    return jnp.concatenate(parts_o, axis=1), jnp.concatenate(parts_v, axis=1)


def put_coef_rates(sz: int, qpd6: int, pmode, blk, cap=None):
    """fresh-coder putCoef rates for (lanes, sz, sz) blocks, fully on device.

    Returns (rates (lanes,) int32, overflow (lanes,) bool). Lanes with cbf=0
    get rate 0. Overflowing lanes (pathological op counts) need host fallback.
    """
    if cap is None:
        # worst-case op counts with chunked bypass runs — overflow-free
        cap = {4: 256, 8: 512, 16: 2048, 32: 7168}[sz]
    # step-4 semantics: zero blocks still encode a (0,0) last-XY
    ops, valid = generate_put_coef_ops(sz, pmode, blk, code_zero_blocks=True)
    palette, remap = _palette(sz, full_trial=False)
    ops = remap_ctx_ops(ops, remap)
    packed, overflow, nops = compact_ops(ops, valid, cap)
    state = sim.initial_state(blk.shape[0], qpd6)
    state["ctxs"] = state["ctxs"][:, palette]
    from hevce_tpu.ops import cabac_pallas as cp
    final = cp.advance_rates(state, packed, nops)
    return jnp.asarray(sim.bit_len(final), jnp.int32), overflow
