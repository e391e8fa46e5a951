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
the reference's own coefficient rate model (estimateCoeffRate,
src/HEVCe.c:526-535) instead of live-CABAC trial encodes. That breaks the
raster decision chain, so whole anti-diagonal fronts of CTUs (2r + c = d,
the HEVC WPP skew: left/above/above-right/above-left all land on earlier
fronts) are searched as ONE batched tensor program. The host then emits an
exact, standard-compliant stream in a single CABAC pack pass over the chosen
forest (csrc pack_stream; real contexts, real arithmetic coding) — the
stream decodes bit-exactly to the device-computed reconstruction, verified
by the independent decoder (runtime/native.decode_stream_native).

The bit-exact reference-identical path remains the default everywhere; this
mode trades reference-identical bytes for device-speed encoding.

Storage is SKEWED at CTU granularity so every front is a static-shape column:
tile (r, c) lives at column 2*r + c; fronts are lax.dynamic_slice columns and
the whole per-front search is one jitted step (no gathers — this backend
compiles dynamic gathers pathologically, CLAUDE.md).
"""
import ctypes
import functools

import numpy as np

from hevce_tpu.models import cu_eval
from hevce_tpu.ops import quant as qops
from hevce_tpu.ops import rdcost
from hevce_tpu.runtime import native

CTU = 32
MODES = 35
# header-bit estimates for the greedy cost (bits): per-CU overhead (split
# flag, part size, pmode, UV pmode, cbf) and the extra TU-split flag + 3 cbf
# bits of the 4-TU layout. Decisions only — the packed stream's real header
# bits come from the exact CABAC pass.
HDR_CU_BITS = 8
HDR_TUSPLIT_EXTRA = 4

_SUB = ((0, 0), (0, 1), (1, 0), (1, 1))   # z-order, units of half-size


def _est_bits(q, axes):
    """greedy rate estimate: reference estimateCoeffRate summed over the
    block, >>15 to bits (the table is <<15 fixed point)."""
    import jax.numpy as jnp
    r = qops.estimate_coeff_rate(jnp.abs(q)).sum(axes)
    return (r + (1 << 14)) >> 15


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


def _node_ctx(canvas, ctop, cleft, y0, x0, sz):
    """Border context for a node at static (y0, x0, sz) inside the CTU:
    ctx_top (B', 1+2sz) and ctx_left (B', 2sz), with the encoder's
    clamped-plane-read semantics (reference GET2D src/HEVCe.c:119). Reads
    that would cross into not-yet-encoded tiles replicate the edge pixel —
    those positions are always masked by the availability flags."""
    import jax.numpy as jnp

    if y0 == 0:
        # row above the CTU: ctop[k] = plane(y-1, x-1+k) => slice at x0
        top = ctop[:, x0:x0 + 1 + 2 * sz]
    else:
        row = canvas[:, y0 - 1, :]                      # (B', 32)
        parts = []
        if x0 == 0:
            parts.append(cleft[:, y0 - 1:y0])           # plane(y0-1, -1)
            hi = min(2 * sz, CTU)
            parts.append(row[:, 0:hi])
            pad = 2 * sz - hi
        else:
            hi = min(x0 - 1 + 1 + 2 * sz, CTU)
            parts.append(row[:, x0 - 1:hi])
            pad = x0 + 2 * sz - CTU
        if pad > 0:
            parts.append(jnp.repeat(row[:, CTU - 1:CTU], pad, axis=1))
        top = jnp.concatenate(parts, axis=1)

    if x0 == 0:
        left = cleft[:, y0:y0 + 2 * sz]
    else:
        col = canvas[:, :, x0 - 1]                      # (B', 32)
        hi = min(y0 + 2 * sz, CTU)
        parts = [col[:, y0:hi]]
        pad = y0 + 2 * sz - CTU
        if pad > 0:
            parts.append(jnp.repeat(col[:, CTU - 1:CTU], pad, axis=1))
        left = jnp.concatenate(parts, axis=1)
    return top, left


def _eval_node(qpd6, canvas, ctop, cleft, orig, fl, y0, x0, sz):
    """Greedy-evaluate one node: both TU layouts x 35 modes. Returns
    (cost (B',), lay (B',) in {1,2}, pm (B',), quant (B', sz*sz),
     recon (B', sz, sz))."""
    import jax.numpy as jnp

    top, left = _node_ctx(canvas, ctop, cleft, y0, x0, sz)
    flags = jnp.stack(fl, axis=-1)
    blk = orig[:, y0:y0 + sz, x0:x0 + sz]
    q1, r1, s1 = cu_eval.eval_2nx2n(sz, qpd6, top, left, flags, blk)
    q4, r4, s4 = cu_eval.eval_tusplit(sz, qpd6, top, left, flags, blk)

    bits1 = _est_bits(q1, (-1, -2)) + HDR_CU_BITS
    bits3 = _est_bits(q4, (-1, -2, -3)) + HDR_CU_BITS + HDR_TUSPLIT_EXTRA
    cost1 = rdcost.calc_rd_cost(qpd6, s1, bits1)        # (B', 35)
    cost3 = rdcost.calc_rd_cost(qpd6, s4, bits3)
    costs = jnp.concatenate([cost1, cost3], axis=1)     # (B', 70)
    sel = jnp.argmin(costs, axis=1).astype(jnp.int32)   # flat winner
    cost = jnp.min(costs, axis=1)
    lay = jnp.where(sel < MODES, 1, 2)
    pm = jnp.where(sel < MODES, sel, sel - MODES)

    # winner selection by one-hot masked sums (no gathers)
    B = costs.shape[0]
    nn = sz * sz
    iota = jnp.arange(MODES, dtype=jnp.int32)
    oh1 = (iota[None, :] == sel[:, None]).astype(jnp.int32)
    oh3 = (iota[None, :] == (sel[:, None] - MODES)).astype(jnp.int32)
    quant = ((q1.reshape(B, MODES, nn) * oh1[:, :, None]).sum(1)
             + (q4.reshape(B, MODES, nn) * oh3[:, :, None]).sum(1))
    recon = ((r1.reshape(B, MODES, nn) * oh1[:, :, None]).sum(1)
             + (r4.reshape(B, MODES, nn) * oh3[:, :, None]).sum(1))
    return cost, lay, pm, quant, recon.reshape(B, sz, sz)


def _make_front_step(qpd6: int, R: int):
    """Build the jitted per-front step for an R-row CTU grid.

    Signature: (S, O, recs..., d, C) -> (S, recs...) where
      S (B, R, D, 32, 32) i32 skewed recon tiles, O same-shape original tiles,
      lay/pm (B, R, D, 21) i32, q8 (B, R, D, 16*64), q16 (B, R, D, 4*256),
      q32 (B, R, D, 1024), d = front index scalar, C = CTU columns scalar.
    One compile per (qpd6, R, D, B) shape set; d and C are traced scalars.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def col(a, j):
        """a[:, :, clamp(j)] via dynamic_slice (j may be negative: clamped;
        such reads are always masked by flags)."""
        j = jnp.clip(j, 0, a.shape[2] - 1)
        return lax.dynamic_slice_in_dim(a, j, 1, axis=2)[:, :, 0]

    def shift_down(t):
        """tile row r -> r-1 view: out[:, r] = t[:, r-1] (row 0 zero)."""
        return jnp.pad(t, ((0, 0), (1, 0)) + ((0, 0),) * (t.ndim - 2))[:, :-1]

    def step(S, O, lay, pm, q8, q16, q32, d, C):
        Bb = S.shape[0]
        rr = jnp.arange(R, dtype=jnp.int32)             # CTU row per lane
        cc = d - 2 * rr                                  # CTU col per lane
        valid = (cc >= 0) & (cc < C)                     # (R,)

        left_t = col(S, d - 1)                           # (B, R, 32, 32)
        above_t = shift_down(col(S, d - 2))
        abr_t = shift_down(col(S, d - 1))
        abl_t = shift_down(col(S, d - 3))
        orig_t = col(O, d)

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

        # flatten (B, R) -> lanes
        BR = Bb * R
        ctop = ctop.reshape(BR, 1 + 2 * CTU)
        cleft = cleft.reshape(BR, 2 * CTU)
        orig = orig_t.reshape(BR, CTU, CTU)
        bll = jnp.tile(cc > 0, Bb)
        blb = jnp.zeros_like(bll)
        baa = jnp.tile(rr > 0, Bb)
        bar = baa & jnp.tile(cc + 1 < C, Bb)
        ctu_fl = (bll, blb, baa, bar)

        canvas = jnp.zeros((BR, CTU, CTU), jnp.int32)
        n_lay = [None] * 21
        n_pm = [None] * 21
        n_q8, n_q16, n_q32 = [None] * 16, [None] * 4, None
        cost16 = [None] * 4

        f16 = _sub_flags(ctu_fl)
        for qi in range(4):
            y16, x16 = _SUB[qi][0] * 16, _SUB[qi][1] * 16
            f8 = _sub_flags(f16[qi])
            # saturating int32 accumulation (jnp int64 silently degrades to
            # int32 without x64 mode; costs are <= I32_MAX, sums must not wrap)
            sat = jnp.int32(rdcost.I32_MAX)

            def sat_add(a, c_):
                return jnp.where(a > sat - c_, sat, a + c_)

            leaf_cost_sum = jnp.zeros((BR,), jnp.int32)
            for li in range(4):
                y8, x8 = y16 + _SUB[li][0] * 8, x16 + _SUB[li][1] * 8
                node = qi * 4 + li
                c, la, p, qb, rc = _eval_node(
                    qpd6, canvas, ctop, cleft, orig, f8[li], y8, x8, 8)
                canvas = canvas.at[:, y8:y8 + 8, x8:x8 + 8].set(rc)
                n_lay[node], n_pm[node], n_q8[node] = la, p, qb
                leaf_cost_sum = sat_add(leaf_cost_sum, c)
            c, la, p, qb, rc = _eval_node(
                qpd6, canvas, ctop, cleft, orig, f16[qi], y16, x16, 16)
            own_wins = c < leaf_cost_sum
            node = 16 + qi
            n_lay[node] = jnp.where(own_wins, la, 0)
            n_pm[node] = p
            n_q16[qi] = qb
            cost16[qi] = jnp.where(own_wins, c, leaf_cost_sum)
            canvas = jnp.where(
                own_wins[:, None, None],
                canvas.at[:, y16:y16 + 16, x16:x16 + 16].set(rc), canvas)

        c, la, p, qb, rc = _eval_node(
            qpd6, canvas, ctop, cleft, orig, ctu_fl, 0, 0, 32)
        sat = jnp.int32(rdcost.I32_MAX)
        split_cost = cost16[0]
        for t in (cost16[1], cost16[2], cost16[3]):
            split_cost = jnp.where(split_cost > sat - t, sat, split_cost + t)
        own_wins = c < split_cost
        n_lay[20] = jnp.where(own_wins, la, 0)
        n_pm[20] = p
        n_q32 = qb
        canvas = jnp.where(own_wins[:, None, None], rc, canvas)

        # commit the front column (masked by row validity)
        vm = jnp.tile(valid, Bb)

        def upd(dst, new, j):
            j = jnp.clip(j, 0, dst.shape[2] - 1)
            cur = lax.dynamic_slice_in_dim(dst, j, 1, axis=2)[:, :, 0]
            mask = vm.reshape(Bb, R).reshape((Bb, R) + (1,) * (new.ndim - 2))
            new = jnp.where(mask, new, cur)
            return lax.dynamic_update_slice_in_dim(
                dst, new[:, :, None], j, axis=2)

        S = upd(S, canvas.reshape(Bb, R, CTU, CTU), d)
        lay = upd(lay, jnp.stack(n_lay, -1).reshape(Bb, R, 21), d)
        pm = upd(pm, jnp.stack(n_pm, -1).reshape(Bb, R, 21), d)
        q8 = upd(q8, jnp.concatenate(n_q8, -1).reshape(Bb, R, 16 * 64), d)
        q16 = upd(q16, jnp.concatenate(n_q16, -1).reshape(Bb, R, 4 * 256), d)
        q32 = upd(q32, n_q32.reshape(Bb, R, 1024), d)
        return S, lay, pm, q8, q16, q32

    return jax.jit(step, donate_argnums=(0, 2, 3, 4, 5, 6))


@functools.lru_cache(maxsize=None)
def _front_step_cache(qpd6: int, R: int):
    return _make_front_step(qpd6, R)


def _orig_tiles_skewed(imgs, yp, xp):
    """(B, R, D, 32, 32) int32 original tiles in skewed layout, edge-replicated
    from the UNPADDED dims (reference src/HEVCe.c:1620-1622)."""
    B = len(imgs)
    ysz, xsz = imgs[0].shape
    R, Cc = yp // CTU, xp // CTU
    D = 2 * (R - 1) + Cc
    yy = np.clip(np.arange(yp), 0, ysz - 1)
    xx = np.clip(np.arange(xp), 0, xsz - 1)
    O = np.zeros((B, R, D, CTU, CTU), np.int32)
    for b, im in enumerate(imgs):
        plane = im[np.ix_(yy, xx)].astype(np.int32)
        t = plane.reshape(R, CTU, Cc, CTU).transpose(0, 2, 1, 3)
        for r in range(R):
            O[b, r, 2 * r:2 * r + Cc] = t[r]
    return O


def encode_batch_fast(images, qpd6: int):
    """Wavefront fast mode: encode B same-shaped uint8 grayscale images.

    Returns (streams, recons) like lockstep.encode_batch. Streams are
    standard-compliant HEVC (exact CABAC pack of the device-chosen forest)
    but NOT bit-identical to the reference encoder: decisions use the
    reference's estimateCoeffRate model instead of live-CABAC trial rates,
    and the NxN partition of 8x8 CUs is not searched. The returned recon is
    exactly what a decoder reconstructs (verified in tests against the
    independent decoder).
    """
    import jax.numpy as jnp

    images = [native._clip_dims(im) for im in images]
    shape = images[0].shape
    assert all(im.shape == shape for im in images), "batch must share dims"
    B = len(images)
    ysz, xsz = shape
    yp, xp = -(-ysz // CTU) * CTU, -(-xsz // CTU) * CTU
    R, Cc = yp // CTU, xp // CTU
    D = 2 * (R - 1) + Cc

    O = jnp.asarray(_orig_tiles_skewed(images, yp, xp))
    S = jnp.zeros((B, R, D, CTU, CTU), jnp.int32)
    lay = jnp.zeros((B, R, D, 21), jnp.int32)
    pm = jnp.zeros((B, R, D, 21), jnp.int32)
    q8 = jnp.zeros((B, R, D, 16 * 64), jnp.int32)
    q16 = jnp.zeros((B, R, D, 4 * 256), jnp.int32)
    q32 = jnp.zeros((B, R, D, 1024), jnp.int32)

    step = _front_step_cache(qpd6, R)
    C_s = jnp.int32(Cc)
    for d in range(D):
        S, lay, pm, q8, q16, q32 = step(S, O, lay, pm, q8, q16, q32,
                                        jnp.int32(d), C_s)

    # single fetch of decisions + recon
    h = [np.asarray(a) for a in (S, lay, pm, q8, q16, q32)]
    hS, hlay, hpm, hq8, hq16, hq32 = h

    # unskew to raster CTU order
    def unskew(a, b):
        return np.stack([a[b, r, 2 * r:2 * r + Cc] for r in range(R)])

    lib = native._load()
    lib.hevce_pack.restype = ctypes.c_longlong
    lib.hevce_pack.argtypes = [ctypes.POINTER(ctypes.c_int32)] * 5 + [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
    cap = int(lib.hevce_stream_capacity(ysz, xsz))
    streams, recons = [], []
    for b in range(B):
        args = []
        for a in (hlay, hpm, hq8, hq16, hq32):
            flat = np.ascontiguousarray(unskew(a, b), np.int32).reshape(-1)
            args.append(flat)
        buf = np.empty(cap, np.uint8)
        n = lib.hevce_pack(
            *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in args),
            ysz, xsz, qpd6,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_longlong(cap))
        assert n > 0, f"pack failed: {n}"
        streams.append(bytes(buf[:n]))
        tiles = unskew(hS, b)                        # (R, Cc, 32, 32)
        recons.append(tiles.transpose(0, 2, 1, 3)
                      .reshape(yp, xp).astype(np.uint8))
    return streams, recons


def encode_image_fast(img, qpd6: int):
    """single-image wavefront fast encode; returns (stream bytes, recon)."""
    s, r = encode_batch_fast([img], qpd6)
    return s[0], r[0]
