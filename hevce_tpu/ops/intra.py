"""35-mode HEVC intra prediction, evaluated densely for all modes at once.

Reference semantics: getBorder / predict at reference src/HEVCe.c:196-381.

TPU-native formulation: the reference builds a per-mode projected reference
buffer with data-independent index arithmetic (src/HEVCe.c:350-364). Those
indices depend only on (size, mode), and every angular prediction is TWO
constant 5-bit-weighted taps of a concatenated border vector
S = [ubla | ublb | ubar | fbla | fblb | fbar] — i.e. the whole 33-angular-mode
prediction is one CONSTANT sparse matrix applied to S. We materialise that
matrix once per size and evaluate all modes as a single bf16 MXU matmul
(pixels <= 255 and weights <= 32 are exact in bf16; the two-tap products and
their f32-accumulated sum are < 2^24, so the matmul is bit-exact). The
earlier two-static-gather formulation lowered to serial kCustom gather
fusions on TPU and dominated the wavefront front step (~143 of 157 ms).
Planar / DC / pure-H / pure-V rows (modes 0, 1, 10, 26) are closed-form and
overwrite their rows, including the sz<=16 luma edge filters
(src/HEVCe.c:302-340).
"""
import functools

import jax.numpy as jnp
import numpy as np

from hevce_tpu.ops import constants as C


# ---------------------------------------------------------------------------
# border construction (reference src/HEVCe.c:196-257)
# ---------------------------------------------------------------------------

def build_borders(sz: int, corner, left2, top2, bll, blb, baa, bar):
    """Construct unfiltered + filtered borders.

    corner: (...,) value at rcon[-1][-1]; left2: (..., 2*sz) rcon[i][-1];
    top2: (..., 2*sz) rcon[-1][i]. Flags are broadcastable booleans.
    Returns S: (..., 2 + 8*sz) int32 concatenated border vector
    [ubla(1), ublb(2sz), ubar(2sz), fbla(1), fblb(2sz), fbar(2sz)].
    """
    corner = corner.astype(jnp.int32)
    left2 = left2.astype(jnp.int32)
    top2 = top2.astype(jnp.int32)
    bll = jnp.asarray(bll, bool)
    blb = jnp.asarray(blb, bool)
    baa = jnp.asarray(baa, bool)
    bar = jnp.asarray(bar, bool)

    mid = jnp.full_like(corner, 128)
    ubla = jnp.where(bll & baa, corner,
                     jnp.where(bll, left2[..., 0],
                               jnp.where(baa, top2[..., 0], mid)))

    def fill(src2, exist_lo, exist_hi):
        lo = jnp.where(exist_lo[..., None], src2[..., :sz], ubla[..., None])
        lo_last = lo[..., sz - 1]
        hi = jnp.where(exist_hi[..., None], src2[..., sz:], lo_last[..., None])
        return jnp.concatenate([lo, hi], axis=-1)

    ublb = fill(left2, bll, blb)
    ubar = fill(top2, baa, bar)

    fbla = (2 + ublb[..., 0] + ubar[..., 0] + 2 * ubla) >> 2

    def smooth(u):
        f0 = (2 + 2 * u[..., 0] + u[..., 1] + ubla) >> 2
        mid_ = (2 + 2 * u[..., 1:-1] + u[..., :-2] + u[..., 2:]) >> 2
        return jnp.concatenate(
            [f0[..., None], mid_[..., : 2 * sz - 2], u[..., 2 * sz - 1:2 * sz]],
            axis=-1)

    fblb = smooth(ublb)
    fbar = smooth(ubar)
    return jnp.concatenate(
        [ubla[..., None], ublb, ubar, fbla[..., None], fblb, fbar], axis=-1)


# ---------------------------------------------------------------------------
# static gather tables for angular modes
# ---------------------------------------------------------------------------

def _ref_index(sz, mode, p, base, main_off, side_off):
    """Map conceptual ref_buff position p to an index in the S vector
    (reference src/HEVCe.c:350-364)."""
    if p == 0:
        return base
    if p > 0:
        return main_off + p - 1
    inv = int(C.ABS_INV_ANGLE_TABLE[mode])
    j = (128 - inv * p) >> 8
    assert j >= 1
    return side_off + j - 1


@functools.lru_cache(maxsize=None)
def _angular_tables(sz: int):
    """Returns (idx1, idx2, frac, horiz) numpy tables of shape (35, sz, sz),
    (35, sz, sz), (35, sz, 1), (35,). Rows 0/1 are placeholders."""
    n = 2 + 8 * sz
    idx1 = np.zeros((35, sz, sz), np.int32)
    idx2 = np.zeros((35, sz, sz), np.int32)
    frac = np.zeros((35, sz, 1), np.int32)
    horiz = np.zeros(35, bool)
    for m in range(2, 35):
        filt = bool(C.FILTER_BORDER_Y[sz][m])
        base = (1 + 4 * sz) if filt else 0
        blb_off, bar_off = base + 1, base + 1 + 2 * sz
        is_h = m < C.PMODE_DEG135
        horiz[m] = is_h
        main_off = blb_off if is_h else bar_off
        side_off = bar_off if is_h else blb_off
        angle = int(C.ANGLE_TABLE[m])
        for i in range(sz):
            off = angle * (i + 1)
            off_i, off_f = off >> 5, off & 31
            frac[m, i, 0] = off_f
            for j in range(sz):
                idx1[m, i, j] = _ref_index(sz, m, off_i + j + 1, base, main_off, side_off)
                idx2[m, i, j] = _ref_index(sz, m, off_i + j + 2, base, main_off, side_off)
    return idx1, idx2, frac, horiz


# ---------------------------------------------------------------------------
# dense 35-mode prediction
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _angular_matrix(sz: int):
    """(35, sz*sz, 2+8*sz) float32 constant: out[m, p] = W[m, p] . S, before
    the shared (+16) >> 5 rounding. The horizontal-mode transpose
    (src/HEVCe.c:374-377) is baked into the pixel index, and each row has
    exactly two taps summing to 32. Rows 0/1/10/26 are zero (closed-form)."""
    idx1, idx2, frac, horiz = _angular_tables(sz)
    n = 2 + 8 * sz
    W = np.zeros((35, sz, sz, n), np.float32)
    for m in range(2, 35):
        for i in range(sz):
            f = int(frac[m, i, 0])
            for j in range(sz):
                oi, oj = (j, i) if horiz[m] else (i, j)
                W[m, oi, oj, idx1[m, i, j]] += 32 - f
                # idx2 can point one past the border segment when f == 0
                # (angle-32 rows); the tap has zero weight there
                if f:
                    W[m, oi, oj, idx2[m, i, j]] += f
    return W.reshape(35, sz * sz, n)


def _angular_mm(sz, S):
    """All angular modes as ONE bf16 MXU matmul: (..., n) -> (..., 35, sz, sz).
    Exact: inputs <= 255 and weights <= 32 are bf16-exact, the two products
    and their f32-accumulated sum stay < 2^24."""
    from jax import lax
    W = jnp.asarray(_angular_matrix(sz).reshape(35 * sz * sz, -1), jnp.bfloat16)
    acc = lax.dot_general(S.astype(jnp.bfloat16), W,
                          (((S.ndim - 1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    ang = (acc.astype(jnp.int32) + 16) >> 5
    return ang.reshape(S.shape[:-1] + (35, sz, sz))


def _angular_mm_per_lane(sz, S):
    """Mode-diagonal variant: S (..., 35, n), lane m predicted with mode m
    only -> (..., 35, sz, sz). One mode-batched MXU matmul."""
    from jax import lax
    W = jnp.asarray(_angular_matrix(sz), jnp.bfloat16)   # (35, nn, n)
    nb = S.ndim - 2
    acc = lax.dot_general(
        W, S.astype(jnp.bfloat16),
        (((2,), (S.ndim - 1,)), ((0,), (S.ndim - 2,))),
        preferred_element_type=jnp.float32)              # (35, nn, ...batch)
    acc = jnp.moveaxis(acc, (0, 1), (nb, nb + 1))        # (...batch, 35, nn)
    ang = (acc.astype(jnp.int32) + 16) >> 5
    return ang.reshape(S.shape[:-2] + (35, sz, sz))


def predict_per_lane(sz: int, S: jnp.ndarray) -> jnp.ndarray:
    """Mode-diagonal prediction: lane m of S predicts with mode m only.

    S: (..., 35, 2+8*sz) border vectors, one per mode lane (they differ when
    sub-TU chaining gives each mode its own reconstruction).
    Returns (..., 35, sz, sz). Used by the TU-split evaluation where borders
    are per-mode; `predict_all_modes` covers the shared-border case.
    """
    ang = _angular_mm_per_lane(sz, S)

    # closed-form rows use each lane's own border vector
    def lane(m):
        return S[..., m, :]
    full = _closed_form_rows(sz, ang,
                             S0=lane(0), S1=lane(1),
                             S10=lane(C.PMODE_HOR), S26=lane(C.PMODE_VER))
    return full


def _split_S(sz, S):
    ubla = S[..., 0]
    ublb = S[..., 1:1 + 2 * sz]
    ubar = S[..., 1 + 2 * sz:1 + 4 * sz]
    foff = 1 + 4 * sz
    fblb = S[..., foff + 1:foff + 1 + 2 * sz]
    fbar = S[..., foff + 1 + 2 * sz:foff + 1 + 4 * sz]
    return ubla, ublb, ubar, fblb, fbar


def _planar_block(sz, S):
    ubla, ublb, ubar, fblb, fbar = _split_S(sz, S)
    pblb, pbar = (fblb, fbar) if C.FILTER_BORDER_Y[sz][0] else (ublb, ubar)
    jj = jnp.arange(sz, dtype=jnp.int32)
    ii = jj[:, None]
    hor_pred = (sz - jj - 1)[None, :] * pblb[..., :sz][..., :, None] \
        + (jj + 1)[None, :] * pbar[..., sz][..., None, None]
    ver_pred = (sz - ii - 1) * pbar[..., :sz][..., None, :] \
        + (ii + 1) * pblb[..., sz][..., None, None]
    return (sz + hor_pred + ver_pred) // (sz * 2)


def _dc_block(sz, S):
    ubla, ublb, ubar, _, _ = _split_S(sz, S)
    dc = (sz + ublb[..., :sz].sum(-1) + ubar[..., :sz].sum(-1)) // (2 * sz)
    dcb = jnp.broadcast_to(dc[..., None, None], dc.shape + (sz, sz))
    if sz <= 16:
        top = (2 + 3 * dc[..., None] + ubar[..., :sz]) >> 2
        left = (2 + 3 * dc[..., None] + ublb[..., :sz]) >> 2
        corner = (2 + 2 * dc + ublb[..., 0] + ubar[..., 0]) >> 2
        dcb = dcb.at[..., 0, :].set(top)
        dcb = dcb.at[..., :, 0].set(left)
        dcb = dcb.at[..., 0, 0].set(corner)
    return dcb


def _hor_block(sz, S):
    ubla, ublb, ubar, _, _ = _split_S(sz, S)
    horb = jnp.broadcast_to(ublb[..., :sz, None], ublb.shape[:-1] + (sz, sz))
    if sz <= 16:
        bias = (ubar[..., :sz] - ubla[..., None]) >> 1
        horb = horb.at[..., 0, :].set(jnp.clip(bias + horb[..., 0, :], 0, 255))
    return horb


def _ver_block(sz, S):
    ubla, ublb, ubar, _, _ = _split_S(sz, S)
    verb = jnp.broadcast_to(ubar[..., None, :sz], ubar.shape[:-1] + (sz, sz))
    if sz <= 16:
        bias = (ublb[..., :sz] - ubla[..., None]) >> 1
        verb = verb.at[..., :, 0].set(jnp.clip(bias + verb[..., :, 0], 0, 255))
    return verb


def _closed_form_rows(sz, ang, S0, S1, S10, S26):
    out = ang
    out = out.at[..., 0, :, :].set(_planar_block(sz, S0))
    out = out.at[..., 1, :, :].set(_dc_block(sz, S1))
    out = out.at[..., C.PMODE_HOR, :, :].set(_hor_block(sz, S10))
    out = out.at[..., C.PMODE_VER, :, :].set(_ver_block(sz, S26))
    # predictions are pixels in [0, 255]: ship them as uint8 — the candidate
    # pipeline is HBM-bandwidth-bound on TPU, so every live (..., 35, sz, sz)
    # tensor pays 4x in i32 (consumers upcast locally where arithmetic needs it)
    return out.astype(jnp.uint8)


def predict_all_modes(sz: int, S: jnp.ndarray) -> jnp.ndarray:
    """All 35 predicted blocks from border vector S (..., 2+8*sz) int32.

    Returns (..., 35, sz, sz) int32 in [0, 255].
    """
    ang = _angular_mm(sz, S)
    # closed-form rows (planar/DC/H/V) share the single border vector
    return _closed_form_rows(sz, ang, S0=S, S1=S, S10=S, S26=S)
