"""Pallas TPU kernel for the CABAC rate scan (ROADMAP Phase B, item 3).

The jnp `lax.scan` spends ~95 us/step on kernel-launch overhead for a body
whose arithmetic bound is ~1 us. This kernel runs the whole bin loop inside
one Pallas program per lane tile: state lives in registers/VMEM, tables are
bit-plane constants (no gathers), and the context vector sits transposed
(P, TILE) so the one-hot select vectorizes over lanes.

Semantics are identical to ops/cabac_sim.simulate (same op format); outputs
are the 7 scalar state rows (rates need only those — context write-back is
skipped, winners are replayed by the host packer).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from hevce_tpu.ops import cabac_sim as sim

from hevce_tpu.bitstream import cabac as cb

TILE = 512

_LPS_P = sim._bitsliced(cb.LPS_TABLE.reshape(-1), 8)    # (8, 8) words
_TRANS_P = sim._bitsliced(cb.NEXT_STATE_LPS, 7)         # (7, 4)
_MPS_P = sim._bitsliced(cb.NEXT_STATE_MPS, 7)


def _shl(x, s, maxbits=5):
    """x << s with per-lane s via constant-shift barrel decomposition
    (TPU vector units lack per-lane variable shifts; Mosaic scalarizes them)."""
    for k in range(maxbits):
        x = jnp.where((s & (1 << k)) != 0, x << (1 << k), x)
    return x


def _shr(x, s, maxbits=5):
    for k in range(maxbits):
        x = jnp.where((s & (1 << k)) != 0, x >> (1 << k), x)
    return x


def _lut(planes_np, idx):
    """bit-sliced constant-table lookup, vector-friendly inside the kernel."""
    nbits, nwords = planes_np.shape
    word_i = idx >> 5
    bit_i = idx & 31
    out = jnp.zeros_like(idx)
    for b in range(nbits):
        w = jnp.full_like(idx, int(planes_np[b, 0]))
        for wi in range(1, nwords):
            w = jnp.where(word_i == wi, int(planes_np[b, wi]), w)
        out = out | ((_shr(w, bit_i) & 1) << b)
    return out


def _emit_run(nbytes, zrun, byte, k):
    is_zero = byte == 0
    small = byte <= 3
    has = k > 0
    ins_nonzero = jnp.where(has & small & ~is_zero & (zrun >= 2), 1, 0)
    first = jnp.where(zrun >= 2, 1, 3 - zrun)
    ins_zero = jnp.where(k >= first, 1 + (k - first) // 2, 0)
    zrun_zero = jnp.where(ins_zero > 0, 1 + ((k - first) % 2), zrun + k)
    inserts = jnp.where(is_zero, ins_zero, ins_nonzero)
    nbytes2 = nbytes + k + jnp.where(has, inserts, 0)
    zrun2 = jnp.where(has, jnp.where(is_zero, zrun_zero, 0), zrun)
    return nbytes2, zrun2


def _kernel(ops_ref, st_ref, ctx_ref, out_ref, *, L):
    st = st_ref[...]          # (8, TILE) rng/low/nbits/outstanding/bufbyte/zrun/nbytes/pad
    ctxs = ctx_ref[...]       # (P, TILE)
    P = ctxs.shape[0]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)

    def body(t, carry):
        st, ctxs = carry
        rng, low, nbits = st[0], st[1], st[2]
        outstanding, bufbyte, zrun, nbytes = st[3], st[4], st[5], st[6]
        op = ops_ref[t, :]
        kind = op & 3
        cidx = (op >> 2) & 0xFF
        b = (op >> 10) & 1
        byp_len = (op >> 2) & 0xF
        byp_val = (op >> 6) & 0xFF
        is_ctx = kind == sim.KIND_CTX
        is_byp = kind == sim.KIND_BYPASS
        is_term = kind == sim.KIND_TERM
        active = kind != sim.KIND_NOP

        onehot = (iota_p == cidx[None, :]).astype(jnp.int32)   # (P, TILE)
        v = (ctxs * onehot).sum(axis=0)
        lps = _lut(_LPS_P, (v >> 1) * 4 + ((rng >> 6) & 3))
        r1 = rng - lps
        is_lps = b != (v & 1)
        li = lps >> 3
        nbit = 6 - ((li >= 1).astype(jnp.int32) + (li >= 2) + (li >= 4)
                    + (li >= 8) + (li >= 16))
        mps_rn = r1 < 256
        ctx_low = jnp.where(is_lps, _shl(low + r1, nbit, 3),
                            jnp.where(mps_rn, low << 1, low))
        ctx_rng = jnp.where(is_lps, _shl(lps, nbit, 3),
                            jnp.where(mps_rn, r1 << 1, r1))
        ctx_nbits = nbits - jnp.where(is_lps, nbit, jnp.where(mps_rn, 1, 0))
        newv = jnp.where(is_lps, _lut(_TRANS_P, v), _lut(_MPS_P, v))

        byp_low = _shl(low, byp_len, 4) + rng * byp_val
        byp_nbits = nbits - byp_len

        r2 = rng - 2
        t_rn = (r2 < 256) & (b == 0)
        t_low = jnp.where(b == 1, (low + r2) << 7, jnp.where(t_rn, low << 1, low))
        t_rng = jnp.where(b == 1, 2 << 7, jnp.where(t_rn, r2 << 1, r2))
        t_nbits = nbits - jnp.where(b == 1, 7, jnp.where(t_rn, 1, 0))

        low2 = jnp.where(is_ctx, ctx_low, jnp.where(is_byp, byp_low,
                         jnp.where(is_term, t_low, low)))
        rng2 = jnp.where(is_ctx, ctx_rng, jnp.where(is_term, t_rng, rng))
        nbits2 = jnp.where(is_ctx, ctx_nbits, jnp.where(is_byp, byp_nbits,
                           jnp.where(is_term, t_nbits, nbits)))
        delta = jnp.where(is_ctx, newv - v, 0)
        ctxs2 = ctxs + onehot * delta[None, :]

        low2 = jnp.where(active, low2, low)
        rng2 = jnp.where(active, rng2, rng)
        nbits2 = jnp.where(active, nbits2, nbits)

        # refill (src/HEVCe.c:859-879)
        need = nbits2 < 12
        lead = _shr(low2, jnp.clip(24 - nbits2, 0, 31))
        nbits3 = jnp.where(need, nbits2 + 8, nbits2)
        mask = _shl(jnp.ones_like(low2), jnp.clip(32 - nbits3, 0, 31)) - 1
        low3 = jnp.where(need, low2 & mask, low2)
        is_ff = lead == 0xFF
        flush = need & ~is_ff & (outstanding > 0)
        fresh = need & ~is_ff & (outstanding == 0)
        carry_b = lead >> 8
        b1 = (bufbyte + carry_b) & 0xFF
        fill = (0xFF + carry_b) & 0xFF
        n_a, z_a = _emit_run(nbytes, zrun, b1, jnp.where(flush, 1, 0))
        n_b, z_b = _emit_run(n_a, z_a, fill, jnp.where(flush, outstanding - 1, 0))
        outstanding2 = jnp.where(need & is_ff, outstanding + 1,
                                 jnp.where(flush | fresh, 1, outstanding))
        bufbyte2 = jnp.where(flush | fresh, lead & 0xFF, bufbyte)

        outstanding2 = jnp.where(active, outstanding2, outstanding)
        bufbyte2 = jnp.where(active, bufbyte2, bufbyte)
        z_b = jnp.where(active, z_b, zrun)
        n_b = jnp.where(active, n_b, nbytes)
        nbits3 = jnp.where(active, nbits3, nbits)
        low3 = jnp.where(active, low3, low)

        st2 = jnp.stack([rng2, low3, nbits3, outstanding2, bufbyte2, z_b, n_b,
                         st[7]])
        return st2, ctxs2

    st, ctxs = jax.lax.fori_loop(0, L, body, (st, ctxs))
    out_ref[...] = st


@functools.lru_cache(maxsize=None)
def _build(L: int, P: int, lanes: int):
    grid = lanes // TILE

    kernel = functools.partial(_kernel, L=L)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, TILE), lambda g: (0, g)),
            pl.BlockSpec((8, TILE), lambda g: (0, g)),
            pl.BlockSpec((P, TILE), lambda g: (0, g)),
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((8, lanes), jnp.int32),
    )


def simulate_pallas(state, ops, interpret=False):
    """Pallas-accelerated equivalent of cabac_sim.simulate for rate queries.

    state: dict as from cabac_sim.initial_state (ctxs may be palette-sized);
    ops: (lanes, L) int32, lanes a multiple of TILE (pad with nop lanes).
    Returns a state dict with the 7 scalar fields advanced (ctxs omitted).
    """
    lanes, L = ops.shape
    assert lanes % TILE == 0, f"pad lanes to a multiple of {TILE}"
    st = jnp.stack([state["rng"], state["low"], state["nbits"],
                    state["outstanding"], state["bufbyte"], state["zrun"],
                    state["nbytes"], jnp.zeros_like(state["rng"])])
    ctxs_t = jnp.swapaxes(state["ctxs"], 0, 1)
    ops_t = jnp.swapaxes(ops, 0, 1)
    if interpret:
        fn = pl.pallas_call(
            functools.partial(_kernel, L=L),
            grid=(lanes // TILE,),
            in_specs=[pl.BlockSpec((L, TILE), lambda g: (0, g)),
                      pl.BlockSpec((8, TILE), lambda g: (0, g)),
                      pl.BlockSpec((ctxs_t.shape[0], TILE), lambda g: (0, g))],
            out_specs=pl.BlockSpec((8, TILE), lambda g: (0, g)),
            out_shape=jax.ShapeDtypeStruct((8, lanes), jnp.int32),
            interpret=True)
    else:
        fn = _build(L, ctxs_t.shape[0], lanes)
    out = fn(ops_t, st, ctxs_t)
    return dict(rng=out[0], low=out[1], nbits=out[2], outstanding=out[3],
                bufbyte=out[4], zrun=out[5], nbytes=out[6])
