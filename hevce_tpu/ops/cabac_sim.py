"""Device-side exact CABAC rate simulation (ROADMAP.md Phase B).

Simulates the reference arithmetic coder (reference src/HEVCe.c:791-933)
for MANY independent candidates at once: lanes = candidates, a `lax.scan`
advances every lane by one bin per step. State per lane is 7 int32 scalars +
the 142-entry context vector; the byte sink is simulated by COUNTING bytes
(including start-code emulation 0x03 insertions) without materializing them,
which is all `CABAClen` needs (src/HEVCe.c:835-837).

Two exactness notes:
  * bypass runs are processed up to 8 bins per step with the reference's own
    CABACputBins chunking, so low/nbits evolution is chunk-identical. (Even
    a different chunking would be exact for rates: refills always extract
    the same 8-bit groups in the same order, so the bit length and context
    evolution are invariant and states resync at op boundaries.)
  * emulation-prevention byte counting over a run of k identical carry-fill
    bytes uses a closed form of the zero-run automaton (z in {0,1,2}).

Op encoding (int32), kind = op & 3:
  0 context-coded bin: ctx_idx << 2 | bin << 10
  1 bypass RUN of 1..8 bins (matching the reference's CABACputBins chunking,
    src/HEVCe.c:899-911): len << 2 | value << 6
  2 terminate bin: bin << 10
  3 nop (padding)
"""
import jax
import jax.numpy as jnp
import numpy as np

from hevce_tpu.bitstream import cabac as cb

NUM_CTX = cb.NUM_CTX

KIND_CTX, KIND_BYPASS, KIND_TERM, KIND_NOP = 0, 1, 2, 3

def _bitsliced(table, nbits):
    """pack a small int table into per-bit uint32 words for gather-free lookup
    (dynamic gathers/scatters lower pathologically on the TPU backend)."""
    table = np.asarray(table, np.uint32)
    n = len(table)
    nwords = (n + 31) // 32
    planes = np.zeros((nbits, nwords), np.uint32)
    for i, v in enumerate(table):
        for b in range(nbits):
            if (int(v) >> b) & 1:
                planes[b, i // 32] |= np.uint32(1) << (i % 32)
    return planes.astype(np.int64).astype(np.int32)  # reinterpret-safe values


_LPS_PLANES = _bitsliced(cb.LPS_TABLE.reshape(-1), 8)     # (8, 8) words
_TRANS_PLANES = _bitsliced(cb.NEXT_STATE_LPS, 7)          # (7, 4) words
_MPS_PLANES = _bitsliced(cb.NEXT_STATE_MPS, 7)


def _lookup(planes_np, idx):
    """table[idx] via bit-sliced planes: word select (where-chain over <=8
    words) + variable shift; idx (lanes,) int32, values >= 0."""
    nbits, nwords = planes_np.shape
    word_i = idx >> 5
    bit_i = idx & 31
    out = jnp.zeros_like(idx)
    for b in range(nbits):
        w = jnp.full_like(idx, int(planes_np[b, 0]))
        for wi in range(1, nwords):
            w = jnp.where(word_i == wi, int(planes_np[b, wi]), w)
        bit = (w >> bit_i) & 1
        out = out | (bit << b)
    return out


def pack_op(kind, ctx_idx=0, binval=0):
    return kind | (ctx_idx << 2) | (binval << 10)


def pack_bypass(value, length):
    """one bypass run op (1 <= length <= 8)."""
    assert 1 <= length <= 8
    return KIND_BYPASS | (length << 2) | ((value & 0xFF) << 6)


def split_bypass(value, length):
    """(value, len) chunks of <= 8 bins, MSB first — the reference's
    CABACputBins split (src/HEVCe.c:899-911)."""
    value &= (1 << length) - 1
    out = []
    while length > 0:
        cur = min(length, 8)
        length -= cur
        out.append(((value >> length) & ((1 << cur) - 1), cur))
    return out


def initial_state(lanes: int, qpd6: int):
    """fresh coder + contexts per lane (src/HEVCe.c:809-812, :762-785)."""
    ctxs = jnp.tile(jnp.asarray(
        np.frombuffer(bytes(cb.new_context_set(qpd6)), np.uint8).astype(np.int32)),
        (lanes, 1))
    z = jnp.zeros((lanes,), jnp.int32)
    return dict(rng=z + 510, low=z, nbits=z + 23, outstanding=z,
                bufbyte=z + 0xFF, zrun=z, nbytes=z, ctxs=ctxs)


def bit_len(state):
    """exact fractional bit count (src/HEVCe.c:835-837)."""
    return 8 * (state["nbytes"] + state["outstanding"]) + 23 - state["nbits"]


def _emit_run(nbytes, zrun, byte, k):
    """count k emitted copies of `byte` through the emulation-prevention sink
    (src/HEVCe.c:821-832); returns (nbytes', zrun'). k >= 0 per lane."""
    is_zero = byte == 0
    small = byte <= 3
    has = k > 0
    # single-insert case (nonzero byte <= 3): one 0x03 iff zrun >= 2
    ins_nonzero = jnp.where(has & small & ~is_zero & (zrun >= 2), 1, 0)
    # zero-byte run: automaton z in {0,1,2}: pre-state 2 -> insert, z<-1; else z+1
    first = jnp.where(zrun >= 2, 1, 3 - zrun)          # byte index of 1st insert
    ins_zero = jnp.where(k >= first, 1 + (k - first) // 2, 0)
    zrun_zero = jnp.where(ins_zero > 0,
                          1 + ((k - first) % 2),
                          zrun + k)
    inserts = jnp.where(is_zero, ins_zero, ins_nonzero)
    nbytes2 = nbytes + k + jnp.where(has, inserts, 0)
    zrun2 = jnp.where(has, jnp.where(is_zero, zrun_zero, 0), zrun)
    return nbytes2, zrun2


def _refill(rng, low, nbits, outstanding, bufbyte, zrun, nbytes):
    """carry resolution + byte extraction (src/HEVCe.c:859-879), vectorized."""
    need = nbits < 12
    sh = jnp.clip(24 - nbits, 0, 31)
    lead = low >> sh
    nbits2 = jnp.where(need, nbits + 8, nbits)
    mask = (jnp.int32(1) << jnp.clip(32 - nbits2, 0, 31)) - 1
    low2 = jnp.where(need, low & mask, low)

    is_ff = lead == 0xFF
    flush = need & ~is_ff & (outstanding > 0)
    fresh = need & ~is_ff & (outstanding == 0)

    carry = lead >> 8
    b1 = (bufbyte + carry) & 0xFF
    fill = (0xFF + carry) & 0xFF
    # emit b1 then (outstanding-1) copies of fill, only on flush lanes
    n_a, z_a = _emit_run(nbytes, zrun, b1, jnp.where(flush, 1, 0))
    n_b, z_b = _emit_run(n_a, z_a, fill, jnp.where(flush, outstanding - 1, 0))

    nbytes2 = n_b
    zrun2 = z_b
    outstanding2 = jnp.where(need & is_ff, outstanding + 1,
                             jnp.where(flush | fresh, 1, outstanding))
    bufbyte2 = jnp.where(flush | fresh, lead & 0xFF, bufbyte)
    return rng, low2, nbits2, outstanding2, bufbyte2, zrun2, nbytes2


def _step(state, op):
    rng, low, nbits = state["rng"], state["low"], state["nbits"]
    outstanding, bufbyte = state["outstanding"], state["bufbyte"]
    zrun, nbytes, ctxs = state["zrun"], state["nbytes"], state["ctxs"]

    kind = op & 3
    cidx = (op >> 2) & 0xFF
    b = (op >> 10) & 1
    byp_len = (op >> 2) & 0xF
    byp_val = (op >> 6) & 0xFF
    is_ctx = kind == KIND_CTX
    is_byp = kind == KIND_BYPASS
    is_term = kind == KIND_TERM
    active = kind != KIND_NOP

    # --- context-coded bin (src/HEVCe.c:914-933); table lookups are
    # bit-sliced and the context vector is accessed via one-hot arithmetic
    # (dynamic gather/scatter lowers pathologically on this backend)
    onehot = (cidx[:, None] == jnp.arange(ctxs.shape[1])[None, :]).astype(jnp.int32)
    v = (ctxs * onehot).sum(axis=1)
    lps = _lookup(_LPS_PLANES, (v >> 1) * 4 + ((rng >> 6) & 3))
    r1 = rng - lps
    is_lps = b != (v & 1)
    li = lps >> 3
    nbit = 6 - ((li >= 1).astype(jnp.int32) + (li >= 2) + (li >= 4)
                + (li >= 8) + (li >= 16))
    mps_renorm = r1 < 256
    ctx_low = jnp.where(is_lps, (low + r1) << nbit,
                        jnp.where(mps_renorm, low << 1, low))
    ctx_rng = jnp.where(is_lps, lps << nbit,
                        jnp.where(mps_renorm, r1 << 1, r1))
    ctx_nbits = nbits - jnp.where(is_lps, nbit,
                                  jnp.where(mps_renorm, 1, 0))
    newv = jnp.where(is_lps, _lookup(_TRANS_PLANES, v), _lookup(_MPS_PLANES, v))

    # --- bypass run of 1..8 bins (src/HEVCe.c:899-911, chunk-exact)
    byp_low = (low << byp_len) + rng * byp_val
    byp_nbits = nbits - byp_len

    # --- terminate bin (src/HEVCe.c:882-896)
    r2 = rng - 2
    term_renorm = (r2 < 256) & (b == 0)
    term_low = jnp.where(b == 1, (low + r2) << 7,
                         jnp.where(term_renorm, low << 1, low))
    term_rng = jnp.where(b == 1, 2 << 7,
                         jnp.where(term_renorm, r2 << 1, r2))
    term_nbits = nbits - jnp.where(b == 1, 7, jnp.where(term_renorm, 1, 0))

    low2 = jnp.where(is_ctx, ctx_low, jnp.where(is_byp, byp_low,
                     jnp.where(is_term, term_low, low)))
    rng2 = jnp.where(is_ctx, ctx_rng, jnp.where(is_term, term_rng, rng))
    nbits2 = jnp.where(is_ctx, ctx_nbits, jnp.where(is_byp, byp_nbits,
                       jnp.where(is_term, term_nbits, nbits)))
    delta = jnp.where(is_ctx, newv - v, 0)
    ctxs2 = ctxs + onehot * delta[:, None]

    # inactive lanes keep everything
    low2 = jnp.where(active, low2, low)
    rng2 = jnp.where(active, rng2, rng)
    nbits2 = jnp.where(active, nbits2, nbits)

    rng3, low3, nbits3, outstanding2, bufbyte2, zrun2, nbytes2 = _refill(
        rng2, low2, nbits2, outstanding, bufbyte, zrun, nbytes)
    # refill is a no-op for inactive lanes by construction (nbits unchanged and
    # >= 12 between ops... except when a lane finished below 12; guard:)
    outstanding2 = jnp.where(active, outstanding2, outstanding)
    bufbyte2 = jnp.where(active, bufbyte2, bufbyte)
    zrun2 = jnp.where(active, zrun2, zrun)
    nbytes2 = jnp.where(active, nbytes2, nbytes)
    nbits3 = jnp.where(active, nbits3, nbits)
    low3 = jnp.where(active, low3, low)

    return dict(rng=rng3, low=low3, nbits=nbits3, outstanding=outstanding2,
                bufbyte=bufbyte2, zrun=zrun2, nbytes=nbytes2, ctxs=ctxs2), None


@jax.jit
def simulate(state, ops):
    """Advance all lanes through their op strings.

    state: dict from initial_state() (lanes,)/(lanes,142)
    ops: (lanes, L) int32 packed ops, nop-padded.
    Returns final state; bit_len(final) - bit_len(initial) is each lane's
    exact rate in 1/1 bits (the reference CABAClen unit).
    """
    final, _ = jax.lax.scan(_step, state, jnp.swapaxes(ops, 0, 1))
    return final


CHUNK = 256


def simulate_chunked(state, ops, nops):
    """simulate() that stops after the last real op across all lanes.

    ops: (lanes, L) with L a multiple of CHUNK; nops: (lanes,) actual op
    counts. The padded cap only bounds memory — only chunks below
    max(nops) (rounded up) execute the inner scan; later chunks take the
    identity branch of a lax.cond.

    The chunk counter rides xs (an iota), NEVER the carry: a carried
    counter that the body both uses and increments is the TPU while-loop
    aliasing hazard root-caused in round 3 (models/wavefront.py front
    scan — the body read the already-incremented value). The previous
    while_loop form here carried exactly that pattern; it happened to
    verify bit-exact on v5e once, but the rule is now structural
    (CLAUDE.md): no scan/while counter consumed by its own body.
    """
    lanes, L = ops.shape
    if L % CHUNK:
        pad = CHUNK - L % CHUNK
        ops = jnp.concatenate(
            [ops, jnp.full((lanes, pad), KIND_NOP, jnp.int32)], axis=1)
    ops_t = jnp.swapaxes(ops, 0, 1)              # (L_padded, lanes)
    nchunks = (jnp.max(nops) + CHUNK - 1) // CHUNK

    def body(st, i):
        def run(s):
            sl = jax.lax.dynamic_slice(ops_t, (i * CHUNK, 0), (CHUNK, lanes))
            s2, _ = jax.lax.scan(_step, s, sl)
            return s2
        return jax.lax.cond(i < nchunks, run, lambda s: s, st), None

    n_total = ops_t.shape[0] // CHUNK
    final, _ = jax.lax.scan(body, state,
                            jnp.arange(n_total, dtype=jnp.int32))
    return final


class OpRecorder:
    """Drop-in 'encoder' for the syntax writers that records packed ops
    instead of doing arithmetic coding — used to build device op strings."""

    def __init__(self):
        self.ops = []

    def encode_bin(self, ctxs, idx, binval):
        # context values evolve on device; the recorder only notes the index.
        self.ops.append(pack_op(KIND_CTX, idx, int(bool(binval))))

    def encode_bypass(self, bins, length):
        for v, l in split_bypass(bins, length):
            self.ops.append(pack_bypass(v, l))

    def encode_terminate(self, binval):
        self.ops.append(pack_op(KIND_TERM, 0, int(bool(binval))))


def record_put_coef(sz, pmode, blk):
    """Op string for a fresh-coder putCoef rate (reference src/HEVCe.c:1505-1519
    uses exactly this as the step-4 PU rate)."""
    from hevce_tpu.bitstream import syntax
    rec = OpRecorder()
    # context VALUES are irrelevant to op recording, but the syntax writer
    # branches only on data, never on context state, so a dummy array works.
    dummy = bytearray(142)
    syntax.put_coef(rec, dummy, sz, False, pmode, blk)
    return rec.ops
