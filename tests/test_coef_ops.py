"""Device-side putCoef op generation + rate chain tests (ROADMAP Phase B)."""
import numpy as np

from hevce_tpu.bitstream import cabac as cb
from hevce_tpu.ops import cabac_sim as sim
from hevce_tpu.ops import coef_ops as co


def test_op_generation_matches_recorder(golden):
    g = golden("putcoef")
    for szw in (4, 8, 16, 32):
        idx = [t for t in range(len(g["sz"])) if int(g["sz"][t]) == szw]
        blks = np.stack([g["blk"][t][:szw, :szw] for t in idx]).astype(np.int32)
        pms = np.asarray([int(g["pmode"][t]) for t in idx], np.int32)
        ops, valid = co.generate_put_coef_ops(szw, pms, blks)
        packed, overflow, _n = co.compact_ops(ops, valid, 16384)
        packed = np.asarray(packed)
        assert not np.asarray(overflow).any()
        for li, t in enumerate(idx):
            want = sim.record_put_coef(szw, int(g["pmode"][t]), g["blk"][t][:szw, :szw])
            got = [int(o) for o in packed[li] if (o & 3) != sim.KIND_NOP]
            assert got == list(want), f"sz={szw} case {t}"


def test_device_rate_chain_matches_golden(golden):
    """block -> ops -> simulate == reference fresh-coder CABAClen."""
    g = golden("putcoef")
    for szw in (4, 8, 16, 32):
        idx = [t for t in range(len(g["sz"])) if int(g["sz"][t]) == szw]
        blks = np.stack([g["blk"][t][:szw, :szw] for t in idx]).astype(np.int32)
        pms = np.asarray([int(g["pmode"][t]) for t in idx], np.int32)
        ops, valid = co.generate_put_coef_ops(szw, pms, blks)
        packed, overflow, _n = co.compact_ops(ops, valid, 16384)
        assert not np.asarray(overflow).any()
        state = sim.initial_state(len(idx), 0)
        state["ctxs"] = np.stack([
            np.frombuffer(bytes(cb.new_context_set(int(g["qpd6"][t]))),
                          np.uint8).astype(np.int32) for t in idx])
        final = sim.simulate(state, packed)
        got = np.asarray(sim.bit_len(final))
        want = np.asarray([int(g["length"][t]) for t in idx])
        np.testing.assert_array_equal(got, want, err_msg=f"sz={szw}")


def test_zero_block_has_no_ops():
    blk = np.zeros((2, 8, 8), np.int32)
    blk[1, 3, 5] = 4   # one lane nonzero
    ops, valid = co.generate_put_coef_ops(8, np.zeros(2, np.int32), blk)
    v = np.asarray(valid)
    assert v[0].sum() == 0 and v[1].sum() > 0


def test_live_state_trial_rates_match_python():
    """full step-2/step-3 trial rates from a live coder state == Python engine."""
    from hevce_tpu.bitstream import syntax as syn
    rng = np.random.default_rng(42)
    qpd6 = 2
    enc = cb.CabacEncoder()
    ctxs = cb.new_context_set(qpd6)
    for _ in range(300):
        r = rng.integers(0, 3)
        if r == 0:
            enc.encode_bin(ctxs, int(rng.integers(0, 142)), int(rng.integers(0, 2)))
        elif r == 1:
            enc.encode_bypass(int(rng.integers(0, 256)), int(rng.integers(1, 9)))
        else:
            enc.encode_terminate(0)
    base = enc.bit_len()

    def live_state(lanes):
        z = np.zeros(lanes, np.int32)
        return dict(rng=z + enc.range, low=z + enc.low, nbits=z + enc.nbits,
                    outstanding=z + enc.outstanding, bufbyte=z + enc.bufbyte,
                    zrun=z + enc.zrun, nbytes=z + len(enc.buf),
                    ctxs=np.tile(np.frombuffer(bytes(ctxs), np.uint8).astype(np.int32),
                                 (lanes, 1)))

    sz, lanes = 8, 8
    blks = rng.integers(-9, 10, (lanes, sz, sz)).astype(np.int32)
    pms = rng.integers(0, 35, lanes).astype(np.int32)
    pl = rng.integers(0, 35, lanes).astype(np.int32)
    pa = rng.integers(0, 35, lanes).astype(np.int32)
    gl = rng.integers(0, 2, lanes).astype(bool)
    ga = rng.integers(0, 2, lanes).astype(bool)

    ops, val = co.generate_cu_2nx2n_ops(sz, pms, pl, pa, gl, ga, blks)
    packed, _, _n = co.compact_ops(ops, val, 8192)
    dev = np.asarray(sim.bit_len(sim.simulate(live_state(lanes), np.asarray(packed)))) - base
    h = sz // 2
    blk4 = np.stack([np.stack([b[:h, :h], b[:h, h:], b[h:, :h], b[h:, h:]]) for b in blks])
    ops, val = co.generate_cu_tusplit_ops(sz, pms, pl, pa, gl, ga, blk4)
    packed, _, _n = co.compact_ops(ops, val, 8192)
    dev3 = np.asarray(sim.bit_len(sim.simulate(live_state(lanes), np.asarray(packed)))) - base

    for li in range(lanes):
        te, tc = enc.copy(), bytearray(ctxs)
        syn.put_split_cu_flag(te, tc, sz, 0, bool(gl[li]), bool(ga[li]))
        syn.put_cu_2nx2n(te, tc, sz, int(pms[li]), int(pl[li]), int(pa[li]), blks[li])
        assert dev[li] == te.bit_len() - base, f"step2 lane {li}"
        te, tc = enc.copy(), bytearray(ctxs)
        syn.put_split_cu_flag(te, tc, sz, 0, bool(gl[li]), bool(ga[li]))
        syn.put_cu_2nx2n_tusplit(te, tc, sz, int(pms[li]), int(pl[li]), int(pa[li]), blk4[li])
        assert dev3[li] == te.bit_len() - base, f"step3 lane {li}"
