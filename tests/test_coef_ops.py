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
        packed, overflow = co.compact_ops(ops, valid, 16384)
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
        packed, overflow = co.compact_ops(ops, valid, 16384)
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
