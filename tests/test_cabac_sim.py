"""Device CABAC rate-simulator tests vs golden traces (ROADMAP Phase B)."""
import numpy as np

from hevce_tpu.bitstream import cabac as cb
from hevce_tpu.ops import cabac_sim as sim


def _ctxs_for(qpd6_list):
    return np.stack([
        np.frombuffer(bytes(cb.new_context_set(int(q))), np.uint8).astype(np.int32)
        for q in qpd6_list])


def _trace_ops(g, t):
    """pack one golden op trace (bypass runs chunked by 8, like the coder)."""
    ops = []
    for i in range(g["kind"].shape[1]):
        kind = int(g["kind"][t, i])
        a, b = int(g["a"][t, i]), int(g["b"][t, i])
        if kind == 0:
            ops.append(sim.pack_op(sim.KIND_CTX, a, b))
        elif kind == 1:
            for v, l in sim.split_bypass(a, b):
                ops.append(sim.pack_bypass(v, l))
        else:
            ops.append(sim.pack_op(sim.KIND_TERM, 0, 0))
    return ops


def test_simulator_matches_golden_traces(golden):
    g = golden("cabac")
    ntr = len(g["qpd6"])
    all_ops = [_trace_ops(g, t) for t in range(ntr)]
    L = max(len(o) for o in all_ops)
    ops = np.full((ntr, L), sim.KIND_NOP, np.int32)
    for t, o in enumerate(all_ops):
        ops[t, :len(o)] = o
    state = sim.initial_state(ntr, 0)
    state["ctxs"] = _ctxs_for(g["qpd6"])   # per-lane qpd6-dependent init
    final = sim.simulate(state, ops)
    got_len = np.asarray(sim.bit_len(final))
    want_len = g["length"][:, -1]          # CABAClen after the last op
    np.testing.assert_array_equal(got_len, want_len)
    np.testing.assert_array_equal(np.asarray(final["ctxs"]), g["ctxs"].astype(np.int32))


def test_simulator_put_coef_rates(golden):
    g = golden("putcoef")
    n = len(g["sz"])
    all_ops = []
    for t in range(n):
        sz = int(g["sz"][t])
        all_ops.append(sim.record_put_coef(sz, int(g["pmode"][t]), g["blk"][t][:sz, :sz]))
    L = max(len(o) for o in all_ops)
    ops = np.full((n, L), sim.KIND_NOP, np.int32)
    for t, o in enumerate(all_ops):
        ops[t, :len(o)] = o
    state = sim.initial_state(n, 0)
    state["ctxs"] = _ctxs_for(g["qpd6"])
    final = sim.simulate(state, ops)
    got = np.asarray(sim.bit_len(final))
    np.testing.assert_array_equal(got, g["length"], err_msg="fresh-coder putCoef rates")
    np.testing.assert_array_equal(np.asarray(final["ctxs"]), g["ctxs"].astype(np.int32))


def test_pallas_kernel_matches_simulate():
    """Pallas scan kernel (interpret mode) == the validated jnp simulator."""
    from hevce_tpu.ops import cabac_pallas as cp
    rng = np.random.default_rng(1)
    lanes, L = cp.TILE, 128
    ops = np.full((lanes, L), sim.KIND_NOP, np.int32)
    for lane in range(lanes):
        for t in range(int(rng.integers(8, L))):
            k = rng.integers(0, 3)
            if k == 0:
                ops[lane, t] = sim.pack_op(sim.KIND_CTX, int(rng.integers(0, 142)),
                                           int(rng.integers(0, 2)))
            elif k == 1:
                ln = int(rng.integers(1, 9))
                ops[lane, t] = sim.pack_bypass(int(rng.integers(0, 1 << ln)), ln)
            else:
                ops[lane, t] = sim.pack_op(sim.KIND_TERM, 0, 0)
    state = sim.initial_state(lanes, 2)
    ref = sim.simulate(dict(state), ops)
    got = cp.simulate_pallas(dict(state), ops, interpret=True)
    for k in ("rng", "low", "nbits", "outstanding", "bufbyte", "zrun", "nbytes"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)
