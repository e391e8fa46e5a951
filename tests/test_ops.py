"""Bit-exact unit tests of device ops against golden vectors dumped from the
reference encoder (see tools/pack_golden.py). Cases are batched by shape group
and evaluated in a single jitted call per group — this both keeps the suite
fast and exercises the leading-batch-axis semantics the encoder relies on."""
import functools

import jax
import numpy as np

from hevce_tpu.ops import constants as C
from hevce_tpu.ops import intra, quant, rdcost, xform


def _groups(keys):
    """indices grouped by tuple-of-values of key arrays"""
    out = {}
    for i in range(len(keys[0])):
        out.setdefault(tuple(int(k[i]) for k in keys), []).append(i)
    return out


def test_transform_matrices_derivation():
    # DCT16/DCT8 are the even-row subsamples of DCT32 (H.265 8.6.4.2)
    assert C.DCT16.shape == (16, 16)
    assert C.DCT8.shape == (8, 8)
    assert np.array_equal(C.DCT8[1], [89, 75, 50, 18, -18, -50, -75, -89])


def test_forward_inverse_transform_golden(golden):
    g = golden("xform")
    for (sz, inv), idx in _groups([g["sz"], g["inverse"]]).items():
        src = g["src"][idx][:, :sz, :sz]
        want = g["out"][idx][:, :sz, :sz]
        fn = xform.inverse_transform if inv else xform.forward_transform
        got = np.asarray(jax.jit(functools.partial(fn, sz))(src))
        np.testing.assert_array_equal(got, want, err_msg=f"sz={sz} inv={inv}")


def test_transform_batched_matches_single():
    rng = np.random.default_rng(0)
    for sz in (4, 32):
        batch = rng.integers(-255, 256, size=(2, 3, sz, sz)).astype(np.int32)
        got = np.asarray(xform.forward_transform(sz, batch))
        single = np.asarray(xform.forward_transform(sz, batch[1, 2]))
        np.testing.assert_array_equal(got[1, 2], single)


def test_quantize_golden(golden):
    g = golden("quant")
    for (sz, q), idx in _groups([g["sz"], g["qpd6"]]).items():
        src = g["src"][idx][:, :sz, :sz]
        got = np.asarray(jax.jit(functools.partial(quant.quantize, sz, q))(src))
        np.testing.assert_array_equal(got, g["quant"][idx][:, :sz, :sz],
                                      err_msg=f"sz={sz} q={q}")
        dq = np.asarray(jax.jit(functools.partial(quant.dequantize, sz, q))(got))
        np.testing.assert_array_equal(dq, g["dequant"][idx][:, :sz, :sz])


def test_estimate_coeff_rate_golden(golden):
    g = golden("tables")
    got = np.asarray(quant.estimate_coeff_rate(np.arange(256, dtype=np.int32)))
    np.testing.assert_array_equal(got, g["coeff_rate"])


def test_border_golden(golden):
    g = golden("border")
    for (sz,), idx in _groups([g["sz"]]).items():
        base = g["rcon"][idx]                      # (N, 65, 65), origin at [1][1]
        flags = g["flags"][idx].astype(bool)       # (N, 4)
        corner = base[:, 0, 0].astype(np.int32)
        left2 = base[:, 1:1 + 2 * sz, 0].astype(np.int32)
        top2 = base[:, 0, 1:1 + 2 * sz].astype(np.int32)
        S = np.asarray(jax.jit(functools.partial(intra.build_borders, sz))(
            corner, left2, top2, flags[:, 0], flags[:, 1], flags[:, 2], flags[:, 3]))
        f = 1 + 4 * sz
        np.testing.assert_array_equal(S[:, 0], g["ubla"][idx][:, 0], err_msg=f"ubla sz={sz}")
        np.testing.assert_array_equal(S[:, 1:1 + 2 * sz], g["ublb"][idx][:, :2 * sz])
        np.testing.assert_array_equal(S[:, 1 + 2 * sz:f], g["ubar"][idx][:, :2 * sz])
        np.testing.assert_array_equal(S[:, f], g["fbla"][idx][:, 0])
        np.testing.assert_array_equal(S[:, f + 1:f + 1 + 2 * sz], g["fblb"][idx][:, :2 * sz])
        np.testing.assert_array_equal(S[:, f + 1 + 2 * sz:], g["fbar"][idx][:, :2 * sz])


def test_predict_golden(golden):
    g = golden("predict")
    for (sz,), idx in _groups([g["sz"]]).items():
        S = np.concatenate([
            g["ubla"][idx], g["ublb"][idx][:, :2 * sz], g["ubar"][idx][:, :2 * sz],
            g["fbla"][idx], g["fblb"][idx][:, :2 * sz], g["fbar"][idx][:, :2 * sz],
        ], axis=1).astype(np.int32)
        out = np.asarray(jax.jit(functools.partial(intra.predict_all_modes, sz))(S))
        for row, i in enumerate(idx):
            pm = int(g["pmode"][i])
            want = g["out"][i][:sz, :sz].astype(np.int32)
            np.testing.assert_array_equal(out[row, pm], want,
                                          err_msg=f"sz={sz} pmode={pm} case={i}")


def test_rd_cost_saturation():
    got = np.asarray(rdcost.calc_rd_cost(0, np.array([2**31 - 1], np.int32) // 11 + 1,
                                         np.array([0], np.int32)))
    assert got[0] == 2**31 - 1
    got = np.asarray(rdcost.calc_rd_cost(3, np.array([10], np.int32),
                                         np.array([7], np.int32)))
    assert got[0] == 5 * 10 + 29 * 7


def test_block_sse():
    a = np.array([[[1, 2], [3, 4]]], np.int32)
    b = np.array([[[2, 2], [1, 0]]], np.int32)
    assert int(rdcost.block_sse(a, b)[0]) == 1 + 0 + 4 + 16
