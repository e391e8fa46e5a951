"""Bit-exact tests of the Python CABAC coder, context model, and syntax writers
against golden traces from the reference encoder."""
import numpy as np

from hevce_tpu.bitstream import cabac as cb
from hevce_tpu.bitstream import headers, syntax


def test_context_init_table(golden):
    g = golden("tables")
    for q in range(5):
        got = [cb.init_context_state(v, q) for v in range(256)]
        np.testing.assert_array_equal(got, g["ctx_init"][q], err_msg=f"qpd6={q}")


def test_next_state_tables():
    # spot-check the generated 128-entry tables against known H.265 values
    assert cb.NEXT_STATE_MPS[0] == 2 and cb.NEXT_STATE_MPS[123] == 125
    assert cb.NEXT_STATE_MPS[124] == 124 and cb.NEXT_STATE_MPS[127] == 127
    assert cb.NEXT_STATE_LPS[0] == 1 and cb.NEXT_STATE_LPS[1] == 0
    assert cb.NEXT_STATE_LPS[10] == 8 and cb.NEXT_STATE_LPS[125] == 77


def test_cabac_op_traces(golden):
    g = golden("cabac")
    for t in range(len(g["qpd6"])):
        enc = cb.CabacEncoder()
        ctxs = cb.new_context_set(int(g["qpd6"][t]))
        for op in range(g["kind"].shape[1]):
            kind = int(g["kind"][t, op])
            a, b = int(g["a"][t, op]), int(g["b"][t, op])
            if kind == 0:
                enc.encode_bin(ctxs, a, b)
            elif kind == 1:
                enc.encode_bypass(a, b)
            else:
                enc.encode_terminate(0)
            assert enc.bit_len() == int(g["length"][t, op]), (t, op, kind)
        enc.finish()
        n = int(g["nbytes"][t])
        assert bytes(enc.buf) == bytes(g["stream"][t][:n]), f"trace {t}"
        np.testing.assert_array_equal(np.frombuffer(bytes(ctxs), np.uint8),
                                      g["ctxs"][t], err_msg=f"trace {t} ctxs")


def test_put_coef_golden(golden):
    g = golden("putcoef")
    for t in range(len(g["sz"])):
        sz, q, pm = int(g["sz"][t]), int(g["qpd6"][t]), int(g["pmode"][t])
        blk = g["blk"][t][:sz, :sz]
        enc = cb.CabacEncoder()
        ctxs = cb.new_context_set(q)
        syntax.put_coef(enc, ctxs, sz, False, pm, blk)
        assert enc.bit_len() == int(g["length"][t]), f"case {t} sz={sz} pm={pm}"
        enc.finish()
        n = int(g["nbytes"][t])
        assert bytes(enc.buf) == bytes(g["stream"][t][:n]), f"case {t}"
        np.testing.assert_array_equal(np.frombuffer(bytes(ctxs), np.uint8),
                                      g["ctxs"][t], err_msg=f"case {t} ctxs")


def test_headers_match_golden_image_stream(golden):
    g = golden("images")
    # every golden image stream must start with our header bytes
    for t in range(int(g["n"])):
        q = int(g[f"qpd6_{t}"])
        rcon = g[f"rcon_{t}"]
        hdr = headers.write_headers(q, rcon.shape[0], rcon.shape[1])
        stream = bytes(g[f"stream_{t}"])
        assert stream[:len(hdr)] == hdr, f"image {t} qpd6={q}"


def test_scan_tables_shapes():
    for sz in (4, 8, 16, 32):
        for st in (0, 1, 2):
            if st and sz > 8:
                continue
            tab = syntax.scan_table(sz, st)
            assert tab.shape == (sz * sz, 2)
            # a permutation of all positions
            flat = tab[:, 0] * sz + tab[:, 1]
            assert len(set(flat.tolist())) == sz * sz
    # first entries of the diagonal scan (CG-major, y-descending)
    d8 = syntax.scan_table(8, 0)
    assert d8[:6].tolist() == [[0, 0], [1, 0], [0, 1], [2, 0], [1, 1], [0, 2]]
