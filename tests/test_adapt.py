"""Adaptive per-image rate-price correction (VERDICT r4 item 3).

The pack reports realized CABAC stats (payload bits / context bins / bypass
bins); encode_many_fast's lean path re-encodes price-mispredicted images at
their measured context-bin price and keeps the better stream by REAL RD
cost. These tests pin: (1) price inputs at the default knobs reproduce the
fixed-price encoder exactly, (2) the corrective pass only ever improves
real RD and its streams stay decode-consistent, (3) the realized-stats
plumbing is sane.
"""
import os

import numpy as np
import pytest

from hevce_tpu.models import wavefront as wf
from hevce_tpu.runtime import native
from hevce_tpu.utils.imageio import read_pgm
from hevce_tpu.utils.tracing import PhaseTimer

K1 = "/root/reference/testimage/01.pgm"


@pytest.fixture(scope="module")
def crop():
    return np.ascontiguousarray(read_pgm(K1)[:96, :160])


def test_price_inputs_default_identity(crop):
    """Explicit default prices == the implicit constant-knob path."""
    out1, meta1 = wf._dispatch_batch([crop], 2)
    rec1 = wf._fetch_lean(out1, meta1, PhaseTimer())
    B = 1
    pr = (np.full(B, wf.CTX_BIT, np.int32), np.full(B, wf.SIG_ZERO, np.int32))
    out2, meta2 = wf._dispatch_batch([crop], 2, prices=pr)
    rec2 = wf._fetch_lean(out2, meta2, PhaseTimer())
    assert np.array_equal(rec1, rec2)


def test_lower_price_changes_decisions_and_decodes(crop):
    """A lower context price produces a different, still-valid stream."""
    pr = (np.full(1, (wf.CTX_BIT * 3) // 4, np.int32),
          np.full(1, (wf.SIG_ZERO * 3) // 4, np.int32))
    out, meta = wf._dispatch_batch([crop], 2, prices=pr)
    rec = wf._fetch_lean(out, meta, PhaseTimer())
    st = []
    s, r = wf._pack_lean(rec, meta, True, PhaseTimer(), stats_out=st)
    assert np.array_equal(native.decode_stream(s[0]), r[0])
    bits, nctx, nbyp, rcon = st[0]
    assert bits > 0 and nctx > 0 and nbyp > 0
    assert np.array_equal(rcon, r[0])
    # realized stats are consistent: payload bits exceed bypass bins and
    # the stream length bounds the payload
    assert nbyp < bits <= len(s[0]) * 8


def test_adaptive_pass_keep_policy(crop, monkeypatch):
    """Force the corrective pass and check the keep-policy guarantee:
    SSE never worsens, the rate budget is respected, streams decode."""
    def sse(img, r):
        h, w = img.shape
        d = img.astype(np.int64) - r[:h, :w].astype(np.int64)
        return int((d * d).sum())

    # baseline: adaptation off
    monkeypatch.setenv("HEVCE_ADAPT", "0")
    s0, r0 = wf.encode_many_fast([crop], 2, batch=1)
    # force every image to re-pass at the floor price (measured-bpp mode)
    monkeypatch.setenv("HEVCE_ADAPT", "post")
    monkeypatch.setattr(wf, "ADAPT_BPP_TRIGGER", {q: 0.0 for q in range(5)})
    s1, r1 = wf.encode_many_fast([crop], 2, batch=1)
    assert sse(crop, r1[0]) <= sse(crop, r0[0])
    assert (len(s1[0]) - len(s0[0])) * 8 <= int(
        wf.ADAPT_BPP_ALLOW * crop.size)
    assert np.array_equal(native.decode_stream(s1[0]), r1[0])


def test_pre_predictor_prices(crop, monkeypatch):
    """'pre' mode: a forced low trigger prices every image below CTX_BIT in
    the PRIMARY dispatch (no second pass), and the stream stays valid."""
    monkeypatch.setenv("HEVCE_ADAPT", "pre")
    monkeypatch.setattr(wf, "ADAPT_GRAD_TRIGGER", 0.01)
    pr = wf._predict_prices([crop], 2)
    assert pr is not None and pr[0][0] < wf.CTX_BIT
    s, r = wf.encode_many_fast([crop], 2, batch=1)
    assert np.array_equal(native.decode_stream(s[0]), r[0])
    # qpd6=0 is excluded (fast mode not servable there at any price)
    assert wf._predict_prices([crop], 0) is None
    # below-trigger images take the constant-knob fast path
    monkeypatch.setattr(wf, "ADAPT_GRAD_TRIGGER", 1e9)
    assert wf._predict_prices([crop], 2) is None


def test_adapt_rule_shape():
    """Rule basics: flag only above the bpp trigger; price scales down
    with bpp and respects the floor."""
    npix = 1000
    assert wf._adapt_rule(0, 0, 0, 0) is None
    assert wf._adapt_rule(int(2.0 * npix), 1, 0, npix) is None   # 2.0 bpp
    ctx3, _ = wf._adapt_rule(int(3.0 * npix), 1, 0, npix, 2)
    ctx4, sig4 = wf._adapt_rule(int(4.0 * npix), 1, 0, npix, 2)
    assert ctx3 == int(wf.ADAPT_PRICE_AT_TRIGGER)
    assert wf.ADAPT_FLOOR <= ctx4 < ctx3 and sig4 >= 1
    # absurd rates floor out
    ctxN, _ = wf._adapt_rule(int(50.0 * npix), 1, 0, npix)
    assert ctxN == wf.ADAPT_FLOOR
