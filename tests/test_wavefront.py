"""Wavefront fast mode (SURVEY §2.4 SP row; ROADMAP Phase C).

The mode is documented non-bit-exact (greedy device decisions with the
reference's estimateCoeffRate model instead of live-CABAC trial rates), so
the contracts tested here are:
  1. the packed stream is decodable by the INDEPENDENT decoder and decodes
     bit-exactly to the device-computed reconstruction (hard correctness:
     any decision/pack/recon inconsistency breaks this);
  2. quality lands close to the exact reference RDO (loose envelope);
  3. batching: a batch encodes to the same streams as single images.
"""
import numpy as np
import pytest

from hevce_tpu.models.wavefront import encode_batch_fast
from hevce_tpu.runtime.native import decode_stream, encode_image_native


def _psnr(a, b):
    m = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 10 * np.log10(255 * 255 / max(m, 1e-9))


def test_fast_mode_decodes_to_device_recon():
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)   # large-CU/split content

    streams, recons = encode_batch_fast([noise, smooth], 2)
    for s, r in zip(streams, recons):
        dec = decode_stream(s)
        np.testing.assert_array_equal(dec, r)

    # determinism across calls (same jit, device-resident state rebuilt)
    streams2, _ = encode_batch_fast([noise, smooth], 2)
    assert streams2 == streams

    # quality envelope vs the exact encoder (greedy + estimated rates):
    # within 1.5 dB and 25% size on both contents
    for img, s, r in ((noise, streams[0], recons[0]),
                      (smooth, streams[1], recons[1])):
        se, re = encode_image_native(img, 2)
        assert _psnr(r, img) > _psnr(re, img) - 1.5
        assert len(s) < len(se) * 1.25


def test_fast_mode_degenerate_grids():
    """Single-CTU, single-row (R=1) and single-column (Cc=1) grids exercise
    the scan core's window/flag edges (no above row, no left column)."""
    from hevce_tpu.models.wavefront import encode_image_fast
    rng = np.random.default_rng(21)
    for shape in ((32, 32), (32, 96), (96, 32)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        s, r = encode_image_fast(img, 2)
        np.testing.assert_array_equal(decode_stream(s), r)


def test_fast_mode_mesh_sharded_matches_unsharded():
    import jax
    from hevce_tpu.parallel.batch import make_mesh
    rng = np.random.default_rng(17)
    imgs = [rng.integers(0, 256, (64, 64)).astype(np.uint8) for _ in range(8)]
    plain, _ = encode_batch_fast(imgs, 2)
    mesh = make_mesh(jax.devices()[:8])
    sharded, recons = encode_batch_fast(imgs, 2, mesh=mesh)
    assert sharded == plain
    for s, r in zip(sharded, recons):
        np.testing.assert_array_equal(decode_stream(s), r)


def test_encode_many_fast_pipelined_matches_batches(monkeypatch):
    # pin adaptation off: encode_many_fast's default 'pre' mode applies
    # per-image predicted prices, while the per-image encode_batch_fast
    # comparison basis is the constant-knob single pass
    monkeypatch.setenv("HEVCE_ADAPT", "0")
    from hevce_tpu.models.wavefront import encode_many_fast
    rng = np.random.default_rng(13)
    shapes = [(64, 64), (64, 96), (64, 64), (64, 64), (64, 96)]
    imgs = [rng.integers(0, 256, s).astype(np.uint8) for s in shapes]

    streams, recons = encode_many_fast(imgs, 2, batch=2)  # forces pipelining
    singles = [encode_batch_fast([im], 2) for im in imgs]
    for i, (s1, r1) in enumerate(singles):
        assert streams[i] == s1[0], i
        np.testing.assert_array_equal(recons[i], r1[0])

    s2, r2 = encode_many_fast(imgs, 2, batch=2, want_recon=False)
    assert s2 == streams and all(r is None for r in r2)


def test_fast_mode_lean_matches_full_records():
    """The lean decision-only fetch (default) and the full qc-record fetch
    must produce identical streams AND recons — the host replay (csrc
    replay_cu) recomputes quant levels bit-identically to the device
    compose, by the shared golden-validated candidate pipeline."""
    from hevce_tpu.models import wavefront as wf
    rng = np.random.default_rng(23)
    noise = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    yy, xx = np.mgrid[0:64, 0:96]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)
    s_lean, r_lean = wf.encode_batch_fast([noise, smooth], 2)
    s_full, r_full = wf.encode_batch_fast([noise, smooth], 2, fetch_qc=True)
    assert s_lean == s_full
    for rl, rf in zip(r_lean, r_full):
        np.testing.assert_array_equal(rl, rf)


@pytest.mark.parametrize("fetch_qc", [False, True])
def test_fast_mode_transfer_checksum_catches_corruption(monkeypatch, fetch_qc):
    """Bit-flip injection: transfer integrity is DEFAULT-ON for the fast
    path (round-2 verdict item 5), on both the lean decision-record fetch
    (round 3 default) and the full qc-record fetch — a corrupted buffer would
    otherwise pack into a well-formed stream that silently decodes to the
    wrong image (the axon tunnel has corrupted large transfers before)."""
    from hevce_tpu.models import wavefront as wf
    from hevce_tpu.utils.tracing import PhaseTimer
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    out, meta = wf._dispatch_batch([img], 2, None, True, fetch_qc)

    real = np.asarray

    def corrupt(a, *args, **kw):
        h = real(a, *args, **kw)
        if getattr(h, "dtype", None) == np.int8 and h.size > 100:
            h = h.copy()
            h.reshape(-1)[42] ^= 1          # inside the record, not the tail
        return h

    monkeypatch.setattr(wf.np, "asarray", corrupt)
    with pytest.raises(IOError, match="checksum mismatch"):
        wf._finish_batch(out, meta, True, PhaseTimer(), fetch_qc)


def test_fast_mode_int8_escape_fallback():
    """An image whose quant levels exceed int8 must set the escape flag and
    still round-trip through the exact int16 fallback fetch."""
    from hevce_tpu.models import wavefront as wf
    # 2-pel checkerboard at qpd6=0 drives huge high-frequency coefficients
    yy, xx = np.mgrid[0:32, 0:32]
    img = (255 * ((yy // 2 + xx // 2) % 2)).astype(np.uint8)
    out, meta = wf._dispatch_batch([img], 0, None, True, fetch_qc=True)
    side = np.asarray(out[1])
    assert side[0, 1] == 1, "expected an int8 escape on this content"
    s, r = wf._finish_batch(out, meta, True, __import__(
        "hevce_tpu.utils.tracing", fromlist=["PhaseTimer"]).PhaseTimer(),
        fetch_qc=True)
    np.testing.assert_array_equal(decode_stream(s[0]), r[0])


def test_encode_many_exact_hinted_bit_exact():
    """Device-oracle HINTED exact encode must be byte-identical to the
    unhinted native engine — hints only reorder trial evaluation (round-2
    verdict item 4: use the device oracle to accelerate the exact search)."""
    from hevce_tpu.models.wavefront import encode_many_exact
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (64, 64)).astype(np.uint8) for _ in range(2)]
    yy, xx = np.mgrid[0:64, 0:64]
    imgs.append(((yy * 3 + xx) % 256).astype(np.uint8))
    s, r = encode_many_exact(imgs, 2, nthreads=1)
    for i, im in enumerate(imgs):
        se, re = encode_image_native(im, 2)
        assert s[i] == se, f"hinted stream {i} != exact"
        np.testing.assert_array_equal(r[i], re)


@pytest.mark.slow
def test_fast_mode_kodak_image():
    """Kodak-sized (768x512) fast-mode regression in-suite, so bench.py is
    not the only guard on the flagship path (round-2 verdict item 9):
    decode-verified + quality/size envelope vs the bit-exact engine."""
    import os
    path = "/root/reference/testimage/01.pgm"
    if not os.path.exists(path):
        pytest.skip("reference test images unavailable")
    from hevce_tpu.utils.imageio import read_pgm
    from hevce_tpu.models.wavefront import encode_image_fast
    img = read_pgm(path)
    s, r = encode_image_fast(img, 2)
    np.testing.assert_array_equal(decode_stream(s), r)
    se, re = encode_image_native(img, 2)
    assert _psnr(r[:512, :768], img) > _psnr(re[:512, :768], img) - 0.5
    assert len(s) < len(se) * 1.06


@pytest.mark.slow
def test_fast_mode_odd_dims_and_qpd6_sweep():
    from hevce_tpu.models.wavefront import encode_image_fast
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (50, 70)).astype(np.uint8)  # pads to 64x96
    for q in (0, 4):
        s, r = encode_image_fast(img, q)
        np.testing.assert_array_equal(decode_stream(s), r)


def test_satd_matches_hadamard_oracle():
    """block_satd (int8-digit-split MXU matmuls) vs a direct numpy
    Walsh-Hadamard oracle: sum |H @ r @ H| — exact at every CU size for
    full-range residuals (|r| <= 255), the RMD preselection's metric."""
    import jax.numpy as jnp
    from hevce_tpu.ops.satd import block_satd

    rng = np.random.default_rng(7)
    for sz in (4, 8, 16, 32):
        r = rng.integers(-255, 256, (5, 3, sz, sz)).astype(np.int32)
        h = np.array([[1]], np.int64)
        while h.shape[0] < sz:
            h = np.block([[h, h], [h, -h]])
        exp = np.abs(np.einsum("ij,bmjk,kl->bmil", h, r.astype(np.int64), h)
                     ).sum((-1, -2))
        got = np.asarray(block_satd(sz, jnp.asarray(r)))
        np.testing.assert_array_equal(got, exp)


def test_topk_mask_matches_sequential_argmin():
    """_topk_mask's selected SET must equal K sequential argmin rounds
    (ties toward lower index) and its rows must enumerate that set in
    ascending index order — including heavy ties at the K-th-smallest
    threshold (the round-3 advisor repro: trimming candidates by index
    dropped a strictly smaller high-index cost in favor of a tie)."""
    import jax.numpy as jnp
    from hevce_tpu.models.wavefront import _topk_mask

    def oracle_set(c, K):
        c = c.astype(np.int64).copy()
        picked = []
        for _ in range(K):
            i = int(np.argmin(c))           # ties toward lower index
            picked.append(i)
            c[i] = np.iinfo(np.int64).max
        return sorted(picked)

    cases = [(np.array([[4, 0, 2, 5, 3, 0, 4, 4, 5, 1]], np.int32), 7)]
    rng = np.random.default_rng(11)
    for K in (1, 2, 5, 11, 35):
        cases.append((rng.integers(0, 6, (8, 35)).astype(np.int32), K))
        cases.append((rng.integers(0, 10**6, (8, 35)).astype(np.int32), K))
    for cost, K in cases:
        oh = np.asarray(_topk_mask(jnp.asarray(cost), K))
        assert oh.shape == cost.shape[:-1] + (K, cost.shape[-1])
        for b in range(cost.shape[0]):
            rows = [int(np.flatnonzero(oh[b, k])[0]) for k in range(K)]
            assert all(oh[b, k].sum() == 1 for k in range(K))
            assert rows == sorted(rows), "rows must ascend by index"
            assert rows == oracle_set(cost[b], K), (cost[b], K, rows)


def test_fast_mode_rmd_full_is_dense_identity():
    """rmd=(35, 35) must be BIT-IDENTICAL to the dense rmd=None evaluation
    (the preselection masks degenerate to the identity) — the invariant the
    _eval_node_rmd/_make_front_core docstrings promise. Mixed content: noise
    exercises NxN/TU-split leaves, the gradient large CUs."""
    rng = np.random.default_rng(31)
    noise = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    yy, xx = np.mgrid[0:64, 0:96]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)
    s_d, r_d = encode_batch_fast([noise, smooth], 2, rmd=None)
    s_f, r_f = encode_batch_fast([noise, smooth], 2, rmd=(35, 35))
    assert s_f == s_d
    for a, b in zip(r_f, r_d):
        np.testing.assert_array_equal(a, b)


def test_fast_mode_rmd_preselected_valid():
    """RMD with a real preselection (K=10, T=3) must still produce
    standard-compliant streams that decode bit-exactly to the returned
    recon, and stay within a loose quality envelope of the dense search."""
    rng = np.random.default_rng(33)
    noise = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)
    s, r = encode_batch_fast([noise, smooth], 2, rmd=(10, 3))
    for st, rc in zip(s, r):
        np.testing.assert_array_equal(decode_stream(st), rc)
    s_d, r_d = encode_batch_fast([noise, smooth], 2, rmd=None)
    for img, rc, rcd, st, std in zip((noise, smooth), r, r_d, s, s_d):
        assert _psnr(rc, img) > _psnr(rcd, img) - 0.5
        assert len(st) < len(std) * 1.10 + 16


def test_resolve_rmd_env(monkeypatch):
    from hevce_tpu.models import wavefront as wf
    monkeypatch.setenv("HEVCE_RMD", "12,4")
    assert wf._resolve_rmd(wf._RMD_ENV) == (12, 4)
    monkeypatch.setenv("HEVCE_RMD", "100,50")   # clamp K first, then T <= K
    assert wf._resolve_rmd(wf._RMD_ENV) == (35, 35)
    monkeypatch.setenv("HEVCE_RMD", "off")
    assert wf._resolve_rmd(wf._RMD_ENV) is None
    monkeypatch.setenv("HEVCE_RMD", "8")
    with pytest.raises(ValueError, match="HEVCE_RMD"):
        wf._resolve_rmd(wf._RMD_ENV)
    # explicit rmd= bypasses the env entirely
    assert wf._resolve_rmd((10, 3)) == (10, 3)
    assert wf._resolve_rmd(None) is None


def test_lastxy_rate_oracle():
    """The gather-free last-XY + sig-map rate estimate (sub-bit pricing +
    CG-aware refinement, wavefront.py module docs) equals a direct numpy
    transcription of the model: exact last-position group-code rate, one
    SIG_ZERO per scanned zero before last, EXCEPT all-zero middle
    coefficient groups which cost one CG_BIN (as does every middle group's
    sig_cg flag; reference put_coef sig_cg semantics src/HEVCe.c:1199-1212)."""
    import jax.numpy as jnp
    from hevce_tpu.models import wavefront as wf

    rng = np.random.default_rng(3)
    for sz in (4, 8):
        q = np.where(rng.random((20, 35, sz, sz)) < 0.06,
                     rng.integers(-5, 6, (20, 35, sz, sz)), 0).astype(np.int32)
        cv = jnp.full((20,), wf.CTX_BIT, jnp.int32)
        sv = jnp.full((20,), wf.SIG_ZERO, jnp.int32)
        got = np.asarray(wf._lastxy_rate(sz, jnp.asarray(q), cv, sv))
        inv, cnt, byp, stm = wf._scan_consts(sz)
        tbl = cnt * wf.CTX_BIT + byp
        exp = np.zeros((20, 35), np.int64)
        for b in range(20):
            for m in range(35):
                st = stm[m] if sz <= 8 else 0
                sig = q[b, m].reshape(-1) != 0
                if not sig.any():
                    continue
                il = (inv[st] * sig).max()
                rate = tbl[st][inv[st] == il][0]
                rate += (il + 1 - sig.sum()) * wf.SIG_ZERO
                if sz * sz > 16:
                    cg_pix = inv[st] >> 4
                    cg_last = il >> 4
                    nzero = sum(1 for c in range(1, cg_last)
                                if not sig[cg_pix == c].any())
                    rate += (-16 * nzero * wf.SIG_ZERO
                             + max(cg_last - 1, 0) * wf.CG_BIN)
                exp[b, m] = rate
        np.testing.assert_array_equal(got, exp)
