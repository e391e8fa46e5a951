"""Lockstep batched encoding: TPU device math + C++ host arbiters.

B same-sized images are encoded bit-exactly in parallel: B C++ worker threads
walk the (content-independent) CU search schedule; at every schedule event
their 35-mode candidate-math requests rendezvous into ONE device batch, a
single jitted TPU step computes all candidates, and the workers' RD arbiters
(live CABAC state, trial encodes) consume the results. Streams are identical
to the sequential/reference encoder.

This is ROADMAP.md Phase A+B: the 68%-of-runtime math and the exact CABAC
trial rates run on the device; the host cost is sequential arbitration only.

Pipelining (SURVEY §2.4 PP row): with ``pipeline=True`` the batch is split
into two half-batches driven by interleaved dispatch/complete, so one half's
device step is in flight while the other half's host arbiters consume their
results — device math hides behind host arbitration and vice versa. Streams
are bit-exact either way (the halves are independent images).
"""
import ctypes
import functools
import os

import numpy as np

from hevce_tpu.models import cu_eval
from hevce_tpu.runtime import native

MODES = 35
KIND_NODE, KIND_PU, KIND_DONE, KIND_NODE_FETCH, KIND_PU_FETCH = 0, 1, 2, 3, 4


def _bind(lib):
    lib.hevce_batch_create.restype = ctypes.c_void_p
    lib.hevce_batch_create.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
    lib.hevce_batch_next.restype = ctypes.c_int
    lib.hevce_batch_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.hevce_batch_supply.argtypes = [ctypes.c_void_p]
    lib.hevce_batch_buf.restype = ctypes.c_void_p
    lib.hevce_batch_buf.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hevce_batch_stream.restype = ctypes.c_longlong
    lib.hevce_batch_stream.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_uint8)]
    lib.hevce_batch_rcon.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_uint8)]
    lib.hevce_batch_destroy.argtypes = [ctypes.c_void_p]
    lib.hevce_batch_abort.argtypes = [ctypes.c_void_p]


def _view(lib, handle, which, dtype, count):
    ptr = lib.hevce_batch_buf(handle, which)
    ctype = ctypes.c_int32 if dtype == np.int32 else ctypes.c_uint8
    return np.ctypeslib.as_array(ctypes.cast(ptr, ctypes.POINTER(ctype)),
                                 shape=(count,))


# worst-case op counts per trial (chunked bypass format) — overflow-free
_NODE_CAPS = {8: 768, 16: 2048, 32: 7168}


def _shardings(mesh, nin, nout):
    """batch-axis data-parallel shardings over mesh axis 'img' (SURVEY §2.4:
    DP over images is the natural multi-chip mapping for this encoder)."""
    if mesh is None:
        return {}
    from jax.sharding import NamedSharding, PartitionSpec
    sh = NamedSharding(mesh, PartitionSpec("img"))
    return dict(in_shardings=(sh,) * nin, out_shardings=(sh,) * nout)


@functools.lru_cache(maxsize=None)
def _jit_node_step(sz: int, qpd6: int, mesh=None):
    """node event: candidate math for both TU layouts + device trial rates
    against the uploaded fork state (ROADMAP Phase B integration).

    Overflowing lanes (op count beyond the cap) return rate -1 and the C++
    arbiter trial-encodes those on the host — bit-exactness is unconditional.
    """
    import jax
    import jax.numpy as jnp

    from hevce_tpu.ops import cabac_sim as sim
    from hevce_tpu.ops import coef_ops as co

    cap = _NODE_CAPS[sz]

    def step(top, left, flags, orig, state7, fctxs, meta):
        q1, r1, s1 = cu_eval.eval_2nx2n(sz, qpd6, top, left, flags, orig)
        q4, r4, s4 = cu_eval.eval_tusplit(sz, qpd6, top, left, flags, orig)
        B = q1.shape[0]

        def rep(v):
            return jnp.repeat(v, MODES, axis=0)

        pm = jnp.tile(jnp.arange(MODES, dtype=jnp.int32), B)
        pml, pma = rep(meta[:, 0]), rep(meta[:, 1])
        gl, ga = rep(meta[:, 2]).astype(bool), rep(meta[:, 3]).astype(bool)
        palette, remap = co._palette(sz, full_trial=True)
        fork = dict(rng=rep(state7[:, 0]), low=rep(state7[:, 1]),
                    nbits=rep(state7[:, 2]), outstanding=rep(state7[:, 3]),
                    bufbyte=rep(state7[:, 4]), zrun=rep(state7[:, 5]),
                    nbytes=rep(state7[:, 6]), ctxs=rep(fctxs)[:, palette])
        base = sim.bit_len(fork)

        from hevce_tpu.ops import cabac_pallas as cp

        ops2, val2 = co.generate_cu_2nx2n_ops(
            sz, pm, pml, pma, gl, ga, q1.reshape(B * MODES, sz, sz))
        packed2, ovf2, n2 = co.compact_ops(co.remap_ctx_ops(ops2, remap), val2, cap)
        h = sz // 2
        ops3, val3 = co.generate_cu_tusplit_ops(
            sz, pm, pml, pma, gl, ga, q4.reshape(B * MODES, 4, h, h))
        packed3, ovf3, n3 = co.compact_ops(co.remap_ctx_ops(ops3, remap), val3, cap)

        # both layouts' trials in ONE rate-scan call (Pallas kernel on TPU)
        fork2 = {k: jnp.concatenate([v, v]) for k, v in fork.items()}
        final = cp.advance_rates(fork2,
                                 jnp.concatenate([packed2, packed3]),
                                 jnp.concatenate([n2, n3]))
        rates = sim.bit_len(final) - jnp.concatenate([base, base])
        rates2 = jnp.where(ovf2, -1, rates[:B * MODES]).astype(jnp.int32)
        rates3 = jnp.where(ovf3, -1, rates[B * MODES:]).astype(jnp.int32)

        return (q1, r1, s1, q4, r4, s4,
                rates2.reshape(B, MODES), rates3.reshape(B, MODES))

    return jax.jit(step, **_shardings(mesh, 7, 8))


@functools.lru_cache(maxsize=None)
def _jit_sums(n: int):
    """int32 wrap-around checksums of n arrays (device side)."""
    import jax
    import jax.numpy as jnp

    def f(*arrs):
        return tuple(jnp.sum(a.astype(jnp.int32)) for a in arrs)

    return jax.jit(f)


def _verified_get(arrs):
    """Transfer device arrays to host, validating a device-computed int32
    checksum per array (the axon TPU tunnel corrupted one large transfer in
    round 1 — VERIFICATION.md). Fails loudly on mismatch so a corrupted
    batch can never silently produce wrong streams. Enabled with
    HEVCE_VERIFY_TRANSFERS=1 (costs one extra device round trip per fetch,
    so it is opt-in)."""
    want = [int(s) for s in _get(_jit_sums(len(arrs))(*arrs), False)]
    host = [np.asarray(a) for a in arrs]
    got = [int(h.astype(np.int32).sum(dtype=np.int32)) for h in host]
    if got != want:
        raise IOError(
            "device->host transfer checksum mismatch (tunnel corruption): "
            f"expected {want}, got {got}")
    return host


def _get(arrs, verify):
    if verify:
        return _verified_get(list(arrs))
    return [np.asarray(a) for a in arrs]


@functools.lru_cache(maxsize=None)
def _jit_gather_node(sz: int):
    """winner-lane gather: sel (B,) flat lane (layout*35+pm, or <0 for none)
    -> (B, sz*sz) quant + recon rows. Masked sums, exact; keeps everything
    except the winners on the device."""
    import jax
    import jax.numpy as jnp

    def g(q1, r1, q4, r4, sel):
        B = sel.shape[0]
        nn = sz * sz
        iota = jnp.arange(MODES, dtype=jnp.int32)
        oh2 = (iota[None, :] == sel[:, None]).astype(jnp.int32)
        oh3 = (iota[None, :] == (sel[:, None] - MODES)).astype(jnp.int32)
        q1f = q1.reshape(B, MODES, nn)
        q4f = q4.reshape(B, MODES, nn)
        r1f = r1.reshape(B, MODES, nn).astype(jnp.int32)
        r4f = r4.reshape(B, MODES, nn).astype(jnp.int32)
        wq = (q1f * oh2[:, :, None]).sum(1) + (q4f * oh3[:, :, None]).sum(1)
        wr = (r1f * oh2[:, :, None]).sum(1) + (r4f * oh3[:, :, None]).sum(1)
        return wq, wr.astype(jnp.uint8)

    return jax.jit(g)


@functools.lru_cache(maxsize=None)
def _jit_gather_pu():
    """winner-lane gather for PU events: sel (B,) pm (or <0) -> (B, 16) rows."""
    import jax
    import jax.numpy as jnp

    def g(q1, r1, sel):
        B = sel.shape[0]
        iota = jnp.arange(MODES, dtype=jnp.int32)
        oh = (iota[None, :] == sel[:, None]).astype(jnp.int32)
        q1f = q1.reshape(B, MODES, 16)
        r1f = r1.reshape(B, MODES, 16).astype(jnp.int32)
        wq = (q1f * oh[:, :, None]).sum(1)
        wr = (r1f * oh[:, :, None]).sum(1)
        return wq, wr.astype(jnp.uint8)

    return jax.jit(g)


@functools.lru_cache(maxsize=None)
def _jit_pu_step(qpd6: int, mesh=None):
    """4x4 PU step: candidate math + fused device rate oracle.

    The step-4 PU rate is a fresh-coder putCoef CABAClen (reference
    src/HEVCe.c:1505-1519); ops/coef_ops + ops/cabac_sim compute it exactly
    on device, so the host arbiter does no entropy work for PU search.
    Lanes flagged overflow (pathological op counts) get rate -1 and the host
    falls back to its own trial encode.
    """
    import jax
    import jax.numpy as jnp

    from hevce_tpu.ops import coef_ops as co

    def step(top, left, flags, orig):
        q1, r1, s1 = cu_eval.eval_2nx2n(4, qpd6, top, left, flags, orig)
        B = q1.shape[0]
        blks = q1.reshape(B * MODES, 4, 4)
        pms = jnp.tile(jnp.arange(MODES, dtype=jnp.int32), B)
        rates, overflow = co.put_coef_rates(4, qpd6, pms, blks, cap=256)
        rates = jnp.where(overflow, -1, rates).reshape(B, MODES)
        return q1, r1, s1, rates

    return jax.jit(step, **_shardings(mesh, 4, 4))


class _Run:
    """One lockstep engine instance (one C++ BatchEngine + its device state),
    with the per-event work split into next / dispatch / complete so a driver
    can keep two instances in flight (pipelined halves)."""

    def __init__(self, lib, images, qpd6, node_rates, mesh, verify, timer, tag=""):
        self.lib = lib
        self.qpd6 = qpd6
        self.node_rates = node_rates
        self.mesh = mesh
        self.verify = verify
        self.timer = timer
        self.tag = tag
        self.B = B = len(images)
        self.ysz, self.xsz = images[0].shape
        self.yp = -(-self.ysz // 32) * 32
        self.xp = -(-self.xsz // 32) * 32
        self.blob = np.concatenate([im.reshape(-1) for im in images])
        self.handle = lib.hevce_batch_create(
            self.blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            B, self.ysz, self.xsz, qpd6)
        assert self.handle
        self.req_top = _view(lib, self.handle, 0, np.int32, B * 65).reshape(B, 65)
        self.req_left = _view(lib, self.handle, 1, np.int32, B * 64).reshape(B, 64)
        self.req_flags = _view(lib, self.handle, 2, np.uint8, B * 4).reshape(B, 4)
        self.req_orig = _view(lib, self.handle, 3, np.int32, B * 1024).reshape(B, 1024)
        self.res_quant = _view(lib, self.handle, 4, np.int32, B * MODES * 1024)
        self.res_recon = _view(lib, self.handle, 5, np.uint8, B * MODES * 1024)
        self.res_sse = _view(lib, self.handle, 6, np.int32, B * MODES)
        self.res_quant4 = _view(lib, self.handle, 7, np.int32, B * MODES * 1024)
        self.res_recon4 = _view(lib, self.handle, 8, np.uint8, B * MODES * 1024)
        self.res_sse4 = _view(lib, self.handle, 9, np.int32, B * MODES)
        self.res_rates = _view(lib, self.handle, 10, np.int32, B * MODES)
        self.res_rates2 = _view(lib, self.handle, 11, np.int32, B * MODES)
        self.res_rates3 = _view(lib, self.handle, 12, np.int32, B * MODES)
        self.req_state = _view(lib, self.handle, 13, np.int32, B * 7).reshape(B, 7)
        self.req_ctxs = _view(lib, self.handle, 14, np.int32, B * 142).reshape(B, 142)
        self.req_meta = _view(lib, self.handle, 15, np.int32, B * 4).reshape(B, 4)
        self.req_fetch = _view(lib, self.handle, 16, np.int32, B)
        self._szv = ctypes.c_int(0)
        self.kind = None
        self.sz = 0
        self.pend = {}      # device-resident candidates awaiting the fetch event
        self._out = None    # in-flight device results for the current event
        self.done = False

    # -- event machinery ----------------------------------------------------
    def next(self):
        """Block until all workers rendezvous at the next schedule event."""
        with self.timer.phase("host_arbiter"):
            self.kind = self.lib.hevce_batch_next(self.handle,
                                                  ctypes.byref(self._szv))
        self.sz = self._szv.value
        if self.kind == KIND_DONE:
            self.done = True
        return self.kind

    def _start_fetch(self, arrs):
        """Begin the device->host transfers without blocking, so two in-flight
        runs overlap their round trips (complete() then finds the data already
        on its way). Opt-in via HEVCE_ASYNC_FETCH=1: measured to HANG the
        tunneled axon TPU backend (a copy_to_host_async that never completes),
        so it must only be enabled on backends where it is known-good."""
        if os.environ.get("HEVCE_ASYNC_FETCH", "0") != "1":
            return
        for a in arrs:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass

    def dispatch(self):
        """Issue this event's device computation (async; does not block on
        results). Request buffers are fully consumed here, so the engine can
        be resupplied as soon as complete() has written the results back."""
        kind, sz, B = self.kind, self.sz, self.B
        nn = sz * sz
        if kind in (KIND_NODE, KIND_PU):
            top = self.req_top[:, :1 + 2 * sz]
            left = self.req_left[:, :2 * sz]
            flags = self.req_flags.astype(bool)
            orig = self.req_orig[:, :nn].reshape(B, sz, sz)
        if kind == KIND_NODE:
            with self.timer.phase(f"device_math_node{sz}"):
                if self.node_rates:
                    self._out = _jit_node_step(sz, self.qpd6, self.mesh)(
                        top, left, flags, orig, self.req_state.copy(),
                        self.req_ctxs.copy(), self.req_meta.copy())
                else:
                    q1, r1, s1 = cu_eval.jit_eval_2nx2n(sz, self.qpd6)(
                        top, left, flags, orig)
                    q4, r4, s4 = cu_eval.jit_eval_tusplit(sz, self.qpd6)(
                        top, left, flags, orig)
                    self._out = (q1, r1, s1, q4, r4, s4, None, None)
            o = self._out
            self._start_fetch((o[6], o[7], o[2], o[5]) if self.node_rates
                              else (o[2], o[5]))
        elif kind == KIND_PU:
            with self.timer.phase("device_math_pu"):
                self._out = _jit_pu_step(self.qpd6, self.mesh)(
                    top, left, flags, orig)
            self._start_fetch((self._out[2], self._out[3]))
        elif kind == KIND_NODE_FETCH:
            sel = self.req_fetch.copy()
            p = self.pend
            with self.timer.phase("winner_fetch"):
                if (sel == -1).any():
                    self._out = ("full", sel, (p["q1"], p["r1"], p["q4"], p["r4"]))
                elif (sel >= 0).any():
                    wq, wr = _jit_gather_node(sz)(
                        p["q1"], p["r1"], p["q4"], p["r4"], sel)
                    self._out = ("winner", sel, (wq, wr))
                else:
                    self._out = ("none", sel, ())
                self._start_fetch(self._out[2])
        else:  # KIND_PU_FETCH
            sel = self.req_fetch.copy()
            p = self.pend
            with self.timer.phase("winner_fetch"):
                if (sel == -1).any():
                    self._out = ("full", sel, (p["q1"], p["r1"]))
                elif (sel >= 0).any():
                    wq, wr = _jit_gather_pu()(p["q1"], p["r1"], sel)
                    self._out = ("winner", sel, (wq, wr))
                else:
                    self._out = ("none", sel, ())
                self._start_fetch(self._out[2])

    def complete(self):
        """Materialize the dispatched results, write them into the shared
        result buffers, and release the workers into the next arbitration."""
        kind, sz, B = self.kind, self.sz, self.B
        nn = sz * sz
        if kind == KIND_NODE:
            q1, r1, s1, q4, r4, s4, rates2, rates3 = self._out
            with self.timer.phase("writeback"):
                if self.node_rates:
                    h2, h3, hs1, hs4 = _get((rates2, rates3, s1, s4), self.verify)
                    self.res_rates2[:] = h2.reshape(-1)
                    self.res_rates3[:] = h3.reshape(-1)
                else:
                    self.res_rates2[:] = -1
                    self.res_rates3[:] = -1
                    hs1, hs4 = _get((s1, s4), self.verify)
                self.res_sse[:] = hs1.reshape(-1)
                self.res_sse4[:] = hs4.reshape(-1)
            self.pend = dict(q1=q1, r1=r1, q4=q4, r4=r4)
        elif kind == KIND_PU:
            q1, r1, s1, rates = self._out
            with self.timer.phase("writeback"):
                hs1, hr = _get((s1, rates), self.verify)
                self.res_sse[:] = hs1.reshape(-1)
                self.res_rates[:] = hr.reshape(-1)
            self.pend = dict(q1=q1, r1=r1)
        elif kind == KIND_NODE_FETCH:
            mode, sel, arrs = self._out
            with self.timer.phase("winner_fetch"):
                if mode == "full":
                    hq1, hr1, hq4, hr4 = _get(arrs, self.verify)
                    self.res_quant[:B * MODES * nn] = hq1.reshape(-1)
                    self.res_recon[:B * MODES * nn] = hr1.astype(np.uint8).reshape(-1)
                    self.res_quant4[:B * MODES * nn] = hq4.reshape(-1)
                    self.res_recon4[:B * MODES * nn] = hr4.astype(np.uint8).reshape(-1)
                elif mode == "winner":
                    wq, wr = _get(arrs, self.verify)
                    for i in np.nonzero(sel >= 0)[0]:
                        layout, pm = divmod(int(sel[i]), MODES)
                        off = (i * MODES + pm) * nn
                        if layout == 0:
                            self.res_quant[off:off + nn] = wq[i]
                            self.res_recon[off:off + nn] = wr[i]
                        else:
                            self.res_quant4[off:off + nn] = wq[i]
                            self.res_recon4[off:off + nn] = wr[i]
            self.pend = {}
        elif kind == KIND_PU_FETCH:
            mode, sel, arrs = self._out
            with self.timer.phase("winner_fetch"):
                if mode == "full":
                    hq1, hr1 = _get(arrs, self.verify)
                    self.res_quant[:B * MODES * 16] = hq1.reshape(-1)
                    self.res_recon[:B * MODES * 16] = hr1.astype(np.uint8).reshape(-1)
                elif mode == "winner":
                    wq, wr = _get(arrs, self.verify)
                    for i in np.nonzero(sel >= 0)[0]:
                        off = (i * MODES + int(sel[i])) * 16
                        self.res_quant[off:off + 16] = wq[i]
                        self.res_recon[off:off + 16] = wr[i]
            self.pend = {}
        self._out = None
        self.lib.hevce_batch_supply(self.handle)

    # -- teardown / results -------------------------------------------------
    def collect(self):
        streams, rcons = [], []
        for s in range(self.B):
            n = self.lib.hevce_batch_stream(self.handle, s, None)
            buf = np.empty(n, np.uint8)
            self.lib.hevce_batch_stream(
                self.handle, s, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            streams.append(bytes(buf))
            rc = np.empty((self.yp, self.xp), np.uint8)
            self.lib.hevce_batch_rcon(
                self.handle, s, rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            rcons.append(rc)
        return streams, rcons

    def destroy(self, ok):
        if not ok:
            # free-run blocked workers so destroy() can join; their output
            # is discarded with the exception
            self.lib.hevce_batch_abort(self.handle)
        self.lib.hevce_batch_destroy(self.handle)


def encode_batch(images, qpd6: int, node_rates: bool = None, timer=None,
                 mesh=None, pipeline: bool = None):
    """Encode a list of same-shaped uint8 grayscale images bit-exactly.

    Returns (list of stream bytes, list of recon arrays (padded dims)).

    mesh: optional jax.sharding.Mesh with an 'img' axis — the device steps
    (candidate math + rate oracle) are sharded over images (data parallelism
    over ICI, SURVEY §2.4); len(images) must be a multiple of the axis size.
    Streams remain bit-exact: arbitration is per-image and sharding only
    distributes the math.

    node_rates: also compute step-2/3 trial rates on device (full Phase B
    data path; the Pallas CABAC scan kernel, 3.3M rates/s/chip marginal on
    v5e — the full node event incl. op generation runs ~0.21M).
    Bit-exact either way. Default: OFF — the round-3 end-to-end tunnel A/B
    (two Kodak crops, qpd6=2, one host core) measured lockstep at 399 s
    with host trial rates and 433 s with device rates, while the host
    engine alone took 1.06 s: the ~160 ms/event tunnel RTT dominates both
    arms, so the production exact path is the host engine (optionally
    device-HINTED via wavefront.encode_many_exact), and device trial rates
    are an opt-in for co-located chips (HEVCE_NODE_RATES=1 or
    node_rates=True).

    pipeline: split the batch into two interleaved half-batches so one
    half's device step is dispatched while the other half's arbiters run
    (SURVEY §2.4 PP — device-ahead pipelining). Bit-exact (halves are
    independent). Default OFF (HEVCE_PIPELINE=1 enables): pipelining wins
    when per-event device compute rivals host arbitration (co-located TPU,
    large batches); over the tunneled TPU used here the per-event round
    trip dominates and lockstep batching across images already amortizes
    it, so splitting the batch doubles the RTT count and LOSES ~2x
    (measured: 32x32 B=4 qpd6=2, 10.0s sequential vs 18.8s pipelined).

    timer: optional utils.tracing.PhaseTimer accumulating the per-phase
    breakdown (host_arbiter / device_math / writeback / winner_fetch /
    finish). Setting HEVCE_TRACE=1 creates one and prints the report to
    stderr on return. With pipelining, phases of the two halves overlap in
    wall time, so the phase sums can exceed the elapsed time.
    """
    import jax

    if mesh is not None:
        node_rates = True   # the mesh path shards the full Phase B data path
        assert len(images) % mesh.devices.size == 0, \
            "batch must be a multiple of the mesh axis size"
    if node_rates is None:
        node_rates = os.environ.get("HEVCE_NODE_RATES") == "1"
    if pipeline is None:
        pipeline = os.environ.get("HEVCE_PIPELINE", "0") == "1"
    verify = os.environ.get("HEVCE_VERIFY_TRANSFERS", "0") == "1"
    trace_env = timer is None and os.environ.get("HEVCE_TRACE", "0") == "1"
    if timer is None:
        from hevce_tpu.utils.tracing import PhaseTimer
        timer = PhaseTimer()    # negligible overhead; keeps the code single-path
    images = [native._clip_dims(im) for im in images]
    shape = images[0].shape
    assert all(im.shape == shape for im in images), "batch must share dims"
    B = len(images)

    # two pipelined halves need a valid (mesh-divisible, non-empty) split
    halves = None
    if pipeline and B >= 2:
        cut = B // 2
        if mesh is not None:
            d = mesh.devices.size
            cut = (cut // d) * d
        if 0 < cut < B:
            halves = (images[:cut], images[cut:])

    lib = native._load()
    _bind(lib)
    runs = []
    ok = False
    try:
        if halves is None:
            runs = [_Run(lib, images, qpd6, node_rates, mesh, verify, timer)]
        else:
            runs = [_Run(lib, h, qpd6, node_rates, mesh, verify, timer,
                         tag=f"half{i}") for i, h in enumerate(halves)]

        # prime: every run dispatches its first event before any completes
        for r in runs:
            if r.next() != KIND_DONE:
                r.dispatch()
        # interleave: complete+resupply one run (its workers then arbitrate
        # concurrently) while the other run's device step is in flight
        while not all(r.done for r in runs):
            for r in runs:
                if r.done:
                    continue
                r.complete()
                if r.next() != KIND_DONE:
                    r.dispatch()

        with timer.phase("finish"):
            streams, rcons = [], []
            for r in runs:
                s, rc = r.collect()
                streams += s
                rcons += rc
        ok = True
        if trace_env:
            import sys
            print("lockstep phase breakdown:\n" + timer.report(), file=sys.stderr)
        return streams, rcons
    finally:
        for r in runs:
            r.destroy(ok)
