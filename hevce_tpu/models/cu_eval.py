"""Dense CU candidate evaluation — the device-side "model" of the encoder.

For one CU node the reference runs predict -> residual -> DCT -> RDOQ ->
dequant -> iDCT -> reconstruct -> SSE once per (mode, TU layout) candidate
(reference src/HEVCe.c:1422-1484). Here each node evaluates ALL 35 modes as a
single dense tensor program over a leading mode axis (and arbitrary batch axes
in front), so the transforms become batched MXU matmuls.

Kernel interface (shared by the Python arbiter, the C++ host engine, and the
batched production pipeline):

  ctx_top:  (..., 1 + 2*sz) int32 — reconstructed row above the CU,
            positions x-1 .. x+2sz-1 (clamped reads; masked by flags)
  ctx_left: (..., 2*sz) int32 — reconstructed column left of the CU
  flags:    (..., 4) bool — bll / blb / baa / bar existence
  blk_orig: (..., sz, sz) int32 — original pixels

  eval_2nx2n    -> (quant (...,35,sz,sz), recon (...,35,sz,sz), sse (...,35))
  eval_tusplit  -> (quant (...,35,4,h,h), recon (...,35,sz,sz), sse (...,35))
                   with h = sz//2 and per-mode sequential sub-TU chaining
                   (src/HEVCe.c:1455-1468: each mode's sub-TU borders come from
                   that mode's own reconstruction of earlier sub-TUs).
"""
import functools

import jax
import jax.numpy as jnp

from hevce_tpu.ops import constants as C
from hevce_tpu.ops import intra, quant, rdcost, xform


def _pipeline(sz, qpd6, pred, blk_orig):
    """residual -> fwd transform -> RDOQ -> dequant -> inv transform -> recon.

    Dtype discipline (the dense eval is HBM-bandwidth-bound on TPU): pred and
    recon are uint8 pixels, residual/levels/dequant/inv-transform are int16
    (all clip16-bounded), only the transform accumulators and the RDOQ cost
    arithmetic run in int32 — bit-identical to the all-int32 form."""
    resid = (blk_orig[..., None, :, :].astype(jnp.int16)
             - pred.astype(jnp.int16))
    coef = xform.forward_transform(sz, resid)
    q = quant.quantize(sz, qpd6, coef)
    dq = quant.dequantize(sz, qpd6, q)
    r = xform.inverse_transform(sz, dq)
    recon = jnp.clip(r.astype(jnp.int32) + pred, 0, 255).astype(jnp.uint8)
    return q, recon


def pipeline_sse(sz: int, qpd6: int, pred, blk_orig):
    """_pipeline + per-candidate SSE — as ONE fused Pallas kernel on TPU
    backends (ops/fused_eval: intermediates stay in VMEM instead of paying
    a fusion-boundary HBM round trip per stage), as the XLA ops elsewhere.
    The two paths are bit-identical (tests/test_fused_eval.py)."""
    from hevce_tpu.ops import fused_eval
    if fused_eval.use_for(sz, pred.shape[-3]):
        return fused_eval.pipeline_sse(
            sz, qpd6, pred.astype(jnp.uint8), blk_orig.astype(jnp.uint8))
    q, recon = _pipeline(sz, qpd6, pred, blk_orig)
    sse = rdcost.block_sse(blk_orig[..., None, :, :], recon)
    return q, recon, sse


def eval_2nx2n(sz: int, qpd6: int, ctx_top, ctx_left, flags, blk_orig):
    """all-35-mode single-TU evaluation (reference step 2, src/HEVCe.c:1422-1448)."""
    S = intra.build_borders(
        sz, ctx_top[..., 0], ctx_left, ctx_top[..., 1:],
        flags[..., 0], flags[..., 1], flags[..., 2], flags[..., 3])
    pred = intra.predict_all_modes(sz, S)
    return pipeline_sse(sz, qpd6, pred, blk_orig)


def _select_pred(sz: int, S, sel_oh):
    """Per-lane selected-mode prediction: S (..., T, n) border vectors,
    sel_oh (..., T, 35) bool with exactly one True per lane. Predict all 35
    modes from each lane's own borders, then one-hot-select the lane's mode
    (uint8 masked sum with a single nonzero term — exact, gather-free).
    Bit-identical to intra.predict_per_lane when sel_oh is the identity."""
    p35 = intra.predict_all_modes(sz, S)              # (..., T, 35, sz, sz)
    w = sel_oh.astype(jnp.uint8)[..., None, None]
    return (p35 * w).sum(-3, dtype=jnp.uint8)


def eval_tusplit(sz: int, qpd6: int, ctx_top, ctx_left, flags, blk_orig,
                 sel_oh=None):
    """four-TU evaluation over a mode-lane axis (reference step 3,
    src/HEVCe.c:1455-1484).

    Sub-TU isub order is z-order; each mode lane chains through its own
    reconstruction canvas. Sub-block border existence follows the reference
    tables (src/HEVCe.c:1376-1379).

    sel_oh=None: the lane axis is all 35 modes (lane m predicts with mode m).
    sel_oh (..., T, 35) bool: T preselected lanes (RMD fast mode); lane t
    predicts with its one-hot mode, via _select_pred.
    """
    h = sz // 2
    M = 35 if sel_oh is None else sel_oh.shape[-2]
    bshape = blk_orig.shape[:-2]
    bll, blb, baa, bar = (flags[..., i] for i in range(4))
    true_ = jnp.ones_like(bll)
    false_ = jnp.zeros_like(bll)
    sub_flags = [
        (bll, bll, baa, baa),
        (true_, false_, baa, bar),
        (bll, blb, true_, true_),
        (true_, false_, true_, false_),
    ]
    offs = [(0, 0), (0, h), (h, 0), (h, h)]

    canvas = jnp.zeros(bshape + (M, sz, sz), jnp.uint8)
    quants = []

    def bc(x):  # broadcast a shared border piece over the mode-lane axis
        return jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (M,) + x.shape[-1:])

    for isub, (oy, ox) in enumerate(offs):
        if isub == 0:
            corner = ctx_top[..., 0]
            left2 = ctx_left[..., 0:2 * h]
            top2 = ctx_top[..., 1:1 + 2 * h]
            corner = jnp.broadcast_to(corner[..., None], bshape + (M,))
            left2, top2 = bc(left2), bc(top2)
        elif isub == 1:
            corner = jnp.broadcast_to(ctx_top[..., h][..., None], bshape + (M,))
            # left column: canvas col h-1 rows 0..2h-1 (rows >= h masked, blb=0)
            left2 = canvas[..., :, 0:2 * h, h - 1]
            top2 = bc(ctx_top[..., 1 + h:1 + 3 * h])
        elif isub == 2:
            corner = jnp.broadcast_to(ctx_left[..., h - 1][..., None], bshape + (M,))
            left2 = bc(ctx_left[..., h:3 * h])
            top2 = canvas[..., :, h - 1, 0:2 * h]
        else:
            corner = canvas[..., :, h - 1, h - 1]
            # rows/cols beyond the canvas are masked (blb=bar=0); pad by edge
            lo = canvas[..., :, h:2 * h, h - 1]
            left2 = jnp.concatenate([lo, lo], axis=-1)
            tp = canvas[..., :, h - 1, h:2 * h]
            top2 = jnp.concatenate([tp, tp], axis=-1)

        fl = [jnp.broadcast_to(f[..., None], bshape + (M,)) for f in sub_flags[isub]]
        S = intra.build_borders(h, corner, left2, top2, *fl)
        pred = (intra.predict_per_lane(h, S) if sel_oh is None
                else _select_pred(h, S, sel_oh))

        sub_orig = blk_orig[..., oy:oy + h, ox:ox + h]
        q, recon, _ = pipeline_sse(h, qpd6, pred, sub_orig)
        quants.append(q)
        canvas = canvas.at[..., :, oy:oy + h, ox:ox + h].set(recon)

    sse = rdcost.block_sse(blk_orig[..., None, :, :], canvas)
    return jnp.stack(quants, axis=-3), canvas, sse


@functools.lru_cache(maxsize=None)
def jit_eval_2nx2n(sz: int, qpd6: int):
    return jax.jit(functools.partial(eval_2nx2n, sz, qpd6))


@functools.lru_cache(maxsize=None)
def jit_eval_tusplit(sz: int, qpd6: int):
    return jax.jit(functools.partial(eval_tusplit, sz, qpd6))
