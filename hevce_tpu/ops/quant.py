"""Simplified RDOQ quantization + dequantization, bit-exact int32.

Reference: quantize / estimateCoeffRate / deQuantize at src/HEVCe.c:526-615.

The reference's per-coefficient 3-candidate level search and per-CG kill rule
are data-parallel; here they evaluate as a closed-form vectorized selection
over (..., sz, sz) blocks — no loops, jit/vmap friendly.
"""
import jax.numpy as jnp

from hevce_tpu.ops import constants as C
from hevce_tpu.ops.rdcost import calc_rd_cost

I32_MAX = int(C.I32_MAX)


def estimate_coeff_rate(level: jnp.ndarray) -> jnp.ndarray:
    """Vectorized estimateCoeffRate (src/HEVCe.c:526-535).

    For level >= 6 the reference's subtract-powers loop computes
    i = floor(log2(level-6+1)); rate = 92000 + ((4 + 2*i) << 15).
    """
    from jax import lax
    lvl = level.astype(jnp.int32)
    # 6-entry table as unrolled selects: a jnp.take here lowers to a serial
    # per-element kCustom gather on TPU (measured ~0.5 GB/s; it dominated
    # the wavefront front step), while 6 compares vectorize on the VPU
    small = jnp.full_like(lvl, int(C.LEVEL_RATE_TABLE[5]))
    for k in range(5):
        small = jnp.where(lvl == k, int(C.LEVEL_RATE_TABLE[k]), small)
    # i = floor(log2(lvl - 5)) for lvl >= 6, read off the f32 exponent: the
    # int->f32 conversion is exact below 2^24 (lvl <= 32767), so the biased
    # exponent IS floor(log2) — 3 ops instead of a 15-compare chain
    vp1 = jnp.maximum(lvl - 5, 1).astype(jnp.float32)
    i = (lax.bitcast_convert_type(vp1, jnp.int32) >> 23) - 127
    big = 92000 + ((4 + 2 * i) << 15)
    return jnp.where(lvl < 6, small, big)


def quantize(sz: int, qpd6: int, coef: jnp.ndarray) -> jnp.ndarray:
    """RDOQ-quantize coefficient blocks (..., sz, sz) int32 -> signed levels."""
    dist_sft = C.QUANT_DIST_SHIFT[sz]
    sft = C.QUANT_LEVEL_SHIFT[sz] + qpd6
    add = 1 << sft >> 1
    max_dlevel = I32_MAX - add
    thr = 9 << sft >> 2

    src = coef.astype(jnp.int32)
    absval = jnp.abs(src)
    dlevel = jnp.where(absval > 0x1FFFF, max_dlevel,
                       jnp.minimum((absval & 0x1FFFF) << 14, max_dlevel))
    level0 = jnp.clip((dlevel + add) >> sft, C.COEF_MIN, C.COEF_MAX)

    def cost_of(lv):
        dist1 = jnp.abs(dlevel - (lv << sft)) >> dist_sft
        dist = jnp.where(dist1 < 46340, dist1 * dist1, I32_MAX) >> 7
        return calc_rd_cost(qpd6, dist, estimate_coeff_rate(lv))

    # candidates level0, level0-1, level0-2 evaluated high->low with strict <
    # (src/HEVCe.c:571-580): ties keep the higher level.
    best_l = level0
    best_c = cost_of(level0)
    for d in (1, 2):
        lv = level0 - d
        valid = level0 >= d          # lv >= max(0, level0-2)
        cst = cost_of(jnp.maximum(lv, 0))
        take = valid & (cst < best_c)
        best_l = jnp.where(take, lv, best_l)
        best_c = jnp.where(take, cst, best_c)

    signed = jnp.where(src < 0, -best_l, best_l)

    # per-4x4-CG kill rule (src/HEVCe.c:555, :585-592)
    ncg = sz // C.CG_SZ
    dl = jnp.minimum(dlevel, thr)
    shape = dl.shape[:-2] + (ncg, C.CG_SZ, ncg, C.CG_SZ)
    cg_sum = dl.reshape(shape).sum(axis=(-3, -1))
    keep = cg_sum >= thr
    keep_full = jnp.repeat(jnp.repeat(keep, C.CG_SZ, axis=-1), C.CG_SZ, axis=-2)
    # levels are clip16-bounded: int16 halves the live (..., 35, sz, sz) bytes
    return jnp.where(keep_full, signed, 0).astype(jnp.int16)


def dequantize(sz: int, qpd6: int, levels: jnp.ndarray) -> jnp.ndarray:
    """dst = clip16(level << (Q_SHIFT_TABLE[sz] + qpd6)) (src/HEVCe.c:600-615).
    int16 out (clip16-bounded)."""
    q_sft = C.DEQUANT_SHIFT[sz] + qpd6
    return jnp.clip(levels.astype(jnp.int32) << q_sft,
                    C.COEF_MIN, C.COEF_MAX).astype(jnp.int16)
