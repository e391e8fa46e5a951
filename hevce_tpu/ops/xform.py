"""HEVC core transforms (DST4 / DCT8 / DCT16 / DCT32), forward and inverse.

Bit-exact int32 semantics of the reference separable transform
(reference src/HEVCe.c:469-516):

  forward:  tmp = (M  @ x   + 2^(a-1)) >> a          a = log2(sz) - 1
            y   = (tmp @ M^T + 2^(b-1)) >> b         b = a + 7
  inverse:  tmp = clip16((M^T @ x   + 2^6 ) >> 7)
            y   = clip16((tmp @ M   + 2^11) >> 12)

TPU mapping: int32 matmuls do not hit the MXU, and f32 matmuls on TPU are
bf16-rounded by default, so each exact product is decomposed into 2-3 native
int8 x int8 -> int32 MXU matmuls via a base-128 digit split of the wide
operand (transform matrix entries are <= 90, already int8). Every partial
product fits int32 exactly, so results are bit-exact while staying on the MXU
(int8 throughput on v5e exceeds bf16).
"""
import functools

import jax.numpy as jnp
import numpy as np

from hevce_tpu.ops import constants as C


def _rshift_round(x: jnp.ndarray, sft: int) -> jnp.ndarray:
    # matches C `(x + (1<<sft>>1)) >> sft` with arithmetic shift
    return (x + (1 << sft >> 1)) >> sft


def _clip16(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, C.COEF_MIN, C.COEF_MAX)


def exact_matmul(a: jnp.ndarray, m_i8: jnp.ndarray, bits: int) -> jnp.ndarray:
    """a @ m exactly on the MXU, for |a| < 2^bits (bits <= 21), |m| <= 127.

    Splits a into base-128 digits d_k (low digits unsigned in [0,127], top
    digit signed) so each int8 matmul partial sum stays within int32:
    127 * 127 * 32 * 128^2 < 2^31 is NOT needed — digits are recombined with
    shifts after the int32 matmuls; each partial |d @ m| <= 127*127*32 < 2^19.
    """
    ndig = max(2, -(-(bits - 7) // 7) + 1)  # digits so top digit fits int8
    out = None
    r = a
    for k in range(ndig):
        if k < ndig - 1:
            d = (r & 127).astype(jnp.int8)
            r = r >> 7
        else:
            d = r.astype(jnp.int8)
        p = jnp.matmul(d, m_i8, preferred_element_type=jnp.int32)
        out = p if out is None else out + (p << (7 * k))
    return out


@functools.lru_cache(maxsize=None)
def _mats(sz: int):
    # plain numpy so the cache never holds jit tracers; jnp treats these as constants
    m = C.TRANSFORM_MAT[sz]
    return (m.astype(np.int8), np.ascontiguousarray(m.T).astype(np.int8))


def forward_transform(sz: int, residual: jnp.ndarray) -> jnp.ndarray:
    """Forward DST/DCT of residual blocks (..., sz, sz) int32 (|r| <= 510)."""
    m_i8, mt_i8 = _mats(sz)
    a = C.FWD_SHIFT_A[sz]
    b = a + 7
    # stage 1: tmp = round(M @ x >> a).  M @ x == (x^T @ M^T)^T
    tmp = exact_matmul(jnp.swapaxes(residual, -1, -2), mt_i8, bits=10)
    tmp = jnp.swapaxes(tmp, -1, -2)
    tmp = _rshift_round(tmp, a)
    # stage 2: y = round(tmp @ M^T >> b); |tmp| < 2^18
    out = exact_matmul(tmp, mt_i8, bits=18)
    return _rshift_round(out, b)


def inverse_transform(sz: int, coef: jnp.ndarray) -> jnp.ndarray:
    """Inverse DST/DCT of coefficient blocks (..., sz, sz), |c| <= 32767 (any
    int dtype holding clip16 range; int16 keeps the live tensors half-size).
    Returns int16 (both stages are clip16-bounded)."""
    m_i8, mt_i8 = _mats(sz)
    # stage 1: tmp = clip16(round(M^T @ x >> 7)); M^T @ x = (x^T @ M)^T
    tmp = exact_matmul(jnp.swapaxes(coef, -1, -2), m_i8, bits=16)
    tmp = jnp.swapaxes(tmp, -1, -2)
    tmp = _clip16(_rshift_round(tmp, 7)).astype(jnp.int16)
    # stage 2: y = clip16(round(tmp @ M >> 12))
    out = exact_matmul(tmp, m_i8, bits=16)
    return _clip16(_rshift_round(out, 12)).astype(jnp.int16)
