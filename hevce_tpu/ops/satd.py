"""SATD — sum of absolute Walsh-Hadamard-transformed differences.

Used by the fast mode's RMD candidate preselection (models/wavefront.py):
ranking the 35 intra predictions by SATD of their residual is the standard
HM/x265 rough-mode-decision metric (it sees directional structure a plain
SAD misses), and here it must also be DETERMINISTIC and cross-platform
bit-identical — the fast mode's CPU-vs-TPU decision identity is a tested
invariant (tools/verify_cross_platform.py). So the transform runs on the
exact int8-digit-split MXU matmul machinery (ops/xform.exact_matmul), not
float: Hadamard entries are +-1, |residual| <= 255, and every partial sum
fits int32 exactly.

Bounds: |stage1| <= 255 * sz <= 8160 (sz <= 32), |stage2| <= 255 * sz^2
<= 261120, and the absolute-value sum over sz^2 terms <= 2.7e8 < 2^31.

The value is unnormalized (no >> log2(sz)); preselection only compares
SATDs of the SAME block size, so the scale cancels.
"""
import functools

import jax.numpy as jnp
import numpy as np

from hevce_tpu.ops import xform


@functools.lru_cache(maxsize=None)
def _hadamard(sz: int):
    """Sylvester-construction Walsh-Hadamard matrix (sz power of two),
    entries +-1, symmetric. int8 for the MXU matmuls."""
    h = np.array([[1]], np.int8)
    while h.shape[0] < sz:
        h = np.block([[h, h], [h, -h]]).astype(np.int8)
    return h


def block_satd(sz: int, resid: jnp.ndarray) -> jnp.ndarray:
    """(..., sz, sz) integer residual (|r| <= 255) -> (...,) int32 SATD.

    satd = sum |H @ r @ H| with H the order-sz Hadamard matrix (H is
    symmetric, so H @ r = (r^T @ H)^T and no separate transpose constant is
    needed)."""
    h = _hadamard(sz)
    t = xform.exact_matmul(jnp.swapaxes(resid, -1, -2), h, bits=9)
    t = jnp.swapaxes(t, -1, -2)
    out = xform.exact_matmul(t, h, bits=14)
    return jnp.abs(out).sum((-1, -2))
