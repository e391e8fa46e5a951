"""Bit-identity of the fused Pallas eval kernel vs the XLA op pipeline.

The fused kernel (ops/fused_eval.py) must reproduce cu_eval._pipeline +
rdcost.block_sse exactly for every production shape — on CPU it runs in
Pallas interpret mode (same kernel logic through lax), on TPU as a Mosaic
kernel; tools/verify_cross_platform.py covers the live-TPU side.
"""
import numpy as np
import pytest

from hevce_tpu.models import cu_eval
from hevce_tpu.ops import fused_eval, rdcost

# (sz, M): every (size, mode-lane) combination the wavefront front core
# issues — RMD K=12 2Nx2N, T=4 TU-split subs, the dense-35 NxN PUs — plus
# the dense-35 large sizes the lockstep device step (parallel/batch) issues
SHAPES = [(4, 35), (4, 4), (8, 4), (8, 12), (16, 4), (16, 12),
          (32, 4), (32, 12), (8, 35), (16, 35), (32, 35)]


@pytest.mark.parametrize("sz,M", SHAPES)
@pytest.mark.parametrize("qpd6", [0, 2, 4])
def test_fused_matches_xla_pipeline(sz, M, qpd6):
    import jax.numpy as jnp
    rng = np.random.default_rng(sz * 100 + M + qpd6)
    B = 5
    pred = rng.integers(0, 256, (B, M, sz, sz)).astype(np.uint8)
    # mix of natural-ish and adversarial blocks: uniform noise stresses
    # large coefficients / escape levels (the documented canary regime)
    blk = rng.integers(0, 256, (B, sz, sz)).astype(np.uint8)

    q_w, r_w = cu_eval._pipeline(sz, qpd6, jnp.asarray(pred), jnp.asarray(blk))
    sse_w = rdcost.block_sse(jnp.asarray(blk)[:, None], r_w)

    q, r, sse = fused_eval.pipeline_sse(sz, qpd6, jnp.asarray(pred),
                                        jnp.asarray(blk))
    assert np.array_equal(np.asarray(q), np.asarray(q_w))
    assert np.array_equal(np.asarray(r), np.asarray(r_w))
    assert np.array_equal(np.asarray(sse), np.asarray(sse_w))


def test_fused_pads_awkward_row_counts():
    """row counts that don't divide the packing group or tile exactly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    sz, M = 4, 3                         # N = B*M = 21 -> G=8 pad
    pred = rng.integers(0, 256, (7, M, sz, sz)).astype(np.uint8)
    blk = rng.integers(0, 256, (7, sz, sz)).astype(np.uint8)
    q_w, r_w = cu_eval._pipeline(sz, 2, jnp.asarray(pred), jnp.asarray(blk))
    q, r, sse = fused_eval.pipeline_sse(sz, 2, jnp.asarray(pred),
                                        jnp.asarray(blk))
    assert np.array_equal(np.asarray(q), np.asarray(q_w))
    assert np.array_equal(np.asarray(r), np.asarray(r_w))
