"""Batched, mesh-sharded CU candidate evaluation.

The encoder's device work is embarrassingly parallel over images (and over
CTUs in a wavefront): one "device step" evaluates all 35 modes x {1-TU, 4-TU}
candidates for a batch of CU nodes. This module shards that batch axis over a
Mesh so the same step runs on 1..N chips; no collectives are needed in the
step itself (pure data parallelism — the natural mapping for this workload;
reference has no parallelism at all, SURVEY.md §2.4).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hevce_tpu.models import cu_eval


def make_mesh(devices=None, axis="img"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def device_step(sz: int, qpd6: int, ctx_top, ctx_left, flags, blk_orig):
    """One batched node evaluation: both TU layouts for B nodes.

    ctx_top (B, 1+2sz), ctx_left (B, 2sz), flags (B, 4), blk_orig (B, sz, sz).
    Returns (q1 (B,35,sz,sz), r1, sse1, q4 (B,35,4,h,h), r4, sse4).
    """
    q1, r1, s1 = cu_eval.eval_2nx2n(sz, qpd6, ctx_top, ctx_left, flags, blk_orig)
    q4, r4, s4 = cu_eval.eval_tusplit(sz, qpd6, ctx_top, ctx_left, flags, blk_orig)
    return q1, r1, s1, q4, r4, s4


@functools.lru_cache(maxsize=None)
def jit_device_step(sz: int, qpd6: int, mesh=None, axis="img"):
    """jit the device step, optionally sharded over the batch axis of a mesh."""
    f = functools.partial(device_step, sz, qpd6)
    if mesh is None:
        return jax.jit(f)
    sh = NamedSharding(mesh, P(axis))
    return jax.jit(f, in_shardings=(sh, sh, sh, sh), out_shardings=sh)


def random_node_batch(sz: int, batch: int, seed=0):
    """synthetic inputs for compile checks / benchmarks."""
    rng = np.random.default_rng(seed)
    ctx_top = rng.integers(0, 256, (batch, 1 + 2 * sz)).astype(np.int32)
    ctx_left = rng.integers(0, 256, (batch, 2 * sz)).astype(np.int32)
    flags = np.ones((batch, 4), bool)
    blk = rng.integers(0, 256, (batch, sz, sz)).astype(np.int32)
    return ctx_top, ctx_left, flags, blk
