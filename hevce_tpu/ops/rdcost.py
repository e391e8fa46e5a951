"""RD cost and distortion, with the reference's int32 saturation semantics
(reference src/HEVCe.c:165-185)."""
import jax.numpy as jnp

from hevce_tpu.ops import constants as C

I32_MAX = int(C.I32_MAX)


def calc_rd_cost(qpd6: int, dist: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """weighted cost = w_dist*dist + w_bits*bits with overflow saturation."""
    w1 = int(C.RDCOST_WEIGHT_DIST[qpd6])
    w2 = int(C.RDCOST_WEIGHT_BITS[qpd6])
    dist = dist.astype(jnp.int32)
    bits = jnp.asarray(bits, jnp.int32)
    cost1 = jnp.where(I32_MAX // w1 <= dist, I32_MAX, w1 * dist)
    cost2 = jnp.where(I32_MAX // w2 <= bits, I32_MAX, w2 * bits)
    return jnp.where(I32_MAX - cost1 <= cost2, I32_MAX, cost1 + cost2)


def block_sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared error over the last two axes (src/HEVCe.c:165-174)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-1, -2))
