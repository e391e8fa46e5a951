"""Round-3 divergence localization, v2. [RESOLVED — kept as history]

RESOLUTION (late round 3): root cause was a TPU-backend while-loop hazard —
a lax.scan body that both uses and increments a carried scalar counter
reads the clobbered (incremented) value in part of its math. Fixed by
feeding the front index d (and the quadrant index qi) from scan xs;
regression check: tools/verify_cross_platform.py (CPU/TPU decision records
now bit-identical, including full Kodak grids). Details: ROADMAP.md.

KEY REALIZATION: earlier probes' "direct" calls closed over CONSTANT
inputs, so XLA constant-folded them at compile time with host semantics —
they never exercised TPU hardware. This probe feeds everything as jit
ARGUMENTS so every variant actually executes on the device.

Usage: python probe5.py cpu|tpu   (run cpu first; tpu run diffs vs cpu)
"""
import sys
import numpy as np
plat = sys.argv[1]
if plat == "cpu":
    import jax; jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax
from hevce_tpu.models import wavefront as wf
from hevce_tpu.utils.imageio import read_pgm

k = read_pgm('/root/reference/testimage/01.pgm')
core = wf._make_front_core(2, 1)

W0_np = np.zeros((1, 1, 3, 32, 32), np.uint8)
P0_np = np.zeros((1, 1, 8), np.int32)
O_np = np.stack([k[None, None, :32, :32], k[None, None, :32, 32:64]], 0)

res = {}

# --- microtest 1: s32 multiply at large magnitude (rd_cost's w1*dist) ---
rng = np.random.default_rng(0)
xs = np.concatenate([
    rng.integers(0, 195225785, 4096, dtype=np.int32),   # < I32_MAX/11
    np.arange(195225785 - 2048, 195225785, dtype=np.int32)]).astype(np.int32)
mul11 = jax.jit(lambda v: v * jnp.int32(11))
res["mul11"] = np.asarray(mul11(jnp.asarray(xs)))
res["mul11_exp"] = (xs.astype(np.int64) * 11).astype(np.int32)

# --- microtest 2: argmin over int32 with near-ties ---
c = rng.integers(0, 2**31 - 1, (512, 70), dtype=np.int32)
c[:, 33] = c.min(axis=1) - 1   # forced unique winner
am = jax.jit(lambda v: jnp.argmin(v, axis=1).astype(jnp.int32))
res["argmin"] = np.asarray(am(jnp.asarray(c)))
res["argmin_exp"] = c.argmin(axis=1).astype(np.int32)

# --- microtest 3: the actual rd_cost op, argument-fed ---
from hevce_tpu.ops import rdcost
dist = rng.integers(0, 2**27, 8192).astype(np.int32)
bits = rng.integers(0, 2**20, 8192).astype(np.int32)
rc = jax.jit(lambda d, b: rdcost.calc_rd_cost(2, d, b))
res["rdcost"] = np.asarray(rc(jnp.asarray(dist), jnp.asarray(bits)))

# --- the core, argument-fed, NO scan (real hardware execution) ---
@jax.jit
def direct_arg(W, P, o, d):
    S, lay, pm, pm4, qc, pme = core(W, P, o, d, jnp.int32(2))
    return (S.astype(jnp.uint8), lay.astype(jnp.int8),
            pm.astype(jnp.int8), pm4.astype(jnp.int8))

out = direct_arg(jnp.asarray(W0_np), jnp.asarray(P0_np),
                 jnp.asarray(O_np[0]), jnp.int32(0))
for i, v in enumerate(out):
    res[f"directarg_{i}"] = np.asarray(v)
print("ran direct_arg", flush=True)

# --- the production scan, argument-fed ---
@jax.jit
def scan_concat(W0, P0, O):
    def body(carry, o):
        W, PME, d = carry
        S, lay, pm, pm4, qc, pme = core(W, PME, o, d, jnp.int32(2))
        W = jnp.concatenate([W[:, :, 1:], S.astype(jnp.uint8)[:, :, None]], 2)
        return (W, pme, d + 1), (S.astype(jnp.uint8), lay.astype(jnp.int8),
                                 pm.astype(jnp.int8), pm4.astype(jnp.int8))
    _, ys = lax.scan(body, (W0, P0, jnp.int32(0)), O)
    return ys

ys = scan_concat(jnp.asarray(W0_np), jnp.asarray(P0_np), jnp.asarray(O_np))
for i, v in enumerate(ys):
    res[f"scan_{i}"] = np.asarray(v)
print("ran scan_concat", flush=True)

np.savez(f"/tmp/probe5_{plat}.npz", **res)
print("saved", plat, flush=True)

# self-checks (exactness vs numpy oracles)
print("mul11 exact:", np.array_equal(res["mul11"], res["mul11_exp"]))
print("argmin exact:", np.array_equal(res["argmin"], res["argmin_exp"]))
# scan step0 vs direct-arg (same inputs)
ok = all(np.array_equal(res[f"directarg_{i}"], res[f"scan_{i}"][0])
         for i in range(4))
print("scan[0] == direct_arg:", ok)

if plat == "tpu":
    try:
        a = np.load("/tmp/probe5_cpu.npz")
        for key in sorted(res):
            if key.endswith("_exp"):
                continue
            same = np.array_equal(a[key], res[key])
            print(f"cross {key:14s} {'OK' if same else 'DIFF ' + str((a[key] != res[key]).sum())}")
    except FileNotFoundError:
        print("no cpu npz")
