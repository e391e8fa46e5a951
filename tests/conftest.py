"""Test configuration: force CPU JAX with 8 virtual devices so sharding tests
run without TPU hardware. Must run before jax is imported anywhere."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# a stray HEVCE_RMD would silently change every fast-mode encode under test
# (golden comparisons would diagnose as mysterious decision diffs) — pin the
# suite to the in-repo defaults; tests that want RMD pass rmd= explicitly
os.environ.pop("HEVCE_RMD", None)
os.environ.pop("HEVCE_CTX_BIT", None)   # rate-model knobs: same reasoning
os.environ.pop("HEVCE_SIG_ZERO", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")  # env alone is overridden by the
# axon plugin in this environment; force the 8-virtual-device CPU backend.

# persistent compile cache: the suite re-jits the same step programs every
# run; caching them cuts repeat suite time substantially
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jaxcache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import gc
import pathlib

import numpy as np
import pytest

DATA = pathlib.Path(__file__).parent / "data"


def _nmaps():
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:          # non-Linux: no map-count limit to guard
        return 0


@pytest.fixture(autouse=True)
def _xla_map_guard():
    """Every live XLA:CPU executable holds thousands of mmap regions; a full
    suite run accumulates past vm.max_map_count (65530) at ~60 tests, and the
    NEXT fresh compile segfaults inside backend_compile_and_load when mmap
    fails (root-caused round 4: maps=64619 sampled right before the rc=139).
    Dropping the in-process executable caches releases the maps (measured
    6035 -> 493); the persistent .jaxcache keeps re-jits cheap."""
    if _nmaps() > 35_000:
        import jax

        jax.clear_caches()
        gc.collect()
    yield


@pytest.fixture(scope="session")
def golden():
    def load(name):
        return np.load(DATA / f"golden_{name}.npz")
    return load
