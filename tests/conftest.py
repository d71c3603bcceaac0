"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware."""

import os
import sys

# Force CPU: the ambient environment may point JAX at a TPU plugin, but the
# suite must run hermetically on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"

# Small tree-leaf span for the whole suite: pick_leaf_span's hardware
# defaults (64 for <=512 prims) unroll 64 groups x 8 sublane rows of
# primitive math per leaf visit, which makes interpret-mode kernel tests
# intractably slow to trace/execute on CPU (the round-3 row-structured
# leaf sweep multiplied traced ops ~16x at span 64).  Span 4 exercises
# DEEPER trees (more traversal steps, more leaves — better coverage of the
# walk itself) at a fraction of the per-leaf cost.  Tests that probe a
# specific span still override this themselves.
os.environ.setdefault("ZWRT_LEAF_GROUPS", "4")

# repo root on sys.path so `import __graft_entry__` works
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture()
def pallas_interpret():
    """Force the Pallas kernel path (interpret mode) for one test — the
    same kernel graph a real TPU compiles, executed on CPU."""
    from zig_weekend_raytracer_tpu.ops.trace import _use_pallas_backend

    os.environ["ZWRT_PALLAS_INTERPRET"] = "1"
    _use_pallas_backend.cache_clear()
    try:
        yield
    finally:
        del os.environ["ZWRT_PALLAS_INTERPRET"]
        _use_pallas_backend.cache_clear()
