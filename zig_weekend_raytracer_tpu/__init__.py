"""zig_weekend_raytracer_tpu — a TPU-native wavefront path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``j-helland/zig-weekend-raytracer`` (a multithreaded CPU path tracer in Zig
implementing "Ray Tracing in One Weekend" books 1-3 plus PBRT-4e techniques).

Design (TPU-first, not a port):
  * Scenes compile to flat SoA device arrays (sphere/quad tables, material and
    texture tables, an image atlas, a light list, a linearized BVH).
  * The recursive per-ray integrator (reference: src/render.zig:188-289)
    becomes an iterative batched wavefront loop (``lax.fori_loop`` over bounce
    depth) with masked live-ray state.
  * Tagged-union dispatch (reference: src/entity.zig:17, src/material.zig:25)
    becomes branchless masked select over type-code tables.
  * Data parallelism (reference: std.Thread.Pool over pixel blocks,
    src/render.zig:55-73) becomes sharding over a ``jax.sharding.Mesh`` with
    XLA collectives (see ``parallel/``).

Typical usage:

    import zig_weekend_raytracer_tpu as zwrt
    scene = zwrt.models.load_scene("cornell_box")
    img = zwrt.render.Renderer(samples_per_pixel=128).render(scene, 400, 400)
    zwrt.io.write_ppm("out.ppm", img)
"""

import os as _os

# ZWRT_PLATFORM=cpu (or tpu/gpu): force the JAX backend.  Needed because
# some hosts install a sitecustomize that imports jax and registers a TPU
# plugin before ANY user code runs — by then JAX_PLATFORMS from the shell
# has been consumed, and only a jax.config update (applied before first
# backend use) still switches the platform.
if _os.environ.get("ZWRT_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ZWRT_PLATFORM"])

# ZWRT_CPU_DEVICES=N: virtual CPU device count (for --shard smoke runs
# without hardware; the XLA_FLAGS spelling is a no-op on jax 0.9).
if _os.environ.get("ZWRT_CPU_DEVICES"):
    import jax as _jax

    _jax.config.update(
        "jax_num_cpu_devices", int(_os.environ["ZWRT_CPU_DEVICES"])
    )

# Persistent XLA compilation cache: TPU compiles of the fused render program
# take tens of seconds (they run on the far side of the device tunnel), so
# cache them across processes.  Opt out with ZWRT_NO_COMPILE_CACHE=1.
if not _os.environ.get("ZWRT_NO_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/zwrt_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from . import dtypes
from . import math
from . import sampling
from . import geometry
from . import textures
from . import materials
from . import scene
from . import models
from . import render
from . import ops
from . import parallel
from . import io
from . import utils

__version__ = "0.1.0"
