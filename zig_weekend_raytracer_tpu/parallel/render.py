"""Sharded rendering with ``jax.shard_map`` over a 1-D device mesh.

Because all randomness is content-addressed by global ray id
(sampling/hashrng.py), the sharded render is bitwise-identical to the
single-device render — this is verified by the chip-count-invariance tests
(tests/test_parallel.py), the distributed analog of golden-image testing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..dtypes import real
from ..render.camera import camera_params, generate_rays
from ..render.integrator import trace_paths
from ..render.renderer import ray_grid
from ..sampling.sampler import SamplerKind
from ..scene import Scene
from .mesh import AXIS


def _render_wavefront(
    compiled, cam, seed, y0, width, height, rows, spp, sample0,
    max_depth, sampler, has_dof, total_spp,
):
    """One full wavefront: ``rows`` image rows x ``spp`` samples; returns the
    radiance *sum* over those samples, (rows, width, 3)."""
    px, py, sidx, ray_id = ray_grid(width, height, y0, rows, sample0, spp)
    origin, direction, time = generate_rays(
        cam, has_dof, sampler, seed, ray_id, px, py, sidx,
        total_spp, width, height,
    )
    radiance = trace_paths(
        compiled, origin, direction, time, seed, ray_id, max_depth
    )
    return radiance.to_array().reshape(spp, rows, width, 3).sum(axis=0)


def render_sharded(
    scene: Scene,
    width: int,
    height: int,
    samples_per_pixel: int,
    max_depth: int = 20,
    sampler: SamplerKind = SamplerKind.SOBOL,
    mesh: Optional[Mesh] = None,
    shard: str = "samples",
    seed: int = 0,
):
    """Render across a device mesh.  Returns (H, W, 3) f32 averaged samples.

    ``shard='samples'``: every chip renders all pixels with a disjoint sample
    slice; framebuffers are averaged with one ``psum`` over ICI.

    ``shard='rows'``: chips render disjoint row bands (zero collectives; the
    direct analog of the reference's pixel-block partitioning,
    src/render.zig:60).
    """
    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh()
    n_dev = mesh.devices.size
    compiled = scene.compiled
    cam = camera_params(scene.camera, width, height)
    has_dof = scene.camera.has_depth_of_field
    seed_arr = jnp.uint32(seed)

    if shard == "samples":
        if samples_per_pixel % n_dev:
            raise ValueError(
                f"spp={samples_per_pixel} must divide over {n_dev} devices"
            )
        spp_local = samples_per_pixel // n_dev

        def worker(compiled, cam, seed):
            di = jax.lax.axis_index(AXIS)
            fb = _render_wavefront(
                compiled, cam, seed,
                y0=jnp.int32(0), width=width, height=height, rows=height,
                spp=spp_local, sample0=(di * spp_local).astype(jnp.int32),
                max_depth=max_depth, sampler=sampler, has_dof=has_dof,
                total_spp=samples_per_pixel,
            )
            return jax.lax.psum(fb, AXIS) / real(samples_per_pixel)

        fn = jax.jit(
            jax.shard_map(
                worker, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
                check_vma=False,
            )
        )
        return fn(compiled, cam, seed_arr)

    if shard == "rows":
        if height % n_dev:
            raise ValueError(f"height={height} must divide over {n_dev} devices")
        rows_local = height // n_dev

        def worker(compiled, cam, seed):
            di = jax.lax.axis_index(AXIS)
            fb = _render_wavefront(
                compiled, cam, seed,
                y0=(di * rows_local).astype(jnp.int32),
                width=width, height=height, rows=rows_local,
                spp=samples_per_pixel, sample0=jnp.int32(0),
                max_depth=max_depth, sampler=sampler, has_dof=has_dof,
                total_spp=samples_per_pixel,
            )
            return fb / real(samples_per_pixel)

        fn = jax.jit(
            jax.shard_map(
                worker, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(AXIS),
                check_vma=False,
            )
        )
        return fn(compiled, cam, seed_arr)

    raise ValueError(f"unknown shard mode: {shard}")
