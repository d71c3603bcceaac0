"""Sharded rendering with ``jax.shard_map`` over a 1-D device mesh.

Because all randomness is content-addressed by global ray id
(sampling/hashrng.py), the sharded render is bitwise-identical to the
single-device render — this is verified by the chip-count-invariance tests
(tests/test_parallel.py), the distributed analog of golden-image testing.

Each device runs the PRODUCTION single-chip path inside its shard: the
regenerating-wavefront megakernel (``renderer._render_band_regen`` →
``ops/pallas_bounce.py``) when the Pallas backend supports the scene, and
the portable per-bounce pipeline (``renderer._render_band``) otherwise
(CPU runs, emissive-image / nested-checker scenes).  Per-chip transient
HBM is bounded exactly like the single-chip path — a 400x400 @1000spp
render sharded 8 ways never materializes more than one band of rays per
chip.  Neither ``spp`` nor ``height`` needs to divide the device count:
shards are padded and the padded samples/rows are masked out (samples) or
sliced off (rows), the multi-chip analog of the reference's arbitrary work
decomposition (src/render.zig:55-73).
"""

from __future__ import annotations

import weakref
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..dtypes import real
from ..render.camera import camera_consts, camera_params
from ..render.renderer import Renderer, _render_band, _render_band_regen
from ..sampling.sampler import SamplerKind
from ..scene import Scene
from .mesh import AXIS


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _use_production_path(scene: Scene) -> bool:
    from ..ops.pallas_bounce import supports_bounce_kernel
    from ..ops.trace import _use_pallas_backend

    return _use_pallas_backend() and supports_bounce_kernel(scene.compiled)


# Memoized jitted shard_map closures.  Without this, every render_sharded
# call rebuilt `worker` + jax.jit(shard_map(...)), so repeated calls (e.g.
# progressive sharded renders, or the shard-overhead bench) re-traced the
# whole pipeline each time -- jit's cache is keyed on function identity and
# a fresh closure never hits it.  Keyed on the CompiledScene OBJECT via a
# WeakKeyDictionary (ids are recycled after GC) -> {config key: jitted fn},
# bounded per scene with FIFO eviction like renderer._plan_cache.  All
# values a worker closure bakes in (size/spp/depth/sampler/camera consts/
# mesh devices/shard mode/rr/clamp/chunk budget) appear in the config key.
_sharded_fn_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_SHARDED_CACHE_MAX_CONFIGS = 8


def _memo_sharded(compiled, key, build):
    per = _sharded_fn_cache.get(compiled)
    if per is None:
        per = {}
        _sharded_fn_cache[compiled] = per
    fn = per.get(key)
    if fn is None:
        if len(per) >= _SHARDED_CACHE_MAX_CONFIGS:
            per.pop(next(iter(per)))
        fn = build()
        per[key] = fn
    return fn


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
    max_rays_per_chunk: int = 1 << 21,
    rr: int = 0,
    clamp: float = 0.0,
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
    has_dof = scene.camera.has_depth_of_field
    seed_arr = jnp.uint32(seed)
    spp = samples_per_pixel

    # Per-device chunk geometry (identical on every device; static).
    chunker = Renderer(
        samples_per_pixel=spp, max_rays_per_chunk=max_rays_per_chunk,
        max_ray_bounce_depth=max_depth, sampler=sampler,
    )
    production = _use_production_path(scene)
    cam = camera_params(scene.camera, width, height)
    cam_c = camera_consts(scene.camera, width, height)
    cfg_key = (
        shard, production, width, height, spp, max_depth, sampler, has_dof,
        rr, clamp, max_rays_per_chunk, cam_c,
        tuple(int(d.id) for d in mesh.devices.flat), tuple(mesh.axis_names),
    )

    if shard == "samples":
        # Pad the sample axis: devices own ceil(spp / n_dev) sample indices
        # each; indices >= spp never render (regen: per-lane limit; band:
        # masked to zero inside _render_band).
        spp_local = _cdiv(spp, n_dev)

        if production:
            s_par, band_rows = chunker.regen_geometry(
                width, height, spp_local
            )
            n_bands = _cdiv(height, band_rows)
            h_pad = n_bands * band_rows

            def worker(compiled, seed):
                di = jax.lax.axis_index(AXIS)
                s0 = (di * spp_local).astype(jnp.int32)
                limit = jnp.minimum(jnp.int32(spp), s0 + spp_local)
                fb = jnp.zeros((h_pad, width, 3), real)
                for b in range(n_bands):
                    out = _render_band_regen(
                        compiled, seed, jnp.int32(b * band_rows), s0,
                        width=width, height=height, band_rows=band_rows,
                        s_par=s_par, spp=spp, sample_limit=limit,
                        max_depth=max_depth, sampler=sampler,
                        has_dof=has_dof, cam_consts=cam_c, rr=rr, clamp=clamp,
                    )
                    fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
                return jax.lax.psum(fb[:height], AXIS) / real(spp)

            fn = _memo_sharded(compiled, cfg_key, lambda: jax.jit(
                jax.shard_map(
                    worker, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                    check_vma=False,
                )
            ))
            return fn(compiled, seed_arr)

        spp_chunk, band_rows = chunker.chunk_geometry(
            scene, width, height, spp_local
        )
        n_bands = _cdiv(height, band_rows)
        n_chunks = _cdiv(spp_local, spp_chunk)
        h_pad = n_bands * band_rows

        def worker(compiled, cam, seed):
            di = jax.lax.axis_index(AXIS)
            s0_base = (di * spp_local).astype(jnp.int32)
            fb = jnp.zeros((h_pad, width, 3), real)
            for b in range(n_bands):
                for c in range(n_chunks):
                    out = _render_band(
                        compiled, cam, seed,
                        jnp.int32(b * band_rows),
                        s0_base + jnp.int32(c * spp_chunk),
                        width=width, height=height, band_rows=band_rows,
                        spp_chunk=spp_chunk, spp=spp, max_depth=max_depth,
                        sampler=sampler, has_dof=has_dof, rr=rr, clamp=clamp,
                    )
                    fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
            return jax.lax.psum(fb[:height], AXIS) / real(spp)

        fn = _memo_sharded(compiled, cfg_key, lambda: jax.jit(
            jax.shard_map(
                worker, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
                check_vma=False,
            )
        ))
        return fn(compiled, cam, seed_arr)

    if shard == "rows":
        # Pad the row axis: devices own ceil(height / n_dev) rows each;
        # ray_grid clamps padded rows and the result is sliced to height.
        rows_local = _cdiv(height, n_dev)

        if production:
            s_par, band_rows = chunker.regen_geometry(width, rows_local, spp)
            band_rows = min(band_rows, rows_local)
            n_bands = _cdiv(rows_local, band_rows)
            rows_pad = n_bands * band_rows

            def worker(compiled, seed):
                di = jax.lax.axis_index(AXIS)
                y0_base = (di * rows_local).astype(jnp.int32)
                fb = jnp.zeros((rows_pad, width, 3), real)
                for b in range(n_bands):
                    out = _render_band_regen(
                        compiled, seed,
                        y0_base + jnp.int32(b * band_rows), jnp.int32(0),
                        width=width, height=height, band_rows=band_rows,
                        s_par=s_par, spp=spp, sample_limit=jnp.int32(spp),
                        max_depth=max_depth, sampler=sampler,
                        has_dof=has_dof, cam_consts=cam_c, rr=rr, clamp=clamp,
                    )
                    fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
                return fb[:rows_local] / real(spp)

            fn = _memo_sharded(compiled, cfg_key, lambda: jax.jit(
                jax.shard_map(
                    worker, mesh=mesh, in_specs=(P(), P()),
                    out_specs=P(AXIS), check_vma=False,
                )
            ))
            return fn(compiled, seed_arr)[:height]

        spp_chunk, band_rows = chunker.chunk_geometry(
            scene, width, rows_local, spp
        )
        band_rows = min(band_rows, rows_local)
        n_bands = _cdiv(rows_local, band_rows)
        n_chunks = _cdiv(spp, spp_chunk)
        rows_pad = n_bands * band_rows

        def worker(compiled, cam, seed):
            di = jax.lax.axis_index(AXIS)
            y0_base = (di * rows_local).astype(jnp.int32)
            fb = jnp.zeros((rows_pad, width, 3), real)
            for b in range(n_bands):
                for c in range(n_chunks):
                    out = _render_band(
                        compiled, cam, seed,
                        y0_base + jnp.int32(b * band_rows),
                        jnp.int32(c * spp_chunk),
                        width=width, height=height, band_rows=band_rows,
                        spp_chunk=spp_chunk, spp=spp, max_depth=max_depth,
                        sampler=sampler, has_dof=has_dof, rr=rr, clamp=clamp,
                    )
                    fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
            return fb[:rows_local] / real(spp)

        fn = _memo_sharded(compiled, cfg_key, lambda: jax.jit(
            jax.shard_map(
                worker, mesh=mesh, in_specs=(P(), P(), P()),
                out_specs=P(AXIS), check_vma=False,
            )
        ))
        return fn(compiled, cam, seed_arr)[:height]

    raise ValueError(f"unknown shard mode: {shard}")
