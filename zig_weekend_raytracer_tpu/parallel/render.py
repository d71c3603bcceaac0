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

import os
import weakref
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..dtypes import real
from ..render.camera import camera_consts, camera_params
from ..render.renderer import (
    Renderer,
    _render_band,
    _render_band_balanced,
    _render_band_regen,
    pick_tile,
    tile_order_lane_index,
)
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


# Cost-sorted tile plans for the sharded path, mirroring the single-chip
# Renderer._render_band_sorted_driver (renderer.py): the FIRST sharded
# render of a config runs the plain kernel with the per-lane work counter
# as a free side-output (psum'd across devices — the total per-pixel cost
# is exactly the right signal for any device's sample/row slice); later
# renders feed cost-sorted (px, py) plans to the balanced kernel so each
# ray tile holds similar-cost lanes.  Without this, render_sharded left
# the single-chip sorter's win on the table: the round-4 shard-overhead
# measurement (tpu_runs/r4/17) read as "27% shard_map overhead" when the
# plain direct path measured 0.994 s vs sharded 0.936 s — shard_map
# plumbing itself costs nothing; the whole gap was this missing plan.
_sharded_plan_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _memo_plan_entry(compiled, key):
    per = _sharded_plan_cache.get(compiled)
    if per is None:
        per = {}
        _sharded_plan_cache[compiled] = per
    entry = per.get(key)
    if entry is None:
        while len(per) >= _SHARDED_CACHE_MAX_CONFIGS:
            per.pop(next(iter(per)))
        entry = {}
        per[key] = entry
    return entry


def _sorted_plan(work_lane, width, band_rows, rows_eff, band_y0, n_items):
    """(px, py, live) for one band: pixels sorted by measured cost
    (descending, stable), BLK-padded to ``n_items``; ``live`` marks real
    items (padding gets live=0 -> the worker gives them an empty sample
    range).  Same construction as the single-chip sorted driver; the
    per-device sample range is NOT baked here — workers derive (s0, s1)
    from axis_index at trace time, so one plan serves every device."""
    lane_idx = tile_order_lane_index(
        width, band_rows, pick_tile(width, band_rows)
    )
    w = np.asarray(work_lane)
    cost = w[lane_idx.reshape(-1)].reshape(band_rows, width)[
        :max(rows_eff, 0)
    ].reshape(-1)
    ys, xs = np.divmod(np.arange(cost.size), width)
    order = np.argsort(-cost, kind="stable")
    px = xs[order]
    py = ys[order] + band_y0
    pad = n_items - cost.size
    live = np.ones(cost.size, np.int64)
    if pad:
        px = np.concatenate([px, np.zeros(pad, np.int64)])
        py = np.concatenate([py, np.full(pad, band_y0, np.int64)])
        live = np.concatenate([live, np.zeros(pad, np.int64)])
    return tuple(
        jnp.asarray(a.astype(np.int32)) for a in (px, py, live)
    )


def _plan_items(rows: int, width: int, blk: int) -> int:
    return -(-(rows * width) // blk) * blk


def _sortable(compiled, s_par) -> bool:
    # Same gate as render_device: cost-sorting needs s_par == 1 (one lane
    # owns a pixel's whole sample range) and no group trees (traversal
    # needs spatially tight tile frusta, which sorting destroys).
    return (
        s_par == 1
        and not (compiled.has_sph_tree or compiled.has_quad_tree)
        and not os.environ.get("ZWRT_NO_SORT")
    )


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
    regen_min_wave: Optional[int] = None,
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
        **({"regen_min_wave": regen_min_wave}
           if regen_min_wave is not None else {}),
    )
    production = _use_production_path(scene)
    cam = camera_params(scene.camera, width, height)
    cam_c = camera_consts(scene.camera, width, height)
    cfg_key = (
        shard, production, width, height, spp, max_depth, sampler, has_dof,
        rr, clamp, max_rays_per_chunk, regen_min_wave, cam_c,
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
            sortable = _sortable(compiled, s_par)
            plan_entry = (
                _memo_plan_entry(compiled, cfg_key + (seed,))
                if sortable else None
            )

            if sortable and "plans" in plan_entry:
                # Steady state: cost-sorted plans through the balanced
                # kernel; per-device sample range derived from axis_index.
                plans = plan_entry["plans"]

                def worker_sorted(compiled, seed, *plan_flat):
                    di = jax.lax.axis_index(AXIS)
                    s0 = (di * spp_local).astype(jnp.int32)
                    limit = jnp.minimum(jnp.int32(spp), s0 + spp_local)
                    fb = jnp.zeros((h_pad, width, 3), real)
                    for b in range(n_bands):
                        pxd, pyd, lived = plan_flat[3 * b : 3 * b + 3]
                        out = _render_band_balanced(
                            compiled, seed, jnp.int32(b * band_rows),
                            pxd, pyd,
                            jnp.where(lived > 0, s0, 0),
                            jnp.where(lived > 0, limit, 0),
                            width=width, height=height, band_rows=band_rows,
                            spp=spp, max_depth=max_depth, sampler=sampler,
                            has_dof=has_dof, cam_consts=cam_c,
                            rr=rr, clamp=clamp,
                        )
                        fb = fb.at[b * band_rows : (b + 1) * band_rows].add(
                            out
                        )
                    return jax.lax.psum(fb[:height], AXIS) / real(spp)

                flat = tuple(a for p in plans for a in p)
                fn = _memo_sharded(
                    compiled, cfg_key + ("sorted",), lambda: jax.jit(
                        jax.shard_map(
                            worker_sorted, mesh=mesh,
                            in_specs=(P(), P()) + (P(),) * len(flat),
                            out_specs=P(), check_vma=False,
                        )
                    )
                )
                return fn(compiled, seed_arr, *flat)

            def worker(compiled, seed):
                di = jax.lax.axis_index(AXIS)
                s0 = (di * spp_local).astype(jnp.int32)
                limit = jnp.minimum(jnp.int32(spp), s0 + spp_local)
                fb = jnp.zeros((h_pad, width, 3), real)
                works = []
                for b in range(n_bands):
                    out = _render_band_regen(
                        compiled, seed, jnp.int32(b * band_rows), s0,
                        width=width, height=height, band_rows=band_rows,
                        s_par=s_par, spp=spp, sample_limit=limit,
                        max_depth=max_depth, sampler=sampler,
                        has_dof=has_dof, cam_consts=cam_c, rr=rr, clamp=clamp,
                        want_work=sortable,
                    )
                    if sortable:
                        out, wk = out
                        works.append(wk)
                    fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
                fbp = jax.lax.psum(fb[:height], AXIS) / real(spp)
                if sortable:
                    return fbp, jax.lax.psum(jnp.stack(works), AXIS)
                return fbp

            fn = _memo_sharded(
                compiled, cfg_key + ("work" if sortable else "plain",),
                lambda: jax.jit(
                    jax.shard_map(
                        worker, mesh=mesh, in_specs=(P(), P()),
                        out_specs=(P(), P()) if sortable else P(),
                        check_vma=False,
                    )
                )
            )
            if not sortable:
                return fn(compiled, seed_arr)
            fb, works = fn(compiled, seed_arr)
            works = np.asarray(works)
            plan_entry["plans"] = [
                _sorted_plan(
                    works[b], width, band_rows,
                    min(band_rows, height - b * band_rows),
                    b * band_rows,
                    _plan_items(
                        min(band_rows, height - b * band_rows), width,
                        compiled.rows * 128,
                    ),
                )
                for b in range(n_bands)
            ]
            return fb

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
            sortable = _sortable(compiled, s_par)
            plan_entry = (
                _memo_plan_entry(compiled, cfg_key + (seed,))
                if sortable else None
            )

            if sortable and "plans" in plan_entry:
                # Steady state: per-(device, band) cost-sorted plans.  Row
                # shards see different pixels, so plans are stacked along a
                # leading device axis and sharded in with P(AXIS); every
                # device's slice has the same (full-band) item count.
                plans = plan_entry["plans"]  # [band] -> (px, py, live),
                #                              each (n_dev, n_items)

                def worker_sorted(compiled, seed, *plan_flat):
                    di = jax.lax.axis_index(AXIS)
                    y0_base = (di * rows_local).astype(jnp.int32)
                    fb = jnp.zeros((rows_pad, width, 3), real)
                    for b in range(n_bands):
                        pxd, pyd, lived = (
                            a[0] for a in plan_flat[3 * b : 3 * b + 3]
                        )
                        out = _render_band_balanced(
                            compiled, seed,
                            y0_base + jnp.int32(b * band_rows),
                            pxd, pyd,
                            jnp.zeros_like(lived),
                            jnp.where(lived > 0, jnp.int32(spp), 0),
                            width=width, height=height, band_rows=band_rows,
                            spp=spp, max_depth=max_depth, sampler=sampler,
                            has_dof=has_dof, cam_consts=cam_c,
                            rr=rr, clamp=clamp,
                        )
                        fb = fb.at[b * band_rows : (b + 1) * band_rows].add(
                            out
                        )
                    return fb[:rows_local] / real(spp)

                flat = tuple(a for p in plans for a in p)
                fn = _memo_sharded(
                    compiled, cfg_key + ("sorted",), lambda: jax.jit(
                        jax.shard_map(
                            worker_sorted, mesh=mesh,
                            in_specs=(P(), P()) + (P(AXIS),) * len(flat),
                            out_specs=P(AXIS), check_vma=False,
                        )
                    )
                )
                return fn(compiled, seed_arr, *flat)[:height]

            def worker(compiled, seed):
                di = jax.lax.axis_index(AXIS)
                y0_base = (di * rows_local).astype(jnp.int32)
                fb = jnp.zeros((rows_pad, width, 3), real)
                works = []
                for b in range(n_bands):
                    out = _render_band_regen(
                        compiled, seed,
                        y0_base + jnp.int32(b * band_rows), jnp.int32(0),
                        width=width, height=height, band_rows=band_rows,
                        s_par=s_par, spp=spp, sample_limit=jnp.int32(spp),
                        max_depth=max_depth, sampler=sampler,
                        has_dof=has_dof, cam_consts=cam_c, rr=rr, clamp=clamp,
                        want_work=sortable,
                    )
                    if sortable:
                        out, wk = out
                        works.append(wk)
                    fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
                fbd = fb[:rows_local] / real(spp)
                if sortable:
                    return fbd, jnp.stack(works)[None]
                return fbd

            fn = _memo_sharded(
                compiled, cfg_key + ("work" if sortable else "plain",),
                lambda: jax.jit(
                    jax.shard_map(
                        worker, mesh=mesh, in_specs=(P(), P()),
                        out_specs=(P(AXIS), P(AXIS)) if sortable else P(AXIS),
                        check_vma=False,
                    )
                )
            )
            if not sortable:
                return fn(compiled, seed_arr)[:height]
            fb, works = fn(compiled, seed_arr)
            works = np.asarray(works)  # (n_dev, n_bands, n_lanes)
            n_items = _plan_items(band_rows, width, compiled.rows * 128)
            plans = []
            for b in range(n_bands):
                per_dev = []
                for d in range(n_dev):
                    y0 = d * rows_local + b * band_rows
                    per_dev.append(_sorted_plan(
                        works[d, b], width, band_rows,
                        min(band_rows, height - y0), y0, n_items,
                    ))
                plans.append(tuple(
                    jnp.stack([p[i] for p in per_dev]) for i in range(3)
                ))
            plan_entry["plans"] = plans
            return fb[:height]

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
