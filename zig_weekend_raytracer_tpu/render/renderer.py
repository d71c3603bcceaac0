"""Chunked render driver.

The reference fans (row x 32-pixel-block) closures onto a thread pool
(src/render.zig:55-73).  The TPU analog: the whole (pixel, sample) space is a
flat wavefront, chunked into static-shape batches (row bands x sample
chunks) so one jitted program is compiled once and reused; chunk size bounds
transient HBM while keeping the VPU saturated.  Accumulation happens on
device in f32; there are no races by construction — each chunk owns a
disjoint framebuffer slice, the direct analog of the reference's
partition-by-construction concurrency (src/render.zig:60).

Because all randomness is content-addressed by global ray id
(sampling/hashrng.py), the rendered image is bitwise-invariant to the chunk
decomposition.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import real
from ..sampling.sampler import SamplerKind
from ..scene import CompiledScene, Scene
from ..utils.profiler import named_zone
from .camera import CameraParams, camera_consts, camera_params, generate_rays
from .integrator import trace_paths, trace_paths_regen

log = logging.getLogger("zwrt")


TILE = 32  # pixel-block side for tiled ray order (32x32 = one trace tile)


def pick_tile(width: int, band_rows: int) -> int | None:
    """Use tiled ray order when the chunk is big enough for padding to a
    TILE multiple to be negligible; tiny (test-sized) renders stay flat."""
    if width >= 2 * TILE and band_rows >= TILE:
        return TILE
    return None


def ray_grid(width, height, band_y0, band_rows, sample0, spp_chunk, tile=None):
    """(px, py, sample_idx, ray_id) arrays for one chunk.

    The global ray id is ``(sample * height + y) * width + x`` — the RNG
    content address (u32; callers must keep W*H*spp < 2^32).  Because all
    randomness is content-addressed by (sample, y, x), the EMISSION ORDER of
    rays is free: with ``tile`` set, pixels are emitted in (sample, block_y,
    block_x, in_y, in_x) order so every group of tile*tile consecutive rays
    is a compact image block — the Pallas trace tiles then carry tight
    spatial frusta, which is what makes group-tree traversal prune
    (ops/pallas_trace.py).  ``unflatten_radiance`` undoes the order with
    pure reshapes/transposes (no gathers).  Padded rows/columns are clamped
    to the last valid pixel and sliced away by the caller.
    """
    s = sample0 + jnp.arange(spp_chunk, dtype=jnp.int32)
    if tile is None:
        y = band_y0 + jnp.arange(band_rows, dtype=jnp.int32)
        x = jnp.arange(width, dtype=jnp.int32)
        sg, yg, xg = jnp.meshgrid(s, y, x, indexing="ij")
        px = xg.reshape(-1)
        py = jnp.minimum(yg.reshape(-1), height - 1)  # clamp padded rows
    else:
        rows_p = -(-band_rows // tile) * tile
        width_p = -(-width // tile) * tile
        by = jnp.arange(rows_p // tile, dtype=jnp.int32)
        bx = jnp.arange(width_p // tile, dtype=jnp.int32)
        iy = jnp.arange(tile, dtype=jnp.int32)
        ix = jnp.arange(tile, dtype=jnp.int32)
        sg, byg, bxg, iyg, ixg = jnp.meshgrid(s, by, bx, iy, ix, indexing="ij")
        px = jnp.minimum((bxg * tile + ixg).reshape(-1), width - 1)
        py = jnp.minimum(
            band_y0 + (byg * tile + iyg).reshape(-1), height - 1
        )
        sg = sg
    sidx = sg.reshape(-1)
    ray_id = (
        (sidx.astype(jnp.uint32) * jnp.uint32(height) + py.astype(jnp.uint32))
        * jnp.uint32(width)
        + px.astype(jnp.uint32)
    )
    return px, py, sidx, ray_id


def unflatten_radiance(rad, width, band_rows, spp_chunk, tile):
    """(N, 3) radiance in ray_grid order -> (spp_chunk, band_rows, width, 3)
    (pure reshape/transpose; padded pixels sliced off)."""
    if tile is None:
        return rad.reshape(spp_chunk, band_rows, width, 3)
    rows_p = -(-band_rows // tile) * tile
    width_p = -(-width // tile) * tile
    rad = rad.reshape(
        spp_chunk, rows_p // tile, width_p // tile, tile, tile, 3
    )
    rad = rad.transpose(0, 1, 3, 2, 4, 5).reshape(
        spp_chunk, rows_p, width_p, 3
    )
    return rad[:, :band_rows, :width]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "band_rows", "spp_chunk", "spp",
        "max_depth", "sampler", "has_dof", "rr", "clamp",
    ),
)
def _render_band(
    scene: CompiledScene,
    cam: CameraParams,
    seed: jnp.ndarray,      # u32 scalar
    band_y0: jnp.ndarray,   # scalar i32
    sample0: jnp.ndarray,   # scalar i32
    *,
    width: int,
    height: int,
    band_rows: int,
    spp_chunk: int,
    spp: int,
    max_depth: int,
    sampler: SamplerKind,
    has_dof: bool,
    sample_limit: int | None = None,
    rr: int = 0,
    clamp: float = 0.0,
) -> jnp.ndarray:
    """Render one (row-band x sample-chunk) wavefront; returns the radiance
    sum over the chunk's samples, shape (band_rows, width, 3).

    ``spp`` is the TOTAL samples-per-pixel of the render — samplers derive
    their stratification geometry from it, so it must be identical across
    chunked/progressive decompositions.  ``sample_limit`` (default ``spp``)
    caps which sample indices contribute; progressive batches pass the end
    of their batch here while keeping ``spp`` at the total.  It is a
    DYNAMIC argument (round-5 fix): sharded workers pass a per-device
    limit derived from ``axis_index`` — without it, a device whose chunk
    grid overshoots its sample slice double-counted the neighbour
    device's first samples whenever spp_chunk did not divide the slice."""
    with named_zone("Renderer::render"):
        tile = pick_tile(width, band_rows)
        px, py, sidx, ray_id = ray_grid(
            width, height, band_y0, band_rows, sample0, spp_chunk, tile
        )
        with named_zone("sampleRay"):
            origin, direction, time = generate_rays(
                cam, has_dof, sampler, seed, ray_id, px, py, sidx,
                spp, width, height,
            )
        with named_zone("rayColorLine"):
            radiance = trace_paths(
                scene, origin, direction, time, seed, ray_id, max_depth,
                rr_start=rr, clamp=clamp,
            )
        # Zero padded samples (last chunk when spp % spp_chunk != 0).
        valid = sidx < (spp if sample_limit is None else sample_limit)
        rad = radiance.to_array() * valid[..., None]
        return unflatten_radiance(rad, width, band_rows, spp_chunk, tile).sum(
            axis=0
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "band_rows", "s_par", "spp",
        "max_depth", "sampler", "has_dof", "cam_consts", "want_work", "rr", "clamp",
    ),
)
def _render_band_regen(
    scene: CompiledScene,
    seed: jnp.ndarray,      # u32 scalar
    band_y0: jnp.ndarray,   # scalar i32
    sample0: jnp.ndarray,   # scalar i32
    *,
    width: int,
    height: int,
    band_rows: int,
    s_par: int,             # samples in flight per pixel (slot parallelism)
    spp: int,               # TOTAL spp (sampler stratification geometry)
    sample_limit,           # first sample index NOT rendered (dynamic: the
                            # sharded renderer passes a per-device value)
    max_depth: int,
    sampler: SamplerKind,
    has_dof: bool,
    cam_consts,             # static float tuple (camera_consts)
    want_work: bool = False,
    rr: int = 0,
    clamp: float = 0.0,
):
    """Regenerating-wavefront band render (Pallas bounce-kernel path): each
    of band_rows*width*s_par slots sequentially traces its pixel's samples
    {sample0 + k + j*s_par} < sample_limit, respawning in-kernel.  Returns
    the radiance sum over those samples, (band_rows, width, 3) — plus the
    per-lane traced-call counts (lane order) when ``want_work``, the cost
    signal for the profile-guided balancer."""
    with named_zone("Renderer::render"):
        tile = pick_tile(width, band_rows)
        px, py, sidx, _ = ray_grid(
            width, height, band_y0, band_rows, sample0, s_par, tile
        )
        n = px.shape[0]
        BLK = scene.rows * 128  # per-scene wavefront block (pick_rows)

        n_pad = -(-n // BLK) * BLK
        limit = jnp.full((n,), sample_limit, jnp.int32)
        if n_pad != n:
            # padding slots get limit 0 -> never respawn
            px = jnp.concatenate([px, jnp.zeros((n_pad - n,), px.dtype)])
            py = jnp.concatenate([py, jnp.zeros((n_pad - n,), py.dtype)])
            sidx = jnp.concatenate(
                [sidx, jnp.zeros((n_pad - n,), sidx.dtype)]
            )
            limit = jnp.concatenate(
                [limit, jnp.zeros((n_pad - n,), limit.dtype)]
            )
        out = trace_paths_regen(
            scene, cam_consts, seed, px, py, sidx, limit,
            sampler=sampler, width=width, height=height, spp=spp,
            stride=s_par, max_depth=max_depth,
            has_dof=has_dof, want_work=want_work, rr_start=rr, clamp=clamp,
        )
        radiance = out[0] if want_work else out
        rad = radiance.to_array()[:n]
        fb = unflatten_radiance(rad, width, band_rows, s_par, tile).sum(
            axis=0
        )
        if want_work:
            return fb, out[1][:n]
        return fb


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "band_rows", "spp", "max_depth", "sampler",
        "has_dof", "cam_consts", "rr", "clamp",
    ),
)
def _render_band_balanced(
    scene: CompiledScene,
    seed: jnp.ndarray,      # u32 scalar
    band_y0: jnp.ndarray,   # scalar i32
    px: jnp.ndarray,        # (M,) i32 per-lane pixel column (BLK multiple)
    py: jnp.ndarray,        # (M,) i32 per-lane pixel row
    s0: jnp.ndarray,        # (M,) i32 per-lane first sample
    s1: jnp.ndarray,        # (M,) i32 per-lane sample limit (s1 <= s0: dead)
    *,
    width: int,
    height: int,
    band_rows: int,
    spp: int,
    max_depth: int,
    sampler: SamplerKind,
    has_dof: bool,
    cam_consts,
    rr: int = 0,
    clamp: float = 0.0,
) -> jnp.ndarray:
    """Balanced-plan band render: lanes carry explicit (pixel, sample-range)
    work items produced by ``build_balance_plan``; per-lane radiance sums are
    scatter-added into the band framebuffer (each (pixel, sample) pair is
    owned by exactly one lane, so there are no races by construction —
    the balanced analog of the reference's disjoint pixel blocks,
    src/render.zig:55-73)."""
    with named_zone("Renderer::render"):
        radiance = trace_paths_regen(
            scene, cam_consts, seed, px, py, s0, s1,
            sampler=sampler, width=width, height=height, spp=spp,
            stride=1, max_depth=max_depth, has_dof=has_dof, rr_start=rr, clamp=clamp,
        )
        pixflat = (py - band_y0) * width + px
        fb = jnp.zeros((band_rows * width, 3), real)
        fb = fb.at[pixflat].add(radiance.to_array())
        return fb.reshape(band_rows, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "sampler", "has_dof"),
)
def _first_hit_probe(
    scene: CompiledScene,
    cam: CameraParams,
    seed: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    *,
    width: int,
    height: int,
    spp: int,
    sampler: SamplerKind,
    has_dof: bool,
):
    """First-hit (kind, idx) of each pixel's sample-0 primary ray — the
    ray-coherence key for tree-scene tile packing (one trace pass, no
    shading)."""
    from ..ops.trace import closest_hit

    sidx = jnp.zeros_like(px)
    ray_id = (
        py.astype(jnp.uint32) * jnp.uint32(width) + px.astype(jnp.uint32)
    )
    origin, direction, time = generate_rays(
        cam, has_dof, sampler, seed, ray_id, px, py, sidx,
        spp, width, height,
    )
    hit = closest_hit(scene, origin, direction, time, 1e-4, jnp.inf)
    return hit.kind, hit.idx


def tile_order_lane_index(width, band_rows, tile):
    """(band_rows, width) array of each pixel's lane index in the tiled
    ray_grid order (s_par=1), accounting for tile padding."""
    if tile is None:
        return np.arange(band_rows * width).reshape(band_rows, width)
    nbx = -(-width // tile)
    y = np.arange(band_rows)[:, None]
    x = np.arange(width)[None, :]
    by, iy = y // tile, y % tile
    bx, ix = x // tile, x % tile
    return (((by * nbx + bx) * tile + iy) * tile) + ix


def build_balance_plan(
    work_px: np.ndarray,   # (rows, width) per-pixel cost from the est pass
    band_y0: int,
    spp_est: int,
    spp: int,
    budget_lanes: int,     # M: total lanes (BLK multiple)
    tile,
):
    """Profile-guided lane plan: split each pixel's remaining samples
    [spp_est, spp) across ~cost-proportional lane counts so every lane
    carries roughly equal predicted work (cost x samples).  Pixels are
    emitted in tile-traversal order (lanes of one pixel adjacent), so trace
    tiles keep tight spatial frusta.  Returns (px, py, s0, s1) i32 arrays of
    length ``budget_lanes``; surplus lanes are dead (s1 == s0 == 0)."""
    rows, width = work_px.shape
    lane_idx = tile_order_lane_index(width, rows, tile).reshape(-1)
    order = np.argsort(lane_idx, kind="stable")  # pixels in tile order

    cost = np.maximum(work_px.reshape(-1).astype(np.float64), 1.0)[order]
    ys = (np.repeat(np.arange(rows), width) + band_y0)[order]
    xs = np.tile(np.arange(width), rows)[order]

    n_pix = cost.size
    r = spp - spp_est
    extra = max(0, budget_lanes - n_pix)
    share = extra * cost / cost.sum()
    k = 1 + np.floor(share).astype(np.int64)
    rem = budget_lanes - int(k.sum())
    if rem > 0:
        frac_order = np.argsort(-(share - np.floor(share)), kind="stable")
        k[frac_order[:rem]] += 1
    k = np.minimum(k, max(r, 1))  # never more lanes than samples

    total = int(k.sum())
    px = np.repeat(xs, k)
    py = np.repeat(ys, k)
    starts = np.cumsum(k) - k
    j = np.arange(total) - np.repeat(starts, k)
    kk = np.repeat(k, k)
    s0 = spp_est + (j * r) // kk
    s1 = spp_est + ((j + 1) * r) // kk

    pad = budget_lanes - total
    if pad:
        px = np.concatenate([px, np.zeros(pad, np.int64)])
        py = np.concatenate([py, np.full(pad, band_y0, np.int64)])
        s0 = np.concatenate([s0, np.zeros(pad, np.int64)])
        s1 = np.concatenate([s1, np.zeros(pad, np.int64)])
    return (
        px.astype(np.int32), py.astype(np.int32),
        s0.astype(np.int32), s1.astype(np.int32),
    )


@dataclasses.dataclass
class Renderer:
    """User-facing render configuration (reference: Renderer struct,
    src/render.zig:19-27 + UserArgs, src/main.zig:20-28)."""

    samples_per_pixel: int = 10
    max_ray_bounce_depth: int = 20
    sampler: SamplerKind = SamplerKind.SOBOL  # the reference hardcodes Sobol
    # pixel jitter (src/render.zig:115-121); independent/stratified selectable
    seed: int = 0
    # Max rays in flight per chunk; bounds transient HBM.
    max_rays_per_chunk: int = 1 << 21
    # BVH traversal keeps a larger live set inside its while_loop; beyond
    # ~2^17 rays the TPU runtime falls over (observed worker crashes), so
    # BVH scenes are chunked finer until the Pallas traversal kernel lands.
    max_rays_per_chunk_bvh: int = 1 << 17
    # Russian roulette from this bounce index (0 = off, the reference
    # semantics).  Unbiased tail cut: from bounce d >= russian_roulette a
    # path continues with p = clamp(max(throughput), RR_P_MIN, 1) and
    # survivors carry the 1/p weight (integrator.trace_paths docstring).
    # Ignored on image-texture scenes (kernel/XLA p would diverge there).
    russian_roulette: int = 0
    # Indirect luminance clamp (0 = off, the reference semantics): any
    # radiance contribution landed at bounce >= 1 is luminance-scaled to
    # at most this value — biased firefly suppression, Cycles-style
    # (integrator.trace_paths docstring).  Same image-scene gate as RR.
    clamp_indirect: float = 0.0

    def chunk_geometry(self, scene: Scene, width: int, height: int, spp_req: int):
        """(spp_chunk, band_rows) chunk sizing shared by the one-shot and
        progressive drivers, including the XLA-BVH wavefront cap."""
        from ..ops.trace import _use_pallas_backend

        # The XLA while_loop BVH needs small wavefronts (worker instability
        # beyond ~2^17 rays); the Pallas tracer used on TPU has no such limit.
        max_rays = (
            self.max_rays_per_chunk_bvh
            if (scene.compiled.has_bvh and not _use_pallas_backend())
            else self.max_rays_per_chunk
        )
        # Fit as many samples per chunk as possible, then split rows if a
        # single-sample pass is still too large.
        spp_chunk = max(1, min(spp_req, max_rays // max(width * height, 1)))
        band_rows = max(1, min(height, max_rays // (width * spp_chunk)))
        return spp_chunk, band_rows

    # Minimum lanes to keep the VPU busy on the regenerating path; beyond
    # this, FEWER parallel samples per pixel is faster (sequential samples
    # amortize the straggler tail of long paths — measured 82 vs 43 Mpaths/s
    # on cornell 400x400@128spp for s_par 1 vs 13).
    regen_min_wave: int = 1 << 17
    # Profile-guided load balancing (regen path, s_par == 1): a cheap
    # estimation pass (spp/16 samples, which still contribute to the image)
    # measures per-pixel path cost; the remaining samples are then split
    # across cost-proportional lane counts so expensive pixels don't drag
    # their whole ray tile (pixel path lengths vary ~5x across an image).
    # The fused megakernel already removes CROSS-tile waiting (each ray tile
    # drains its work list independently in-kernel), which measured FASTER
    # than two-pass balancing at every tested scale (e.g. cornell
    # 400x400@1024spp: 1.02 s fused vs 1.58 s balanced — the cost-map fetch
    # + plan build cost ~100 ms on the tunneled backend and splitting only
    # shrinks INTRA-tile idle).  Round 3 re-measured it on the PER-BOUNCE
    # image path, where a straggler lane stalls the whole wavefront's
    # while_loop: still a loss (shrek_quads 400x400@128spp: 0.59 s plain
    # vs 0.94 s balanced — paths are short, mean 1.8 bounces, so the tail
    # is mild and the estimation pass never pays for itself).  Balancing
    # therefore defaults OFF (balance_min_spp = 0); it remains available
    # for workloads with extreme per-pixel cost skew.  ZWRT_NO_BALANCE=1
    # force-disables.
    balance_min_spp: int = 0
    balance_overprovision: float = 1.3
    # Temporal cost-map reuse (brute-trace scenes): the first render of a
    # given (scene, size, spp) measures per-pixel path cost as a free kernel
    # side-output; subsequent renders pack similar-cost pixels into the same
    # ray tile (a pure pixel permutation — the content-addressed RNG makes
    # the image invariant to it), cutting the intra-tile straggler idle.
    # Only applied to scenes WITHOUT group trees: tree traversal needs
    # spatially tight tile frusta, which cost-sorting destroys.
    # ZWRT_NO_SORT=1 disables.
    #
    # Keyed on the CompiledScene OBJECT via a WeakKeyDictionary (not id():
    # CPython recycles ids after GC, which could hand a new scene a stale
    # cost map) mapping to a per-scene {config: entry} dict bounded at
    # _plan_cache_max_configs (FIFO eviction).  Entries die with their scene.
    _plan_cache: "weakref.WeakKeyDictionary" = dataclasses.field(
        default_factory=lambda: weakref.WeakKeyDictionary(),
        repr=False, compare=False,
    )
    _plan_cache_max_configs: int = 8

    def regen_geometry(
        self, width: int, height: int, spp: int, image_scene: bool = False
    ):
        """(s_par, band_rows) for the regenerating wavefront: just enough
        samples-in-flight per pixel to fill the chip, rows capped by the
        transient-memory budget.

        ``image_scene`` is accepted for experimentation but does not change
        the policy: raising s_par for image scenes (to shorten each lane's
        serial atlas-event chain) was measured SLOWER at every tested value
        (e.g. s_par=8: rtw_final 2.19 s -> 2.49 s, shrek 0.60 s -> 0.97 s)
        — the larger wavefront multiplies per-launch grid cost faster than
        it divides the suspend-launch count."""
        del image_scene
        pixels = max(width * height, 1)
        s_par = max(1, min(spp, -(-self.regen_min_wave // pixels)))
        band_rows = max(
            1, min(height, self.max_rays_per_chunk // (width * s_par))
        )
        return s_par, band_rows

    def _render_band_balanced_driver(
        self, scene: Scene, seed, band_y0: int, rows_eff: int,
        band_rows: int, width: int, height: int, spp: int, has_dof, cam_c,
    ) -> jnp.ndarray:
        """Two-pass profile-guided band render: estimation pass (first
        spp_est samples; its radiance counts toward the image) measures
        per-pixel cost, then the balanced plan renders the rest."""
        # clamp to spp: with spp <= 2 the estimation pass IS the render
        # (rendering sample indices >= spp would leave Sobol's strata and
        # double-count radiance against the final /spp divide)
        spp_est = min(spp, max(2, spp // 16))
        tile = pick_tile(width, band_rows)
        fb_est, work = _render_band_regen(
            scene.compiled, seed, jnp.int32(band_y0), jnp.int32(0),
            width=width, height=height, band_rows=band_rows, s_par=1,
            spp=spp, sample_limit=spp_est,
            max_depth=self.max_ray_bounce_depth,
            sampler=self.sampler, has_dof=has_dof, cam_consts=cam_c,
            want_work=True, rr=self.russian_roulette, clamp=self.clamp_indirect,
        )
        lane_idx = tile_order_lane_index(width, band_rows, tile)
        work_px = np.asarray(work)[lane_idx.reshape(-1)].reshape(
            band_rows, width
        )[:rows_eff]
        BLK = scene.compiled.rows * 128

        budget = int(self.balance_overprovision * band_rows * width)
        budget = -(-budget // BLK) * BLK
        px, py, s0, s1 = build_balance_plan(
            work_px, band_y0, spp_est, spp, budget, tile
        )
        out = _render_band_balanced(
            scene.compiled, seed, jnp.int32(band_y0),
            jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(s0), jnp.asarray(s1),
            width=width, height=height, band_rows=band_rows, spp=spp,
            max_depth=self.max_ray_bounce_depth, sampler=self.sampler,
            has_dof=has_dof, cam_consts=cam_c, rr=self.russian_roulette, clamp=self.clamp_indirect,
        )
        return fb_est + out

    def _render_band_sorted_driver(
        self, scene: Scene, seed, band_y0: int, rows_eff: int,
        band_rows: int, width: int, height: int, spp: int, has_dof, cam_c,
    ) -> jnp.ndarray:
        """Cost-sorted tile packing with temporal reuse: the FIRST render of
        this (scene, size, config) runs the plain fused kernel with the
        per-lane work counter as a free side-output and caches it; later
        renders sort pixels by that measured cost so each ray tile holds
        similar-cost lanes (tile lifetime = max over its lanes — mixing a
        10-bounce glass pixel into a tile of 2-bounce wall pixels idles 80%
        of the tile).  A pure pixel permutation: bit-identical radiance per
        pixel, any assignment order."""
        scene_cache = self._plan_cache.get(scene.compiled)
        if scene_cache is None:
            scene_cache = self._plan_cache.setdefault(scene.compiled, {})
        key = (
            width, height, band_y0, spp,
            self.max_ray_bounce_depth, self.sampler, self.seed,
        )
        entry = scene_cache.get(key)
        if entry is None:
            fb, work = _render_band_regen(
                scene.compiled, seed, jnp.int32(band_y0), jnp.int32(0),
                width=width, height=height, band_rows=band_rows,
                s_par=1, spp=spp, sample_limit=spp,
                max_depth=self.max_ray_bounce_depth,
                sampler=self.sampler, has_dof=has_dof, cam_consts=cam_c,
                want_work=True, rr=self.russian_roulette, clamp=self.clamp_indirect,
            )
            # keep the cost map on device; converted lazily at plan build
            while len(scene_cache) >= self._plan_cache_max_configs:
                scene_cache.pop(next(iter(scene_cache)))
            scene_cache[key] = {"work": work}
            return fb
        if "plan" not in entry:
            BLK = scene.compiled.rows * 128

            tile = pick_tile(width, band_rows)
            lane_idx = tile_order_lane_index(width, band_rows, tile)
            w = np.asarray(entry["work"])
            cost = w[lane_idx.reshape(-1)].reshape(band_rows, width)[
                :rows_eff
            ].reshape(-1)
            ys, xs = np.divmod(np.arange(cost.size), width)
            order = np.argsort(-cost, kind="stable")
            px = xs[order]
            py = ys[order] + band_y0
            n_pad = -(-cost.size // BLK) * BLK
            pad = n_pad - cost.size
            s1 = np.full(cost.size, spp, np.int64)
            if pad:
                px = np.concatenate([px, np.zeros(pad, np.int64)])
                py = np.concatenate([py, np.full(pad, band_y0, np.int64)])
                s1 = np.concatenate([s1, np.zeros(pad, np.int64)])
            entry["plan"] = tuple(
                jnp.asarray(a.astype(np.int32))
                for a in (px, py, np.zeros(n_pad, np.int64), s1)
            )
            entry.pop("work")
        pxd, pyd, s0d, s1d = entry["plan"]
        return _render_band_balanced(
            scene.compiled, seed, jnp.int32(band_y0), pxd, pyd, s0d, s1d,
            width=width, height=height, band_rows=band_rows, spp=spp,
            max_depth=self.max_ray_bounce_depth, sampler=self.sampler,
            has_dof=has_dof, cam_consts=cam_c, rr=self.russian_roulette, clamp=self.clamp_indirect,
        )

    def _render_band_coherent_driver(
        self, scene: Scene, seed, band_y0: int, rows_eff: int,
        band_rows: int, width: int, height: int, spp: int, has_dof, cam_c,
    ) -> jnp.ndarray:
        """Ray-coherence-sorted tile packing for TREE scenes (VERDICT r4
        #3; opt-in ZWRT_COHERENT=1): pixels are ordered by their primary
        ray's first-hit primitive (kind, idx — primitives are stored in
        tree build order, so nearby idx = nearby leaf), ties kept in
        image-tile order.  A tile's 1024 rays then start on the same tree
        neighborhood, shrinking the node union the lockstep traversal
        must visit for the first bounces (the standard wavefront-tracer
        answer to divergence; the reference's per-ray walk never pays a
        union, src/entity.zig:286-303).  A pure pixel permutation:
        bit-identical radiance per pixel."""
        scene_cache = self._plan_cache.get(scene.compiled)
        if scene_cache is None:
            scene_cache = self._plan_cache.setdefault(scene.compiled, {})
        key = (
            "coh", width, height, band_y0, spp,
            self.max_ray_bounce_depth, self.sampler, self.seed,
        )
        entry = scene_cache.get(key)
        if entry is None:
            BLK = scene.compiled.rows * 128
            cam = camera_params(scene.camera, width, height)
            ys, xs = np.divmod(np.arange(rows_eff * width), width)
            kind, idx = _first_hit_probe(
                scene.compiled, cam, seed,
                jnp.asarray(xs.astype(np.int32)),
                jnp.asarray((ys + band_y0).astype(np.int32)),
                width=width, height=height, spp=spp,
                sampler=self.sampler, has_dof=has_dof,
            )
            kind = np.asarray(kind).astype(np.int64)
            idx = np.asarray(idx).astype(np.int64)
            hit_key = np.where(kind < 0, -1, (kind << 24) + idx)
            tile = pick_tile(width, band_rows)
            lane_idx = tile_order_lane_index(width, band_rows, tile)
            lane_ord = lane_idx[:rows_eff].reshape(-1)
            order = np.lexsort((lane_ord, hit_key))
            px = xs[order]
            py = ys[order] + band_y0
            n_pad = -(-px.size // BLK) * BLK
            pad = n_pad - px.size
            s1 = np.full(px.size, spp, np.int64)
            if pad:
                px = np.concatenate([px, np.zeros(pad, np.int64)])
                py = np.concatenate([py, np.full(pad, band_y0, np.int64)])
                s1 = np.concatenate([s1, np.zeros(pad, np.int64)])
            while len(scene_cache) >= self._plan_cache_max_configs:
                scene_cache.pop(next(iter(scene_cache)))
            entry = scene_cache[key] = {
                "plan": tuple(
                    jnp.asarray(a.astype(np.int32))
                    for a in (px, py, np.zeros(n_pad, np.int64), s1)
                )
            }
        pxd, pyd, s0d, s1d = entry["plan"]
        return _render_band_balanced(
            scene.compiled, seed, jnp.int32(band_y0), pxd, pyd, s0d, s1d,
            width=width, height=height, band_rows=band_rows, spp=spp,
            max_depth=self.max_ray_bounce_depth, sampler=self.sampler,
            has_dof=has_dof, cam_consts=cam_c, rr=self.russian_roulette,
            clamp=self.clamp_indirect,
        )

    def render(
        self,
        scene: Scene,
        width: int,
        height: int,
    ) -> np.ndarray:
        """Renders and returns the linear-space framebuffer (H, W, 3) f32
        averaged over samples (the analog of Renderer.render,
        src/render.zig:29-74)."""
        return np.asarray(self.render_device(scene, width, height))

    def render_supersampled(
        self,
        scene: Scene,
        width: int,
        height: int,
        k: int = 2,
    ) -> jnp.ndarray:
        """Render at (k*width, k*height) with spp/k^2 samples per subpixel
        and box-downsample to (height, width, 3) on device.

        Estimator: identical box pixel filter as ``render`` — each pixel
        still averages ``samples_per_pixel`` rays uniform over its area
        (src/render.zig:115-121 jitters uniform in-pixel; here the k^2
        subpixels stratify that area), so the result is unbiased for the
        same image and usually LOWER variance (stratification).  It is not
        bitwise-equal to ``render`` (different sample positions).

        Why it exists (TPU-specific): a ray tile of a k*-res render
        subtends a k^2-smaller view cone, so tree scenes' tile-lockstep
        traversal visits a smaller node union — measured +23% path
        throughput on balls at 2x resolution (BASELINE round-5 resolution
        scaling, tpu_runs/r5g) where per-ray-traversal hardware would see
        nothing.  Brute-force scenes gain nothing structural (same ray
        count) and mostly trade launch amortization.
        """
        if k < 1:
            raise ValueError(f"supersample factor must be >= 1, got {k}")
        if k == 1:
            return self.render_device(scene, width, height)
        spp = self.samples_per_pixel
        if spp % (k * k):
            raise ValueError(
                f"samples_per_pixel={spp} must be divisible by k^2={k * k} "
                "for supersampled rendering (each subpixel renders "
                "spp/k^2 samples)"
            )
        sub = dataclasses.replace(self, samples_per_pixel=spp // (k * k))
        if self.sampler == SamplerKind.SOBOL:
            # Sobol pixel offsets are [0,1) around pixel00 (PBRT raster
            # convention, parity with the reference src/math/sampler.zig:
            # 222-233): pixel p covers [(p+.5)d, (p+1.5)d), a half-pixel
            # anchor that SCALES with resolution.  Shift the k-res grid by
            # (k-1)/2 sub-pixels so the k^2 subpixels tile each base
            # pixel's coverage exactly (without this the image lands
            # (k-1)/2k base pixels off and edges double: measured 10x MSE
            # on cornell before the fix, tests/test_supersample.py).
            s = (k - 1) / 2.0
            scene = dataclasses.replace(
                scene,
                camera=dataclasses.replace(
                    scene.camera,
                    raster_shift=(
                        scene.camera.raster_shift[0] + s,
                        scene.camera.raster_shift[1] + s,
                    ),
                ),
            )
        fb = sub.render_device(scene, width * k, height * k)
        return fb.reshape(height, k, width, k, 3).mean(axis=(1, 3))

    def render_adaptive(
        self,
        scene: Scene,
        width: int,
        height: int,
        *,
        pilot_spp: int = 0,
        return_stats: bool = False,
    ):
        """Variance-guided adaptive render at the same TOTAL sample budget
        as ``render`` (samples_per_pixel x pixels), re-allocated per pixel
        by measured noise — see render/adaptive.py.  Returns the averaged
        (H, W, 3) framebuffer on device."""
        from .adaptive import render_adaptive

        return render_adaptive(
            self, scene, width, height,
            pilot_spp=pilot_spp, return_stats=return_stats,
        )

    def render_device(
        self,
        scene: Scene,
        width: int,
        height: int,
    ) -> jnp.ndarray:
        spp = self.samples_per_pixel
        if self.sampler == SamplerKind.SOBOL and spp & (spp - 1):
            log.warning(
                "Non power of two samples per pixel will perform poorly "
                "with sobol sampling: %d", spp,
            )  # parity: src/math/sampler.zig:184-186
        if width * height * spp >= 2**32:
            # a survivable config error, not an invariant — must hold under
            # python -O too (the u32 ray id is the RNG content address)
            raise ValueError(
                f"ray id space {width}x{height}x{spp} exceeds u32; reduce "
                "spp or render progressively (render/progressive.py)"
            )

        cam = camera_params(scene.camera, width, height)
        has_dof = scene.camera.has_depth_of_field
        seed = jnp.uint32(self.seed)

        from ..ops.pallas_bounce import supports_bounce_kernel
        from ..ops.trace import _use_pallas_backend

        use_regen = _use_pallas_backend() and supports_bounce_kernel(
            scene.compiled
        )

        if use_regen:
            # Regenerating wavefront: one wave per band covers ALL samples.
            s_par, band_rows = self.regen_geometry(
                width, height, spp,
                image_scene=scene.compiled.has_image_textures,
            )
            balance = (
                s_par == 1
                and self.balance_min_spp > 0
                and spp >= self.balance_min_spp
                and not os.environ.get("ZWRT_NO_BALANCE")
            )
            n_bands = -(-height // band_rows)
            fb = jnp.zeros((n_bands * band_rows, width, 3), real)
            cam_c = camera_consts(scene.camera, width, height)
            sc = scene.compiled
            sortable = (
                s_par == 1
                and not balance
                and not (sc.has_sph_tree or sc.has_quad_tree)
                and not os.environ.get("ZWRT_NO_SORT")
            )
            # Coherence-sorted packing for tree scenes (VERDICT r4 #3):
            # DEFAULT ON since the hardware A/B (rtw 1.360 -> 1.209 s
            # = +13%, balls neutral 37.6 vs 37.5, identical images —
            # tpu_runs/r5b/04-07); ZWRT_COHERENT=0 opts out.
            coherent = (
                s_par == 1
                and not balance
                and (sc.has_sph_tree or sc.has_quad_tree)
                and os.environ.get("ZWRT_COHERENT", "1") not in ("", "0")
            )
            for b in range(n_bands):
                if balance:
                    out = self._render_band_balanced_driver(
                        scene, seed, b * band_rows,
                        min(band_rows, height - b * band_rows),
                        band_rows, width, height, spp, has_dof, cam_c,
                    )
                elif coherent:
                    out = self._render_band_coherent_driver(
                        scene, seed, b * band_rows,
                        min(band_rows, height - b * band_rows),
                        band_rows, width, height, spp, has_dof, cam_c,
                    )
                elif sortable:
                    out = self._render_band_sorted_driver(
                        scene, seed, b * band_rows,
                        min(band_rows, height - b * band_rows),
                        band_rows, width, height, spp, has_dof, cam_c,
                    )
                else:
                    out = _render_band_regen(
                        scene.compiled, seed,
                        jnp.int32(b * band_rows), jnp.int32(0),
                        width=width, height=height, band_rows=band_rows,
                        s_par=s_par, spp=spp, sample_limit=spp,
                        max_depth=self.max_ray_bounce_depth,
                        sampler=self.sampler, has_dof=has_dof,
                        cam_consts=cam_c, rr=self.russian_roulette, clamp=self.clamp_indirect,
                    )
                fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
            return fb[:height] / real(spp)

        spp_chunk, band_rows = self.chunk_geometry(scene, width, height, spp)
        n_bands = -(-height // band_rows)
        h_pad = n_bands * band_rows
        fb = jnp.zeros((h_pad, width, 3), real)
        n_chunks = -(-spp // spp_chunk)
        for b in range(n_bands):
            for c in range(n_chunks):
                out = _render_band(
                    scene.compiled, cam, seed,
                    jnp.int32(b * band_rows), jnp.int32(c * spp_chunk),
                    width=width, height=height, band_rows=band_rows,
                    spp_chunk=spp_chunk, spp=spp,
                    max_depth=self.max_ray_bounce_depth,
                    sampler=self.sampler, has_dof=has_dof,
                    rr=self.russian_roulette, clamp=self.clamp_indirect,
                )
                fb = fb.at[b * band_rows : (b + 1) * band_rows].add(out)
        return fb[:height] / real(spp)
