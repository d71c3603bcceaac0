"""The wavefront integrator: iterative, batched, branchless, SoA.

This is the TPU-native re-design of the reference's recursive Monte-Carlo
estimator ``rayColor`` (src/render.zig:188-289).  The recursion (two
self-calls: specular bypass :245 and PDF-weighted scatter :280) becomes a
``lax.fori_loop`` over bounce depth carrying SoA path state
(origin/direction/throughput/radiance/alive); the estimator identity

    color = emission + attenuation * scatter_pdf / sample_pdf * L(scattered)

unrolls into a running throughput product.

Semantics matched bounce-for-bounce:
  * depth cutoff -> black                              (:199)
  * miss -> background, path ends                      (:215-217)
  * emission with backface culling in the material     (:234, material.zig:93)
  * emissive / absorbed-metal paths end                (:238-240, material.zig:177)
  * specular branch bypasses PDFs, T *= attenuation    (:243-246)
  * diffuse: 50/50 mixture of light-entity PDF and the material scatter PDF
    when the scene has a light list                    (:254-263)
    or the cosine PDF alone otherwise                  (:264-269)
  * weight = attenuation * scatteringPdf / samplePdf   (:280-288)

All randomness is content-addressed (sampling/hashrng.py): a pure function
of (seed, ray_id, bounce, site), so results are bitwise-invariant to chunk
decomposition and device count.

Deviation (documented): paths whose throughput hits exactly zero are
terminated early.  In the reference they keep bouncing with zero weight; the
results are identical except where 0-weight samples would have turned into
NaNs (which the writer scrubs to black anyway, src/writer/writer.zig:83-94).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dtypes import INF, LUM_B, LUM_G, LUM_R, T_MIN, real
from ..materials import schlick_reflectance, scattering_pdf
from ..math import v3
from ..math.v3 import V3
from ..ops.shade import shade_attrs
from ..ops.trace import closest_hit
from ..sampling import hashrng
from ..scene import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_ISOTROPIC,
    MAT_METAL,
    CompiledScene,
)
from ..textures import (
    atlas_lookup,
    atlas_lookup_flat,
    checker_parity,
    texture_value,
)
from ..utils.profiler import named_zone
from .pdfs import light_pdf_value, sample_light_direction

# hashrng stream-site layout: camera uses sites 0..3 (see camera.py);
# each bounce d uses sites _BOUNCE_BASE + d * _SITES_PER_BOUNCE + k
# (k = 0 scatter, 1 light mixture, 2 gauss triple, 3 Russian roulette).
_BOUNCE_BASE = 8
_SITES_PER_BOUNCE = 4

# Russian-roulette survival floor (shared with the kernel twin)
RR_P_MIN = hashrng.RR_P_MIN


def texture_rgb(scene, det) -> V3:
    """Texture value at a hit from the denormalized shade record:
    solid -> rgb; checker -> lattice parity picks rgb/rgb2 or an image
    child (src/texture.zig:111-118); image -> atlas fetch.  Checker-in-
    checker nesting can't flatten into one record, so those scenes
    evaluate the general texture walk instead."""
    parity = checker_parity(det.inv_scale, det.point)
    odd = (det.tex_kind == 1) & (parity != 0)
    tex_rgb = V3.where(odd, det.rgb2, det.rgb)
    if scene.has_nested_checker:
        return texture_value(scene, det.texid, det.u, det.v, det.point)
    if scene.has_image_textures:
        img_id = jnp.where(odd, det.img2, det.img)
        img_rgb = atlas_lookup(
            scene, jnp.maximum(img_id, 0), det.u, det.v
        )
        tex_rgb = V3.where(img_id >= 0, img_rgb, tex_rgb)
    return tex_rgb


class PathState(NamedTuple):
    origin: V3
    direction: V3
    time: jnp.ndarray        # (N,)
    throughput: V3
    radiance: V3
    alive: jnp.ndarray       # (N,) bool
    ray_id: jnp.ndarray      # (N,) u32 RNG content address (travels with ray)


class RegenState(NamedTuple):
    origin: V3
    direction: V3
    time: jnp.ndarray
    throughput: V3
    radiance: V3
    alive: jnp.ndarray
    ray_id: jnp.ndarray
    sample: jnp.ndarray   # (N,) i32 current sample index per slot
    bounce: jnp.ndarray   # (N,) i32 per-path bounce counter
    work: jnp.ndarray     # (N,) i32 traced-call counter (None-like zeros
                          # unless cost measurement is requested)


def trace_paths_regen(
    scene: CompiledScene,
    camera_consts,          # static float tuple (render.camera.camera_consts)
    seed,                   # u32 scalar
    px: jnp.ndarray,        # (N,) i32 per-slot pixel column (BLK multiple)
    py: jnp.ndarray,        # (N,) i32 per-slot pixel row
    first_sample: jnp.ndarray,  # (N,) i32 per-slot first sample index
    sample_limit: jnp.ndarray,  # (N,) i32 per-slot first sample NOT rendered
    *,
    sampler,
    width: int,
    height: int,
    spp: int,
    stride: int,
    max_depth: int,
    has_dof: bool,
    terminate_zero_throughput: bool = True,
    want_work: bool = False,
    rr_start: int = 0,
    clamp: float = 0.0,
):
    """Regenerating wavefront: each slot owns one pixel and sequentially
    path-traces samples ``first_sample, first_sample + stride, ...`` below
    its ``sample_limit``; a lane whose path terminates respawns its next
    sample IN the bounce kernel, so lane utilization stays ~100% instead of
    decaying with the alive fraction (the production form of the wavefront
    design; the reference instead gives each CPU thread a pixel-block queue,
    src/render.zig:55-73).  Returns the per-slot radiance SUM over its
    samples (plus the per-slot traced-call count when ``want_work`` — the
    profile-guided balancer's cost signal); the content-addressed RNG keeps
    results bit-identical to the non-regenerating integrator.

    Dispatch: scenes without image textures run as ONE whole-render
    megakernel (ops/pallas_bounce.py:render_fused — each tile loops over
    bounces in-kernel, no global synchronization); image scenes run the
    per-bounce kernel under a ``lax.while_loop`` with the XLA atlas fix-up
    between bounces."""
    from ..ops.pallas_bounce import (
        bounce_pallas_regen,
        render_fused,
        supports_fused_render,
    )
    BLK = scene.rows * 128  # per-scene wavefront block (pick_rows)

    if supports_fused_render(scene):
        return render_fused(
            scene, px, py, first_sample, sample_limit, seed, T_MIN,
            camera_consts=camera_consts, sampler=sampler,
            width=width, height=height, spp=spp, stride=stride,
            max_depth=max_depth, has_dof=has_dof,
            terminate_zero=terminate_zero_throughput,
            want_work=want_work,
            rr_start=rr_start,
            clamp=clamp,
        )

    n = px.shape[0]
    state = RegenState(
        origin=V3.zeros((n,), real),
        direction=V3.full((n,), 0.0, 0.0, 1.0, real),
        time=jnp.zeros((n,), real),
        throughput=V3.full((n,), 1.0, 1.0, 1.0, real),
        radiance=V3.zeros((n,), real),
        alive=jnp.zeros((n,), bool),
        ray_id=jnp.zeros((n,), jnp.uint32),
        sample=first_sample - stride,  # pre-first: bounce 0 respawns it
        bounce=jnp.zeros((n,), jnp.int32),
        work=jnp.zeros((n,), jnp.int32),
    )

    def cond(st: RegenState):
        return jnp.any(st.alive | (st.sample + stride < sample_limit))

    def body(st: RegenState):
        origin, direction, throughput, radiance, alive, time, sample, \
            bounce, ray_id, work, to, chain = bounce_pallas_regen(
                scene, st.origin, st.direction, st.time, st.ray_id,
                st.throughput, st.radiance, st.alive,
                px, py, st.sample, st.bounce, sample_limit,
                seed, T_MIN,
                camera_consts=camera_consts, sampler=sampler,
                width=width, height=height, spp=spp, stride=stride,
                max_depth=max_depth, has_dof=has_dof,
                terminate_zero=terminate_zero_throughput,
                work=st.work if want_work else None,
                rr_start=rr_start,
                clamp=clamp,
            )
        if scene.has_image_textures:
            # Resolve the per-lane pending-atlas-event chain: walk the K
            # buffered slots in order, folding each texture color into the
            # running factor (-2 is the RESET sentinel a respawn records —
            # the new path's contributions take factor 1), and scale each
            # radiance segment by the factor at its position.  Exact: a
            # segment holds exactly the contributions between two chain
            # boundaries (ops/pallas_bounce.py regen loop).  Events arrive
            # PACKED (round 4): one i32 flat atlas texel index per slot,
            # computed in-kernel (textures.atlas_flat_index), so each slot
            # gathers 4 full-wavefront arrays (index + segment rgb) instead
            # of the 6 the (u, v, img) triple needed.
            nn = to.shape[0]
            one = V3.full((nn,), 1.0, 1.0, 1.0, real)
            if chain is not None:
                segs, buft = chain
                # Driver-side COMPACTION: measured NEGATIVE in round 3
                # against the UNPACKED chain (rtw_final 1.357 s -> 1.869 s:
                # compacting to event lanes must gather ~6K chain arrays
                # against the 12 nn it saves), default OFF
                # (ZWRT_CHAIN_CAP_DIV > 0 enables for A/B).  The packed
                # chain shifts the ratio (~4K+1 arrays to compact vs 4K+1
                # saved) — re-measure on hardware before changing the
                # default.
                has_ev = (buft[0] != -1) | (to >= 0)
                cnt = jnp.sum(has_ev.astype(jnp.int32))
                div = int(os.environ.get("ZWRT_CHAIN_CAP_DIV", "0"))
                cap = max(BLK, nn // div) if div > 0 else 0

                def _fold(bt_l, sg_l, to_l):
                    """Walk the K slots in order over arrays of size m;
                    returns (factor, radiance delta)."""
                    m = to_l.shape[0]
                    onem = V3.full((m,), 1.0, 1.0, 1.0, real)
                    factor = onem
                    rad = V3.zeros((m,), real)
                    for k in range(len(bt_l)):
                        bt = bt_l[k]

                        # slots empty across the whole wavefront (the
                        # common case for high k once the render tail
                        # thins) skip their atlas gather entirely
                        def _apply(args, k=k, bt=bt):
                            factor, rad = args
                            col = atlas_lookup_flat(
                                scene, jnp.maximum(bt, 0)
                            )
                            factor = V3.where(
                                bt == -2, onem,
                                V3.where(bt >= 0, factor * col, factor),
                            )
                            return factor, rad + sg_l[k] * factor

                        factor, rad = jax.lax.cond(
                            jnp.any(bt != -1), _apply, lambda a: a,
                            (factor, rad),
                        )
                    img_rgb = atlas_lookup_flat(
                        scene, jnp.maximum(to_l, 0)
                    )
                    factor = V3.where(to_l >= 0, factor * img_rgb, factor)
                    return factor, rad

                def _compact_branch(args):
                    throughput, radiance = args
                    idx = jnp.nonzero(has_ev, size=cap, fill_value=nn)[0]
                    fac_c, rad_c = _fold(
                        [b[idx] for b in buft],
                        [V3(s.x[idx], s.y[idx], s.z[idx]) for s in segs],
                        to[idx],
                    )
                    # OOB idx rows are dropped by the scatters
                    radiance = V3(
                        radiance.x.at[idx].add(rad_c.x),
                        radiance.y.at[idx].add(rad_c.y),
                        radiance.z.at[idx].add(rad_c.z),
                    )
                    throughput = V3(
                        throughput.x.at[idx].mul(fac_c.x),
                        throughput.y.at[idx].mul(fac_c.y),
                        throughput.z.at[idx].mul(fac_c.z),
                    )
                    return throughput, radiance

                def _full_branch(args):
                    throughput, radiance = args
                    factor, rad = _fold(buft, segs, to)
                    return throughput * factor, radiance + rad

                if cap:
                    throughput, radiance = jax.lax.cond(
                        cnt <= cap, _compact_branch, _full_branch,
                        (throughput, radiance),
                    )
                else:
                    throughput, radiance = _full_branch(
                        (throughput, radiance)
                    )
            else:
                # K = 0 (brute-trace image scenes, e.g. shrek): exit on
                # first event — events are dense across the wavefront, so
                # compaction would not pay; apply the packed event directly.
                img_rgb = atlas_lookup_flat(scene, jnp.maximum(to, 0))
                throughput = throughput * V3.where(
                    to >= 0, img_rgb, one
                )
        return RegenState(
            origin=origin, direction=direction, time=time,
            throughput=throughput, radiance=radiance, alive=alive,
            ray_id=ray_id, sample=sample, bounce=bounce,
            work=work if want_work else st.work,
        )

    final = jax.lax.while_loop(cond, body, state)
    if want_work:
        return final.radiance, final.work
    return final.radiance


def trace_paths(
    scene: CompiledScene,
    origin: V3,
    direction: V3,
    time: jnp.ndarray,
    seed,                    # u32 scalar
    ray_id: jnp.ndarray,     # (N,) u32 global ray ids
    max_depth: int,
    terminate_zero_throughput: bool = True,
    rr_start: int = 0,
    clamp: float = 0.0,
) -> V3:
    """Estimate radiance for a wavefront of rays.  Returns V3 of (N,).

    ``rr_start`` > 0 enables Russian roulette from that bounce index: a
    path entering bounce d >= rr_start continues with probability
    p = clamp(max(throughput), RR_P_MIN, 1) and survivors scale throughput
    by 1/p — an unbiased estimator-preserving tail cut (a PBRT-standard
    extension; the reference has no RR, so the default 0 keeps reference
    semantics and all goldens).  Gated OFF on image-texture scenes: the
    kernel defers atlas factors out of its live throughput, so an adaptive
    p would diverge between the Pallas and XLA formulations there.

    ``clamp`` > 0 enables the Cycles-style indirect clamp: any radiance
    contribution landed at bounce d >= 1 is luminance-scaled down to at
    most ``clamp`` — biased firefly suppression (direct light and the
    d = 0 background stay exact).  Same image-scene gate as RR.

    Stream compaction (permuting live paths to the wavefront front) was
    prototyped in round 1 and REMOVED: XLA scatter on TPU measured far
    slower than the dead-ray work it saves, and the Pallas kernels' scalar
    tile-skip already retires spatially coherent dead tiles for free."""
    n = origin.shape[0]
    state = PathState(
        origin=origin,
        direction=direction,
        time=time,
        throughput=V3.full((n,), 1.0, 1.0, 1.0, real),
        radiance=V3.zeros((n,), real),
        alive=jnp.ones((n,), bool),
        ray_id=ray_id,
    )

    from ..ops.trace import _use_pallas_backend

    use_bounce_kernel = _use_pallas_backend()
    if use_bounce_kernel:
        from ..ops.pallas_bounce import bounce_pallas, supports_bounce_kernel

        use_bounce_kernel = supports_bounce_kernel(scene)

    rr_on = rr_start > 0 and not scene.has_image_textures
    clamp_on = clamp > 0 and not scene.has_image_textures

    def bounce_kernel(depth, st: PathState) -> PathState:
        """Fused Pallas bounce (ops/pallas_bounce.py): trace + shade +
        scatter run in ONE kernel; image textures are multiplied in
        afterwards (the only non-fused piece)."""
        origin, direction, throughput, radiance, alive, (u, v, io) = (
            bounce_pallas(
                scene, st.origin, st.direction, st.time, st.ray_id,
                st.throughput, st.radiance, st.alive,
                seed, depth, T_MIN,
                terminate_zero=terminate_zero_throughput,
                rr_start=rr_start,
                clamp=clamp,
            )
        )
        if scene.has_image_textures:
            img_rgb = atlas_lookup(scene, jnp.maximum(io, 0), u, v)
            throughput = V3.where(io >= 0, throughput * img_rgb, throughput)
        return PathState(
            origin=origin, direction=direction, time=st.time,
            throughput=throughput, radiance=radiance, alive=alive,
            ray_id=st.ray_id,
        )

    def bounce(depth, st: PathState) -> PathState:
        if use_bounce_kernel:
            return bounce_kernel(depth, st)
        ray_id = st.ray_id
        # Per-bounce decorrelation: the (traced) depth folds into the stream
        # index — every draw is a pure function of (seed, ray_id, site).
        site = _BOUNCE_BASE + depth * _SITES_PER_BOUNCE
        u0, u1, u2, u3 = hashrng.uniform4(seed, ray_id, site)
        if scene.has_lights:
            u4, u5, u6, _ = hashrng.uniform4(seed, ray_id, site + 1)
        if scene.needs_gauss:
            # feeds only isotropic/fuzzy-metal; content-addressed draws make
            # skipping it bitwise-safe for scenes with neither
            gauss = hashrng.gauss3(seed, ray_id, site + 2)
        if rr_on:
            u_rr = hashrng.uniform1(seed, ray_id, site + 3)

        with named_zone("rayColor"):
            hit = closest_hit(
                scene, st.origin, st.direction, st.time, T_MIN, INF,
                active=st.alive,
            )
        det = shade_attrs(scene, hit, st.origin, st.direction, st.time)

        hit_any = hit.kind >= 0
        hitmask = st.alive & hit_any
        missed = st.alive & ~hit_any

        if clamp_on:
            # mirrors ops/pallas_bounce.py:_bounce_core _clamp_contrib
            def _clamp_contrib(c: V3) -> V3:
                lum = LUM_R * c.x + LUM_G * c.y + LUM_B * c.z
                s = jnp.where(
                    (depth >= 1) & (lum > clamp),
                    real(clamp) / jnp.maximum(lum, real(1e-20)),
                    real(1.0),
                )
                return c * s
        else:
            def _clamp_contrib(c: V3) -> V3:
                return c

        radiance = st.radiance + V3.where(
            missed,
            _clamp_contrib(st.throughput * scene.background),
            V3.zeros((n,), real),
        )

        mat_type = det.mat_type
        tex_rgb = texture_rgb(scene, det)

        # ---- emission (src/render.zig:232-240) ----
        is_emissive = mat_type == MAT_DIFFUSE_LIGHT
        emits = hitmask & is_emissive & det.front
        radiance = V3.where(
            emits, radiance + _clamp_contrib(st.throughput * tex_rgb),
            radiance,
        )

        # ---- metal (src/material.zig:163-178) ----
        reflected = v3.reflect(st.direction, det.normal)
        if scene.needs_gauss:
            fuzz = jnp.clip(det.fuzz, 0.0, 1.0)
            metal_dir = reflected + hashrng.unit_sphere(gauss) * fuzz
        else:
            metal_dir = reflected
        metal_ok = v3.dot(metal_dir, det.normal) > 0.0

        # ---- dielectric (src/material.zig:190-218) ----
        ri = det.refract
        index = jnp.where(det.front, 1.0 / ri, ri)
        unit_in = v3.normalize(st.direction)
        cos_theta = jnp.minimum(v3.dot(-unit_in, det.normal), 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        must_reflect = (index * sin_theta > 1.0) | (
            schlick_reflectance(cos_theta, ri) > u0
        )
        diel_dir = V3.where(
            must_reflect,
            v3.reflect(unit_in, det.normal),
            v3.refract(unit_in, det.normal, index),
        )

        # ---- diffuse sampling (lambertian cosine / isotropic sphere) ----
        basis = v3.ortho_basis(det.normal)
        cosine_dir = v3.onb_transform(basis, hashrng.cosine_direction_z(u1, u2))
        if scene.needs_gauss:
            is_iso = mat_type == MAT_ISOTROPIC
            # disjoint from metal by type
            sphere_dir = hashrng.unit_sphere(gauss)
            mat_sample_dir = V3.where(is_iso, sphere_dir, cosine_dir)
        else:
            mat_sample_dir = cosine_dir

        if scene.has_lights:
            # MixturePdf: 50/50 generator choice + averaged value
            # (src/pdf.zig:92-119, src/render.zig:254-263).
            light_dir = sample_light_direction(scene, det.point, u4, u5, u6)
            use_light = u3 < 0.5
            diff_dir = V3.where(use_light, light_dir, mat_sample_dir)
            mat_pdf = scattering_pdf(mat_type, det.normal, diff_dir)
            l_pdf = light_pdf_value(scene, det.point, diff_dir)
            sample_pdf = 0.5 * l_pdf + 0.5 * mat_pdf
            scatter_pdf = mat_pdf
        else:
            # CosinePdf fallback (src/render.zig:264-269).
            diff_dir = mat_sample_dir
            scatter_pdf = scattering_pdf(mat_type, det.normal, diff_dir)
            sample_pdf = scatter_pdf

        # Guard sample_pdf == 0 (e.g. a light-sampled direction exactly in
        # the plane of a coplanar lambertian: both the light PDF and the
        # cosine PDF vanish).  The reference debug-asserts here
        # (src/render.zig:255-256); we terminate the path with zero weight,
        # which is the correct Monte-Carlo treatment of a zero-probability
        # sample.
        pdf_ok = sample_pdf > 0.0
        diffuse_mult = tex_rgb * jnp.where(
            pdf_ok, scatter_pdf / jnp.where(pdf_ok, sample_pdf, 1.0), 0.0
        )

        # ---- combine by material type ----
        is_metal = mat_type == MAT_METAL
        is_diel = mat_type == MAT_DIELECTRIC
        is_spec = is_metal | is_diel

        new_dir = V3.where(
            is_spec, V3.where(is_metal, metal_dir, diel_dir), diff_dir
        )
        one = V3.full((n,), 1.0, 1.0, 1.0, real)
        mult = V3.where(
            is_metal,
            det.rgb,  # metal albedo lives in the record's rgb slot
            V3.where(is_diel, one, diffuse_mult),
        )

        survives = hitmask & ~is_emissive & ~(is_metal & ~metal_ok)
        throughput = V3.where(survives, st.throughput * mult, st.throughput)
        if terminate_zero_throughput:
            nonzero = (
                (throughput.x != 0.0)
                | (throughput.y != 0.0)
                | (throughput.z != 0.0)
            )
            survives = survives & nonzero
        if rr_on:
            # Russian roulette on the continuation: p from the INCOMING
            # throughput (identical in the kernel twin), applied from
            # bounce rr_start on.  This bounce's radiance contributions
            # (emission/background, weighted by incoming throughput) are
            # untouched; survivors carry the 1/p weight forward.
            p_rr = jnp.clip(
                jnp.maximum(
                    st.throughput.x,
                    jnp.maximum(st.throughput.y, st.throughput.z),
                ),
                RR_P_MIN, 1.0,
            )
            apply_rr = st.alive & (depth >= rr_start)
            survives = survives & ~(apply_rr & (u_rr >= p_rr))
            throughput = throughput * jnp.where(apply_rr, 1.0 / p_rr, 1.0)

        return PathState(
            origin=V3.where(hitmask, det.point, st.origin),
            direction=V3.where(hitmask, new_dir, st.direction),
            time=st.time,
            throughput=throughput,
            radiance=radiance,
            alive=survives,
            ray_id=st.ray_id,
        )

    # while_loop instead of fori_loop: the wavefront exits as soon as every
    # path has terminated (miss/emissive/absorption), which is typically far
    # before max_depth (the reference's recursion simply unwinds,
    # src/render.zig:199).
    def cond(carry):
        depth, st = carry
        return (depth < max_depth) & jnp.any(st.alive)

    def body(carry):
        depth, st = carry
        return depth + 1, bounce(depth, st)

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return final.radiance
