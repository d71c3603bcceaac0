"""Per-op-class instruction census of the render megakernel.

Turns the roofline story ("the kernel is select/reduce-heavy, ~41-43% of
idealized VPU peak") into numbers: traces the production band renderer to
a jaxpr, descends into the Pallas kernel and its in-kernel bounce
while_loop, and counts primitive ops by class weighted by output element
count.  Classes separate the work the VPU retires at full rate (float
FMA-able arithmetic) from selects/compares/logic (1 op/lane but no FLOP),
integer RNG work, transcendentals, reduces, and memory ops.

The census is an instruction-count ESTIMATE over the traced program
(pre-XLA-fusion; Mosaic may fuse, dedup, or strength-reduce further), the
cross-check VERDICT r3 #3c names.  It also prints the hand FLOP model
bench.py carries (FLOPS_SPHERE_PRIM/QUAD_PRIM/SHADE_TAIL) next to the
counted float-arithmetic ops per lane-iteration so the two can be
compared directly.

Usage: python tools/op_census.py [scene] [depth]
Prints one JSON object (pretty) — paste the table into BASELINE.md.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# float ops the VPU retires as arithmetic (mul+add pairs may fuse to FMA)
_ARITH = {
    "add", "sub", "mul", "neg", "abs", "max", "min", "sign",
    "add_any", "fma",
}
_DIV_SQRT = {"div", "sqrt", "rsqrt", "pow", "integer_pow", "rem"}
_TRANSCENDENTAL = {
    "exp", "log", "sin", "cos", "tan", "atan2", "log1p", "expm1",
    "tanh", "erf", "logistic", "acos", "asin", "atan", "cbrt",
}
_COMPARE = {"lt", "le", "gt", "ge", "eq", "ne", "is_finite"}
_SELECT = {"select_n", "clamp"}
_LOGIC = {"and", "or", "not", "xor", "nand", "nor"}
_INT_BITS = {
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "population_count", "clz",
}
_REDUCE = {
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "reduce_prod", "argmax", "argmin", "all", "any",
}
_MEMORY = {
    "gather", "scatter", "scatter_add", "dynamic_slice",
    "dynamic_update_slice", "slice", "concatenate", "broadcast_in_dim",
    "reshape", "transpose", "squeeze", "rev", "pad", "iota", "copy",
    "masked_load", "masked_swap", "load", "swap", "get", "store",
}
_CAST = {"convert_element_type", "bitcast_convert_type"}


def _classify(prim: str, dtype) -> str:
    if prim in _REDUCE:
        return "reduce"
    if prim in _MEMORY:
        return "memory/layout"
    if prim in _CAST:
        return "cast"
    if prim in _SELECT:
        return "select"
    if prim in _COMPARE:
        return "compare"
    if prim in _LOGIC:
        return "logic"
    if prim in _INT_BITS:
        return "int-bits"
    is_float = dtype is not None and jnp.issubdtype(dtype, jnp.floating)
    if prim in _ARITH:
        return "float-arith" if is_float else "int-arith"
    if prim in _DIV_SQRT:
        return "div/sqrt"
    if prim in _TRANSCENDENTAL:
        return "transcendental"
    return "other"


def _out_elems(eqn) -> int:
    n = 0
    for v in eqn.outvars:
        aval = getattr(v, "aval", None)
        shape = getattr(aval, "shape", ())
        n = max(n, int(np.prod(shape)) if shape else 1)
    return n


def _out_dtype(eqn):
    for v in eqn.outvars:
        aval = getattr(v, "aval", None)
        if aval is not None and hasattr(aval, "dtype"):
            return aval.dtype
    return None


def _inner(x):
    return getattr(x, "jaxpr", x)


def _sub_jaxprs(eqn):
    """Sub-jaxprs of a higher-order eqn as (tag, jaxpr) pairs."""
    p = eqn.params
    name = eqn.primitive.name
    if name == "while":
        return [("while-cond", _inner(p["cond_jaxpr"])),
                ("while-body", _inner(p["body_jaxpr"]))]
    if name == "cond":
        return [("cond-branch", _inner(b)) for b in p["branches"]]
    if name == "scan":
        return [("scan-body", _inner(p["jaxpr"]))]
    if name == "pallas_call":
        return [("pallas-kernel", _inner(p["jaxpr"]))]
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p:
            return [(name, _inner(p[key]))]
    return []


def census(jaxpr, agg):
    """Count every primitive once (loop bodies once per ITERATION — trip
    counts are dynamic); cond branches take the LARGEST branch."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        subs = _sub_jaxprs(eqn)
        if subs:
            if name == "cond":
                # estimate with the heaviest branch (the skip branch of
                # a guard cond is near-empty)
                best, best_total = None, -1
                for _, sub in subs:
                    trial = {}
                    census(sub, trial)
                    total = sum(sum(d.values()) for d in trial.values())
                    if total > best_total:
                        best, best_total = trial, total
                for cls, d in best.items():
                    tgt = agg.setdefault(cls, {})
                    for k, v in d.items():
                        tgt[k] = tgt.get(k, 0) + v
            else:
                for _, sub in subs:
                    census(sub, agg)
            continue
        cls = _classify(name, _out_dtype(eqn))
        d = agg.setdefault(cls, {})
        d[name] = d.get(name, 0) + _out_elems(eqn)


def find_pallas_bounce_loop(jaxpr, path=""):
    """Locate (pallas kernel jaxpr, largest while-body inside it)."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            kernel = _inner(eqn.params["jaxpr"])
            # largest while body inside the kernel = the bounce loop
            best, best_total = None, -1
            stack = [kernel]
            while stack:
                j = stack.pop()
                for e in j.eqns:
                    for tag, sub in _sub_jaxprs(e):
                        if tag == "while-body":
                            trial = {}
                            census(sub, trial)
                            total = sum(
                                sum(d.values()) for d in trial.values()
                            )
                            if total > best_total:
                                best, best_total = sub, total
                        stack.append(sub)
            return kernel, best
        for _, sub in _sub_jaxprs(eqn):
            got = find_pallas_bounce_loop(sub, path + "/" + eqn.primitive.name)
            if got is not None:
                return got
    return None


def main() -> int:
    from zig_weekend_raytracer_tpu.models import load_scene
    from zig_weekend_raytracer_tpu.render.camera import camera_consts
    from zig_weekend_raytracer_tpu.render.renderer import (
        Renderer, _render_band_regen,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scene_name = args[0] if args else "cornell_box"
    depth = int(args[1]) if len(args) > 1 else 10
    width = height = 64
    spp = 64
    scene = load_scene(scene_name)
    r = Renderer(samples_per_pixel=spp, max_ray_bounce_depth=depth)
    s_par, band_rows = r.regen_geometry(
        width, height, spp,
        image_scene=scene.compiled.has_image_textures,
    )
    cam_c = camera_consts(scene.camera, width, height)

    def band(seed, y0, x0):
        return _render_band_regen(
            scene.compiled, seed, y0, x0,
            width=width, height=height, band_rows=band_rows,
            s_par=s_par, spp=spp, sample_limit=spp,
            max_depth=depth, sampler=r.sampler, has_dof=False,
            cam_consts=cam_c, rr=0, clamp=0.0,
        )

    jaxpr = jax.make_jaxpr(band)(
        jnp.uint32(0), jnp.int32(0), jnp.int32(0)
    )

    got = find_pallas_bounce_loop(jaxpr.jaxpr)
    assert got is not None, "no pallas_call found — is ZWRT_NO_PALLAS set?"
    kernel, bounce_body = got

    lanes = 8 * 128  # one (sublane, lane) tile
    out = {"scene": scene_name, "depth": depth, "tile_lanes": lanes}

    body_agg = {}
    census(bounce_body, body_agg)
    per_class = {
        cls: round(sum(d.values()) / lanes, 1)
        for cls, d in sorted(body_agg.items())
    }
    total_vec = sum(
        v for cls, v in per_class.items()
        if cls not in ("memory/layout",)
    )
    out["bounce_body_ops_per_lane"] = per_class
    out["bounce_body_vector_ops_per_lane"] = round(total_vec, 1)
    flop_like = (
        per_class.get("float-arith", 0)
        + 4 * per_class.get("div/sqrt", 0)
        + 8 * per_class.get("transcendental", 0)
    )
    out["bounce_body_float_flops_per_lane_est"] = round(flop_like, 1)
    out["share_float_arith"] = round(
        per_class.get("float-arith", 0) / total_vec, 3
    )
    out["share_select_compare_logic"] = round(
        (per_class.get("select", 0) + per_class.get("compare", 0)
         + per_class.get("logic", 0)) / total_vec, 3
    )
    out["share_int_rng"] = round(
        (per_class.get("int-arith", 0) + per_class.get("int-bits", 0))
        / total_vec, 3
    )

    # the hand model bench.py divides by the VPU peak (cornell counts)
    if scene_name == "cornell_box":
        import bench

        hand = (
            8 * bench.FLOPS_SPHERE_PRIM
            + 24 * bench.FLOPS_QUAD_PRIM
            + bench.FLOPS_SHADE_TAIL
        )
        out["hand_model_flops_per_lane"] = hand

    # top-15 heaviest individual primitives in the bounce body
    flat = [
        (f"{cls}:{k}", v / lanes)
        for cls, d in body_agg.items() for k, v in d.items()
    ]
    flat.sort(key=lambda kv: -kv[1])
    out["top_ops_per_lane"] = {k: round(v, 1) for k, v in flat[:15]}

    print(json.dumps(out, indent=1))

    if "--update-constants" in sys.argv and scene_name == "cornell_box":
        # bench.py's vreg-stream denominator counts cornell's bounce-body
        # vector ops per lane-iteration; keep the committed constant in
        # lockstep with the census that justifies it (VERDICT r4 weak #6).
        from vpu_peak import update_constants

        update_constants({
            "census_ops_per_iter": out["bounce_body_vector_ops_per_lane"],
            "census_tool": "tools/op_census.py",
            "census_scene": scene_name,
            "census_depth": depth,
        })
    return 0


if __name__ == "__main__":
    sys.exit(main())
