"""Measure the real VPU peak with pure-op Pallas microkernels (VERDICT r3 #3a).

bench.py's ``vpu_util_est`` previously divided by an ASSUMED v5e VPU peak
(1024 lanes x 2-FLOP FMA x 1.5 GHz = 3.07 TFLOP/s).  This tool replaces the
assumption with a measurement: three microkernels, each a register-resident
dependency chain with enough independent chains to hide ALU latency, no
memory traffic inside the loop, so the measured rate is the issue-limited
ceiling for that op class on this exact chip + compiler:

  * ``fma``:    a = a * c + d        (2 FLOP / lane-op)
  * ``add``:    a = a + c            (1 FLOP / lane-op; if ops/s matches fma,
                                      mul+add fuses to one issue slot)
  * ``select``: a = where(a > c, d, a)  (compare + select = 2 lane-ops,
                                      0 FLOP; prices the select/compare share
                                      of the bounce kernel's op mix)

Each kernel is swept over (rows, chains) shapes and the best rate reported.
Prints one JSON line: measured peaks + the implied honest denominator for
bench.py's roofline.  Run on hardware; the interpret-mode correctness of the
kernels is covered by tests/test_vpu_peak.py.

Usage: python tools/vpu_peak.py [--quick]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANE = 128


def _kernels():
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _chain_kernel(o_ref, *, iters, chains, rows, op):
        # Independent per-chain recurrences: the value feeds the next
        # iteration, so no compiler can collapse the loop; distinct chain
        # seeds stop common-subexpression merging across chains.
        c = jnp.float32(0.999)
        d = jnp.float32(0.0005)

        def body(_, accs):
            if op == "fma":
                return tuple(a * c + d for a in accs)
            if op == "add":
                return tuple(a + d for a in accs)
            # select: compare + select, value-dependent so the chain stays
            # live; threshold 2.0 is never crossed (accs stay ~O(1)).
            return tuple(jnp.where(a > 2.0, d, a) for a in accs)

        accs = tuple(
            jnp.full((rows, LANE), 1.0 + 0.001 * k, jnp.float32)
            for k in range(chains)
        )
        accs = lax.fori_loop(0, iters, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    def build(op, iters, chains, rows, interpret):
        return pl.pallas_call(
            functools.partial(
                _chain_kernel, iters=iters, chains=chains, rows=rows, op=op
            ),
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    import jax

    return build


# lane-ops per iteration per chain element (not FLOPs): fma/add issue one
# vector op per lane, select issues compare + select.
OPS_PER_ELEM = {"fma": 1, "add": 1, "select": 2}
FLOPS_PER_ELEM = {"fma": 2, "add": 1, "select": 0}


def measure(op, iters, chains, rows, reps=3, interpret=False):
    import jax

    build = _kernels()
    fn = jax.jit(build(op, iters, chains, rows, interpret))
    out = fn()
    float(out.sum())  # force completion (tunneled backend returns early)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(out.sum())
        best = min(best, time.time() - t0)
    elems = rows * LANE * chains * iters
    return {
        "op": op, "rows": rows, "chains": chains, "iters": iters,
        "time_s": round(best, 5),
        "gops": round(elems * OPS_PER_ELEM[op] / best / 1e9, 1),
        "gflops": round(elems * FLOPS_PER_ELEM[op] / best / 1e9, 1),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    iters = 50_000 if quick else 400_000
    results = []
    for op in ("fma", "add", "select"):
        for rows, chains in ((8, 8), (8, 16), (64, 4), (64, 8)):
            r = measure(op, iters, chains, rows)
            results.append(r)
            print(f"  {r}", file=sys.stderr)
    best = {
        op: max((r for r in results if r["op"] == op), key=lambda r: r["gops"])
        for op in ("fma", "add", "select")
    }
    out = {
        "vpu_peak_fma_tflops": round(best["fma"]["gflops"] / 1e3, 3),
        "vpu_peak_vector_gops": {op: best[op]["gops"] for op in best},
        "sweep": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
