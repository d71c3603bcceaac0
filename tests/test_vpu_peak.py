"""The VPU-peak microkernels (tools/vpu_peak.py) must compute what the
FLOP accounting assumes: genuine per-chain recurrences (not foldable
no-ops).  Closed forms checked in interpret mode."""

import numpy as np
import pytest

from tools import vpu_peak


C = 0.999  # runtime multiplier value passed by measure()


def _run(op, iters=40, chains=3, rows=8):
    import jax
    import jax.numpy as jnp

    build = vpu_peak._kernels()
    fn = jax.jit(build(op, iters, chains, rows, True))
    c = jnp.full((1, vpu_peak.LANE), C, jnp.float32)
    return np.asarray(fn(c))


def test_fma_chain_matches_closed_form():
    iters, chains = 40, 3
    out = _run("fma", iters=iters, chains=chains)
    c, d = C, 0.0005
    expect = sum(
        (1.0 + 0.001 * k) * c**iters + d * (1 - c**iters) / (1 - c)
        for k in range(chains)
    )
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_add_chain_matches_closed_form():
    # add step is c * 0.0005 (the scaled-runtime increment keeps the
    # chain unfoldable; the mul is loop-invariant and hoisted).
    iters, chains = 40, 3
    out = _run("add", iters=iters, chains=chains)
    expect = sum((1.0 + 0.001 * k) + iters * C * 0.0005 for k in range(chains))
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_select_chain_is_identity_below_threshold():
    chains = 3
    out = _run("select", chains=chains)
    expect = sum(1.0 + 0.001 * k for k in range(chains))
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_unroll_is_equivalent_to_more_iters():
    # unroll multiplies in-body work; iters x unroll must be what's
    # computed (the rate math counts elems * iters * unroll).
    import jax

    build = vpu_peak._kernels()
    import jax.numpy as jnp

    c = jnp.full((1, vpu_peak.LANE), C, jnp.float32)
    a = np.asarray(jax.jit(build("fma", 10, 3, 8, True, unroll=4))(c))
    b = np.asarray(jax.jit(build("fma", 40, 3, 8, True, unroll=1))(c))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_op_accounting_constants():
    # The rate math in measure() depends on these exact per-element costs.
    assert vpu_peak.OPS_PER_ELEM == {
        "fma": 1, "add": 1, "select": 2, "newton": 2,
    }
    assert vpu_peak.FLOPS_PER_ELEM == {
        "fma": 2, "add": 1, "select": 0, "newton": 3,
    }


def test_newton_chain_converges_to_reciprocal():
    # x*(2 - c*x) converges to 1/c and stays — the fold-proof probe.
    chains = 3
    out = _run("newton", iters=40, chains=chains)
    np.testing.assert_allclose(out, chains * (1.0 / C), rtol=1e-5)
