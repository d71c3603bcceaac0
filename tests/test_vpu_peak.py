"""The VPU-peak microkernels (tools/vpu_peak.py) must compute what the
FLOP accounting assumes: genuine per-chain recurrences (not foldable
no-ops).  Closed forms checked in interpret mode."""

import numpy as np
import pytest

from tools import vpu_peak


def _run(op, iters=40, chains=3, rows=8):
    import jax

    build = vpu_peak._kernels()
    fn = jax.jit(build(op, iters, chains, rows, True))
    return np.asarray(fn())


def test_fma_chain_matches_closed_form():
    iters, chains = 40, 3
    out = _run("fma", iters=iters, chains=chains)
    c, d = 0.999, 0.0005
    expect = sum(
        (1.0 + 0.001 * k) * c**iters + d * (1 - c**iters) / (1 - c)
        for k in range(chains)
    )
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_add_chain_matches_closed_form():
    iters, chains = 40, 3
    out = _run("add", iters=iters, chains=chains)
    expect = sum((1.0 + 0.001 * k) + iters * 0.0005 for k in range(chains))
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_select_chain_is_identity_below_threshold():
    chains = 3
    out = _run("select", chains=chains)
    expect = sum(1.0 + 0.001 * k for k in range(chains))
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_op_accounting_constants():
    # The rate math in measure() depends on these exact per-element costs.
    assert vpu_peak.OPS_PER_ELEM == {"fma": 1, "add": 1, "select": 2}
    assert vpu_peak.FLOPS_PER_ELEM == {"fma": 2, "add": 1, "select": 0}
