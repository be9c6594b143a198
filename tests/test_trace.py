"""Tests for the first-class residual tracing harness."""
from functools import partial

import jax.numpy as jnp
import numpy as np

from admm_tpu.core.engine import make_fadmm_solver, make_state
from admm_tpu.diag import format_trace, traced_solve
from admm_tpu.linalg import chol_inverse, dot, gram
from admm_tpu.models.lasso import _tall_ops


def test_traced_solve_matches_while_loop():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(60, 10)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(60,)), jnp.float32)
    rho = 5.0
    Minv = chol_inverse(gram(X) + rho * jnp.eye(10, dtype=jnp.float32))
    ops = _tall_ops(Minv, dot(X.T, y), 1.0, 10)
    solve = make_fadmm_solver(ops, adapt_rho=False)
    zeros = jnp.zeros((10,), jnp.float32)
    st0 = make_state(zeros, zeros, zeros, rho, 0.5, dtype=jnp.float32)

    ref = solve(st0, 100, 1e-5, 1e-5)
    body = partial(solve.body, eps_abs=1e-5, eps_rel=1e-5)
    fin, trace = traced_solve(body, st0, 100)

    assert int(fin.it) == int(ref.it)
    np.testing.assert_allclose(np.asarray(fin.z), np.asarray(ref.z),
                               atol=1e-6)
    n = int(trace.niter)
    rp = np.asarray(trace.resid_primal)[:n]
    assert rp[-1] < rp[0]  # residual decreased
    table = format_trace(trace)
    assert "resid_primal" in table and str(n - 1) in table
