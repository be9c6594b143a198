"""The docs/EXTENDING.md worked example, run verbatim against an
independent oracle: a user-written model on the public engine surface
must solve correctly with no package changes."""
import jax.numpy as jnp
import numpy as np
from scipy.optimize import nnls as scipy_nnls

from admm_tpu.core.engine import (ProblemOps, make_batched_solver,
                                  make_fadmm_solver, make_state)
from admm_tpu.core.prox import l2norm, sqnorm
from admm_tpu.linalg import dot, gram, ridge_inverse


def _nnls_ops(X, y, dtype):
    n, p = X.shape
    rho = 1.0
    Minv = ridge_inverse(gram(X), rho)
    Xty = dot(X.T, y)
    return ProblemOps(
        next_x=lambda st: dot(Minv, Xty + st.rho * st.adj_z - st.adj_y),
        next_z=lambda st, x: (jnp.maximum(x + st.adj_y / st.rho, 0.0),
                              None),
        primal_residual=lambda st, x, z, aux: x - z,
        eps_primal_scale=lambda st: jnp.maximum(l2norm(st.x),
                                                l2norm(st.z)),
        eps_dual_scale=lambda st: l2norm(st.y),
        dual_residual=lambda st, z: st.rho * l2norm(z - st.z),
        combined_extra=lambda st, z: sqnorm(z - st.adj_z),
        dim_main=p, dim_dual=p,
    ), rho


def nnls(X, y, maxit=5000, eps=1e-9, dtype=jnp.float64):
    X = jnp.asarray(X, dtype)
    y = jnp.asarray(y, dtype)
    p = X.shape[1]
    ops, rho = _nnls_ops(X, y, dtype)
    solve = make_fadmm_solver(ops, adapt_rho=False)
    zp = jnp.zeros((p,), dtype)
    st = solve(make_state(zp, zp, zp, rho, 0.0), maxit, eps, eps)
    return st.z, st.it


def test_custom_nnls_matches_scipy():
    rng = np.random.default_rng(0)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(60, 12))
        y = rng.normal(size=60)
        b, it = nnls(X, y)
        b_ref, _ = scipy_nnls(X, y)
        assert np.abs(np.asarray(b) - b_ref).max() < 1e-6, seed
        assert np.all(np.asarray(b) >= 0)


def test_custom_model_batches_for_free():
    """The same user ops ride make_batched_solver unchanged (one lane
    per problem instance via the lam axis here unused — lanes differ
    by their dual cold starts only, so they must agree)."""
    from admm_tpu.core.engine import ADMMState

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 8))
    y = rng.normal(size=40)
    Xj = jnp.asarray(X, jnp.float64)
    yj = jnp.asarray(y, jnp.float64)
    ops, rho = _nnls_ops(Xj, yj, jnp.float64)
    solve = make_batched_solver(make_fadmm_solver(ops, adapt_rho=False))
    k, p = 3, 8
    Z = jnp.zeros((k, p), jnp.float64)
    ones = jnp.ones((k,), jnp.float64)
    st = ADMMState(x=Z, z=Z, y=Z, adj_z=Z, adj_y=Z, aux=None,
                   adj_a=ones, adj_c=9999.0 * ones, rho=rho * ones,
                   lam=0.0 * ones, eps_pri=0.0 * ones,
                   eps_dua=0.0 * ones, r_pri=9999.0 * ones,
                   r_dua=9999.0 * ones,
                   it=jnp.zeros((k,), jnp.int32),
                   done=jnp.zeros((k,), bool))
    st = solve(st, 5000, 1e-9, 1e-9)
    b_ref, _ = scipy_nnls(X, y)
    for lane in range(k):
        assert np.abs(np.asarray(st.z[lane]) - b_ref).max() < 1e-6
