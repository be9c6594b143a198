"""Sparse logistic regression (binomial Lasso / Elastic Net) by ADMM.

Extension beyond the reference (which is gaussian-only): the glmnet
binomial objective ::

    minimize  1/n sum_i [log(1 + exp(x_i'b + b0)) - y_i (x_i'b + b0)]
              + lambda (alpha ||b||_1 + (1-alpha)/2 ||b||_2^2)

with y in {0, 1} and the intercept unpenalized.

ADMM splitting ``b - z = 0`` with f = the smooth NLL and g = the
penalty (Boyd et al. 2011 section 8.2: "logistic regression" is the
canonical smooth-f ADMM instance).  The x-update has no closed form; it
is an INEXACT damped-Newton solve of ::

    argmin_b  NLL(b)/n + rho/2 ||b - v||^2,   v = adj_z - adj_y/rho

run for a fixed small number of steps per ADMM iteration — each step is
one (p, p) Hessian build ``X'WX/n + rho I`` (an MXU matmul), one
Cholesky solve, and one sigmoid pass.  Warm-started ADMM changes ``b``
little per iteration, so 2 steps reach Newton's quadratic regime;
inexact x-updates keep the ADMM convergence guarantees (Eckstein &
Bertsekas 1992).  The intercept rides as an unpenalized ones column
inside x (the LAD trick, admm_tpu/models/lad.py), so the z-prox simply
masks it out of the soft-threshold.

The whole lambda path is a warm-started ``lax.scan`` (the Lasso path's
protocol); ``path_mode="batch"`` vmaps the engine body into per-lane
(k, p, p) Hessians — fine for moderate p, memory-quadratic in p, so
scan is the default here (unlike the gaussian paths).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.engine import (ProblemOps, make_admm_solver,
                           make_batched_solver, make_state)
from ..core.prox import l2norm, soft_threshold, sqnorm
from ..linalg import dot
from .lasso import PathResult, _batched_cold_states, _scan_path

_NEWTON_STEPS = 2


def _sigmoid(u):
    return jax.nn.sigmoid(u)


def _logistic_ops(Xa, ys, n, q, pen_mask, alpha, newton_steps):
    """ProblemOps for the logistic ADMM.  ``Xa`` (n, q) includes the
    ones column when an intercept is fitted; ``pen_mask`` (q,) is 1 for
    penalized coordinates, 0 for the intercept."""
    import jax.scipy.linalg as jsl

    def newton(v, rho, b0):
        """Fixed-step damped Newton on NLL/n + rho/2 ||b - v||^2."""
        def step(_, b):
            u = dot(Xa, b)
            p = _sigmoid(u)
            grad = dot(Xa.T, p - ys) / n + rho * (b - v)
            w = p * (1.0 - p)
            H = dot(Xa.T * w[None, :], Xa) / n
            H = H + rho * jnp.eye(q, dtype=Xa.dtype)
            c, low = jsl.cho_factor(H)
            return b - jsl.cho_solve((c, low), grad)

        return jax.lax.fori_loop(0, newton_steps, step, b0)

    def next_x(st):
        # Plain-ADMM engine: the prox center uses (z, y), NOT the
        # adj_* extrapolations (those are FADMM-only state that the
        # plain engine never updates).
        v = st.z - st.y / st.rho
        # Warm Newton from the current iterate.
        return newton(v, st.rho, st.x)

    def next_z(st, x_new):
        v = x_new + st.y / st.rho
        # Elastic-net prox on penalized coords, identity on the
        # intercept (pen = lam * mask).
        pen = st.lam / st.rho * pen_mask
        zl1 = soft_threshold(v, alpha * pen)
        z = zl1 / (1.0 + pen * (1.0 - alpha))
        return z, st.aux

    return ProblemOps(
        next_x=next_x,
        next_z=next_z,
        primal_residual=lambda st, x, z, aux: x - z,
        eps_primal_scale=lambda st: jnp.maximum(l2norm(st.x),
                                                l2norm(st.z)),
        eps_dual_scale=lambda st: l2norm(st.y),
        dual_residual=lambda st, z_new: st.rho * l2norm(z_new - st.z),
        combined_extra=lambda st, z_new: sqnorm(z_new - st.adj_z),
        dim_main=q, dim_dual=q,
    )


def _logistic_engine(Xa, ys, lam_first, rho0, pen_mask, alpha,
                     newton_steps):
    n, q = Xa.shape
    dtype = Xa.dtype
    # rho ~ the NLL Hessian scale keeps the Newton subproblem and the
    # prox balanced; 1.0 works across standardized problems (the
    # logistic Hessian eigenvalues are <= ||X||^2/(4n) ~ O(1) after
    # standardization).
    rho = jnp.where(rho0 > 0, jnp.asarray(rho0, dtype),
                    jnp.asarray(1.0, dtype))
    ops = _logistic_ops(Xa, ys, n, q, pen_mask, alpha, newton_steps)
    solve = make_admm_solver(ops, adapt_rho=False)
    zeros = jnp.zeros((q,), dtype)
    st0 = make_state(zeros, zeros, zeros, rho, lam_first, dtype=dtype)
    return st0, solve, (lambda st: st.z)


@partial(jax.jit, static_argnames=("standardize_x", "intercept",
                                   "nlambda", "path_mode", "trace_len",
                                   "newton_steps"))
def _logit_path(X, y, nlambda, lambda_min_ratio, user_lams, rho, maxit,
                eps_abs, eps_rel, alpha, *, standardize_x, intercept,
                path_mode, trace_len=None,
                newton_steps=_NEWTON_STEPS):
    n, p = X.shape
    dtype = X.dtype
    if standardize_x:
        mean_x = jnp.mean(X, axis=0)
        sd_x = jnp.sqrt(jnp.mean((X - mean_x[None, :]) ** 2, axis=0))
        sd_x = jnp.where(sd_x > 0, sd_x, 1.0)
        Xs = (X - mean_x[None, :]) / sd_x[None, :]
    else:
        mean_x = jnp.zeros((p,), dtype)
        sd_x = jnp.ones((p,), dtype)
        Xs = X
    if intercept:
        Xa = jnp.concatenate([jnp.ones((n, 1), dtype), Xs], axis=1)
        pen_mask = jnp.concatenate([jnp.zeros((1,), dtype),
                                    jnp.ones((p,), dtype)])
    else:
        Xa = Xs
        pen_mask = jnp.ones((p,), dtype)
    q = Xa.shape[1]

    if user_lams is None:
        # glmnet binomial lambda_max: null-model probabilities pbar
        # give max_j |x_j'(y - pbar)| / (n alpha).
        pbar = jnp.mean(y) if intercept else jnp.asarray(0.5, dtype)
        lam0 = (jnp.max(jnp.abs(dot(Xs.T, y - pbar))) / n
                / jnp.maximum(alpha, 1e-3))
        lams = jnp.exp(jnp.linspace(
            jnp.log(lam0), jnp.log(lambda_min_ratio * lam0), nlambda))
    else:
        lams = user_lams
    # Internal penalty carried per-coordinate through pen_mask; the
    # engine's st.lam holds the USER-scale lambda (the ops divide by n
    # themselves via the NLL/n gradient).
    st0, solve, report = _logistic_engine(Xa, y, lams[0], rho, pen_mask,
                                          alpha, newton_steps)
    if path_mode == "batch":
        bsolve = make_batched_solver(solve)
        st = _batched_cold_states(lams.shape[0], q, st0.rho, lams, dtype)
        st = bsolve(st, maxit, eps_abs, eps_rel)
        coefs_a, niter, traces = st.z, st.it, None
    else:
        _, coefs_a, niter, traces = _scan_path(st0, solve, report, lams,
                                               maxit, eps_abs, eps_rel,
                                               trace_len)

    if intercept:
        b0_std, slopes_std = coefs_a[:, 0], coefs_a[:, 1:]
    else:
        b0_std = jnp.zeros((coefs_a.shape[0],), dtype)
        slopes_std = coefs_a
    coef = slopes_std / sd_x[None, :]
    beta0 = b0_std - slopes_std @ (mean_x / sd_x)
    return PathResult(lambdas=lams, beta0=beta0, coef=coef, niter=niter,
                      trace=traces)


def logistic_lasso_path(X, y, *, lambdas: Optional[jnp.ndarray] = None,
                        nlambda: int = 50,
                        lambda_min_ratio: float = 1e-2,
                        alpha: float = 1.0,
                        standardize: bool = True, intercept: bool = True,
                        maxit: int = 10000, eps_abs: float = 1e-5,
                        eps_rel: float = 1e-5, rho: float = -1.0,
                        path_mode: str = "scan",
                        trace_len: Optional[int] = None,
                        newton_steps: int = _NEWTON_STEPS,
                        dtype=jnp.float32) -> PathResult:
    """Solve the L1/elastic-net logistic regression lambda path.

    ``y`` must be 0/1 labels.  ``alpha`` mixes L1 and ridge as in the
    gaussian Elastic Net.  ``path_mode="scan"`` (default: warm-started
    sequential path); "batch" solves all lambdas as lanes but builds
    per-lane (p, p) Newton Hessians — quadratic memory in p, use for
    moderate p.  ``trace_len`` as in the Lasso path.
    """
    X = jnp.asarray(X, dtype)
    y = jnp.asarray(y, dtype).ravel()
    if trace_len is not None:
        path_mode = "scan"
        trace_len = int(trace_len)
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1] for the binomial path")
    lams = (None if lambdas is None
            else jnp.sort(jnp.asarray(lambdas, dtype))[::-1])
    return _logit_path(X, y, int(nlambda), lambda_min_ratio, lams, rho,
                       maxit, eps_abs, eps_rel, alpha,
                       standardize_x=standardize, intercept=intercept,
                       path_mode=path_mode, trace_len=trace_len,
                       newton_steps=int(newton_steps))
