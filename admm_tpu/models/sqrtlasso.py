"""Square-root LASSO: ``min ||y - X b||_2 / sqrt(n) + lam ||b||_1``.

Extension beyond the reference: the PIVOTAL lasso of Belloni,
Chernozhukov & Wang (2011) — replacing the squared loss by its square
root makes the optimal lam independent of the noise level sigma (the
lasso's lam must scale with sigma, which is unknown), so a single
universal grid tunes every noise regime.  Two properties fall out and
are tested: scale EQUIVARIANCE (``bhat(c y) = c bhat(y)`` at fixed
lam — false for the lasso) and an EXACT reduction to the lasso at the
data-dependent penalty ``lam_lasso = lam * ||rhat|| / sqrt(n)``
(matching KKT systems), which is the self-oracle.

ADMM splitting: the loss is nonsmooth but prox-friendly (an l2 NORM,
not its square) — stack the residual and the coefficients::

    A = [-X; I],  z = [r; w],  c = [-y; 0]
    f(b) = 0,     g(z) = ||r||_2 + lam_int ||w||_1

(the internal objective is the user's times sqrt(n):
``lam_int = lam * sqrt(n)``).  x-update: cached least squares
``(X'X + I)^{-1}`` (one-time inverse, iterations are matvecs);
z-update: BLOCK SHRINKAGE on r (the l2-norm prox
``v (1 - 1/(rho ||v||))_+``) and soft threshold on w; accelerated
FADMM with fixed rho.  The exact null threshold
``lam0 = ||X'y||_inf / (sqrt(n) ||y||)`` tops the auto grid.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.engine import (ProblemOps, make_batched_solver,
                           make_fadmm_solver, make_state)
from ..core.prox import l2norm, soft_threshold, sqnorm
from ..data.standardize import _guard, _sd_n
from ..linalg import chol_inverse, dot, gram
from .lasso import PathResult, _scan_path


def l2_prox(v, tau):
    """Prox of ``tau * ||.||_2`` (block shrinkage): shrink the norm by
    tau, zero inside the ball."""
    nv = jnp.sqrt(jnp.sum(v * v))
    scale = jnp.maximum(1.0 - tau / jnp.maximum(nv, 1e-30), 0.0)
    return scale * v


def _sqrt_ops(Xs, ys, Minv, n, p) -> ProblemOps:
    """z and the dual are single (n + p,) vectors — the residual block
    z[:n] and the coefficient block z[n:] (the engine's dual ascent
    adds rho * r elementwise, so the stacked representation is the
    natural one)."""
    def next_x(st):
        # argmin rho/2 || A b - z - c + y/rho ||^2 with A = [-X; I],
        # c = [-y; 0]: stationarity A'(A b - z - c + y/rho) = 0 gives
        # (X'X + I) b = X'(y - z_r + u_r/rho) + z_w - u_w/rho
        # (adj iterates: the FADMM engine extrapolates z and y).
        zr, zw = st.adj_z[:n], st.adj_z[n:]
        ur, uw = st.adj_y[:n], st.adj_y[n:]
        rhs = dot(Xs.T, ys - zr + ur / st.rho) + zw - uw / st.rho
        return dot(Minv, rhs)

    def next_z(st, x_new):
        Ax = dot(Xs, x_new)
        ur, uw = st.adj_y[:n], st.adj_y[n:]
        vr = ys - Ax + ur / st.rho          # prox target for r
        vw = x_new + uw / st.rho
        zr = l2_prox(vr, 1.0 / st.rho)
        zw = soft_threshold(vw, st.lam / st.rho)
        return jnp.concatenate([zr, zw]), Ax

    def primal_residual(st, x, z, aux):
        # A x - z - c with A = [-X; I], c = [-y; 0]:
        return jnp.concatenate([ys - aux - z[:n], x - z[n:]])

    def eps_primal_scale(st):
        ax = jnp.sqrt(sqnorm(st.aux) + sqnorm(st.x))
        return jnp.maximum(jnp.maximum(ax, l2norm(st.z)), l2norm(ys))

    def eps_dual_scale(st):
        # A' y = -X' u_r + u_w  (a p-vector: the blocks ADD).
        return l2norm(st.y[n:] - dot(Xs.T, st.y[:n]))

    def dual_residual(st, z_new):
        # rho ||A' B dz|| with B = -I: A'B dz = X' dz_r - dz_w.
        dz = z_new - st.z
        return st.rho * l2norm(dot(Xs.T, dz[:n]) - dz[n:])

    def combined_extra(st, z_new):
        return sqnorm(z_new - st.adj_z)

    return ProblemOps(
        next_x=next_x, next_z=next_z,
        primal_residual=primal_residual,
        eps_primal_scale=eps_primal_scale,
        eps_dual_scale=eps_dual_scale,
        dual_residual=dual_residual,
        combined_extra=combined_extra,
        dim_main=p, dim_dual=n + p,
    )


def _sqrt_auto_rho(ys, n, dtype):
    """Auto-rho = sqrt(n)/||ys|| = 1/sigma_hat(y): the iterate path is
    then EQUIVARIANT under y-scaling (the solution itself is — module
    docstring — so any fixed rho breaks iteration-count invariance),
    and a 4-shape chip sweep puts the optimum at c * sqrt(n)/||ys||
    with c in [0.3, 1.7] (DESIGN.md "sqrt-lasso rho"); c = 1."""
    return (jnp.sqrt(jnp.asarray(float(n), dtype))
            / jnp.maximum(l2norm(ys), 1e-30))


def _sqrt_engine(Xs, ys, lam_first, rho0):
    n, p = Xs.shape
    dtype = Xs.dtype
    rho = jnp.where(rho0 > 0, jnp.asarray(rho0, dtype),
                    _sqrt_auto_rho(ys, n, dtype))
    Minv = chol_inverse(gram(Xs) + jnp.eye(p, dtype=dtype),
                        jitter=1e-7 if dtype == jnp.float32 else 0.0)
    ops = _sqrt_ops(Xs, ys, Minv, n, p)
    solve = make_fadmm_solver(ops, adapt_rho=False)
    zp = jnp.zeros((p,), dtype)
    znp = jnp.zeros((n + p,), dtype)
    st0 = make_state(zp, znp, znp, rho, lam_first,
                     aux=jnp.zeros((n,), dtype), dtype=dtype)
    # Report the soft-thresholded w block (exact zeros).
    return st0, solve, (lambda st: st.z[n:])


@partial(jax.jit, static_argnames=("nlambda", "standardize_x",
                                   "intercept", "path_mode",
                                   "trace_len"))
def _sqrt_path_dev(X, y, nlambda, lambda_min_ratio, user_lams, rho0,
                   maxit, eps_abs, eps_rel, weights=None, *,
                   standardize_x, intercept, path_mode, trace_len=None):
    n, p = X.shape
    dtype = X.dtype
    w = None
    if weights is not None:
        w = jnp.asarray(weights, dtype).ravel()
        w = w * (n / jnp.sum(w))  # glmnet: weights sum to n
    wcol = jnp.ones((n,), dtype) if w is None else w

    def wmean(v, axis=None):
        ww = wcol if v.ndim == 1 else wcol[:, None]
        return jnp.sum(ww * v, axis=axis) / n

    mean_x = jnp.zeros((p,), dtype)
    mean_y = jnp.asarray(0.0, dtype)
    sd_x = jnp.ones((p,), dtype)
    Xs, ys = X, y
    if intercept:
        col_mean = wmean(X, axis=0)
        mean_y = wmean(y)
        Xs = X - col_mean[None, :]
        ys = y - mean_y
        mean_x = col_mean
    if standardize_x:
        c = X - wmean(X, axis=0)[None, :]
        sd_x = _guard(jnp.sqrt(jnp.sum(wcol[:, None] * c * c, axis=0)
                               / n), wmean(X, axis=0))
        Xs = Xs / sd_x[None, :]
    if w is not None:
        # sqrt(w) row scaling: the l2-norm loss becomes the WEIGHTED
        # norm ||diag(sqrt w)(y - Xb)|| — integer weight k is exactly
        # row repetition inside the squared sum (tested).
        sw = jnp.sqrt(w)
        Xs = Xs * sw[:, None]
        ys = ys * sw

    if user_lams is None:
        # Exact null threshold: b = 0 optimal iff
        # ||X'y||_inf / (sqrt(n) ||y||) <= lam.
        # 1e-4 nudge: at the boundary equality one coefficient sits at
        # machine scale and the cold solve crawls (the SLOPE grid-top
        # pattern).
        lam0 = (jnp.max(jnp.abs(dot(Xs.T, ys)))
                / (jnp.sqrt(jnp.asarray(float(n), dtype)) * l2norm(ys))
                * (1.0 + 1e-4))
        lams = jnp.exp(jnp.linspace(
            jnp.log(lam0), jnp.log(lambda_min_ratio * lam0), nlambda))
    else:
        lams = user_lams
    # Internal objective = user's * sqrt(n): lam_int = lam * sqrt(n).
    ilams = lams * jnp.sqrt(jnp.asarray(float(n), dtype))

    if path_mode == "batch":
        rho = jnp.where(rho0 > 0, jnp.asarray(rho0, dtype),
                        _sqrt_auto_rho(ys, n, dtype))
        Minv = chol_inverse(
            gram(Xs) + jnp.eye(p, dtype=dtype),
            jitter=1e-7 if dtype == jnp.float32 else 0.0)
        ops = _sqrt_ops(Xs, ys, Minv, n, p)
        solve = make_batched_solver(make_fadmm_solver(ops,
                                                      adapt_rho=False))
        from .lasso import _batched_cold_states

        k = ilams.shape[0]
        st = _batched_cold_states(k, p, rho, ilams, dtype, aux_dim=n)
        Znp = jnp.zeros((k, n + p), dtype)
        st = st._replace(z=Znp, y=Znp, adj_z=Znp, adj_y=Znp)
        st = solve(st, maxit, eps_abs, eps_rel)
        coefs, niter, traces = st.z[:, n:], st.it, None
    else:
        st0, solve, report = _sqrt_engine(Xs, ys, ilams[0], rho0)
        _, coefs, niter, traces = _scan_path(st0, solve, report, ilams,
                                             maxit, eps_abs, eps_rel,
                                             trace_len)
    coef = coefs / sd_x[None, :]
    beta0 = mean_y - coef @ mean_x
    return PathResult(lambdas=lams, beta0=beta0, coef=coef,
                      niter=niter, trace=traces)


def sqrt_lasso_path(X, y, *, lambdas: Optional[jnp.ndarray] = None,
                    nlambda: int = 30, lambda_min_ratio: float = 1e-2,
                    standardize: bool = True, intercept: bool = True,
                    maxit: int = 10000, eps_abs: float = 1e-6,
                    eps_rel: float = 1e-6, rho: float = -1.0,
                    path_mode: str = "batch",
                    trace_len: Optional[int] = None, weights=None,
                    dtype=jnp.float32) -> PathResult:
    """Solve the square-root-lasso path on device.

    The penalty scale is PIVOTAL: lam does not depend on the noise
    level (Belloni et al. recommend ``lam ~ c * Phi^{-1}(1 - a/(2p)) /
    sqrt(n)``); the auto grid tops at the exact null threshold.
    Tolerances default tighter than the lasso's (the nonsmooth loss
    flattens near the optimum)."""
    X = jnp.asarray(X, dtype)
    y = jnp.asarray(y, dtype)
    if path_mode not in ("batch", "scan"):
        raise ValueError("path_mode must be 'batch' or 'scan'")
    if trace_len is not None:
        path_mode = "scan"
        trace_len = int(trace_len)
    lams = (None if lambdas is None
            else jnp.sort(jnp.atleast_1d(
                jnp.asarray(lambdas, dtype)))[::-1])
    w = None if weights is None else jnp.asarray(weights, dtype)
    return _sqrt_path_dev(X, y, int(nlambda), lambda_min_ratio, lams,
                          rho, maxit, eps_abs, eps_rel, w,
                          standardize_x=standardize,
                          intercept=intercept, path_mode=path_mode,
                          trace_len=trace_len)


@partial(jax.jit, static_argnames=("standardize_x", "intercept"))
def _sqrt_fold_etas(X, y, lams, masks, fid, rho, maxit, eps_abs,
                    eps_rel, *, standardize_x, intercept):
    """Jitted core of the sqrt-lasso one-pass fold sweep (the cv.py
    _gaussian_fold_etas pattern): weight-0 held-out rows drop out of
    the weighted l2-norm loss exactly."""
    def one(mask):
        res = _sqrt_path_dev(X, y, 2, 1e-2, lams, rho, maxit, eps_abs,
                             eps_rel, mask, standardize_x=standardize_x,
                             intercept=intercept, path_mode="batch")
        return res.beta0[:, None] + dot(res.coef, X.T)

    etas = jax.vmap(one)(masks)
    return etas[fid, :, jnp.arange(fid.shape[0])]
