"""Group Lasso lambda-path solver (extension beyond the reference).

Model (Yuan & Lin 2006, glmnet/grpreg conventions)::

    minimize  1/(2n) ||y - X beta||^2 + lambda * sum_g w_g ||beta_g||_2

with feature groups g and weights ``w_g`` defaulting to sqrt(|g|).  The
reference package has no group penalty; on this framework it is a prox
swap on the same ADMM engines the Lasso uses (admm_tpu/core/engine.py):

* tall (n > p): FADMM with the cached ridge inverse
  (as reference: src/ADMMLassoTall.h) and the **block soft-threshold**
  z-update ``z_g = max(0, 1 - t_g/||v_g||) v_g`` with
  ``t_g = lambda w_g / rho``;
* wide (p >= n): linearized ADMM (as reference: src/ADMMLassoWide.h)
  with the same block prox at step ``lambda w_g/(rho gamma)``.

The all-zero threshold is ``lambda0 = max_g ||X_g'y||_2 / w_g`` (the KKT
boundary for beta = 0), replacing the Lasso's infinity-norm rule.
Group reductions are ``jax.ops.segment_sum`` with a static group count —
no dynamic shapes, so the whole path still jits into one XLA program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.engine import make_admm_solver, make_fadmm_solver, make_state
from ..data.standardize import recover, standardize
from ..linalg import dot, spectral_radius_gram
from .lasso import (PathResult, _scan_path, _tall_ops, _tall_setup,
                    _wide_ops)


def _group_prox_fn(groups, weights, l1_ratio: float = 0.0):
    """Block soft-threshold: per-group l2 shrinkage.

    ``groups``: (p,) int32 group ids in [0, G); ``weights``: (G,).
    Returns ``prox(v, t)`` applying threshold ``t * w_g`` to group g.

    ``l1_ratio > 0`` gives the SPARSE-GROUP LASSO prox (Simon et al.
    2013): the compound penalty ``t [l1_ratio ||.||_1 +
    (1 - l1_ratio) sum_g w_g ||.||_2]`` has the exact prox
    "coordinate soft-threshold, THEN group shrink" (the l1 prox
    preserves each group's direction, so the composition is the true
    prox of the sum) — within-group sparsity on top of group death.
    """
    from ..core.prox import soft_threshold

    G = int(weights.shape[0])

    def prox(v, t):
        if l1_ratio > 0.0:
            v = soft_threshold(v, t * l1_ratio)
        t_g = t * (1.0 - l1_ratio)
        gn2 = jax.ops.segment_sum(v * v, groups, num_segments=G)
        gn = jnp.sqrt(jnp.maximum(gn2, 1e-30))
        shrink = jnp.maximum(0.0, 1.0 - t_g * weights / gn)  # (G,)
        return v * shrink[groups]

    return prox


def normalize_groups(groups, p, weights, dtype):
    """Validate/relabel group ids to 0..G-1 and resolve weights.

    Shared by the serial, consensus, and CV drivers.  Weights default to
    sqrt(group size) (Yuan & Lin); zero weights mean "unpenalized";
    negative weights are rejected.
    """
    import numpy as np

    groups_np = np.asarray(groups)
    if groups_np.shape != (p,):
        raise ValueError("groups must have one entry per column of x")
    uniq = np.unique(groups_np)
    if not np.array_equal(uniq, np.arange(uniq.size)):
        groups_np = np.searchsorted(uniq, groups_np)  # relabel to 0..G-1
    G = int(groups_np.max()) + 1
    if weights is None:
        sizes = np.bincount(groups_np, minlength=G)
        weights = np.sqrt(sizes.astype(np.float64))
    weights_np = np.asarray(weights, np.float64)
    if weights_np.shape != (G,):
        raise ValueError(f"weights must have one entry per group ({G})")
    if np.any(weights_np < 0):
        raise ValueError("group weights must be nonnegative")
    return jnp.asarray(groups_np, jnp.int32), jnp.asarray(weights_np,
                                                          dtype)


class _GroupProblem(NamedTuple):
    groups: jnp.ndarray   # (p,) int32
    weights: jnp.ndarray  # (G,)
    l1_ratio: float = 0.0  # sparse-group mix (0 = pure group lasso)


def _gl_lambda0(Xs, ys, groups, weights, l1_ratio: float = 0.0):
    """KKT boundary for beta = 0: max over PENALIZED groups of
    ||X_g'y||_2 / w_g.  Zero-weight groups are unpenalized (glmnet
    convention) and never gate the grid (dividing by them would make
    lambda0 inf/NaN and poison the whole path).

    With ``l1_ratio > 0`` (sparse-group lasso) the exact boundary has
    no closed form; the grid top is the per-group minimum of two
    SUFFICIENT thresholds — the pure-group bound
    ``||c_g|| / ((1-a) w_g)`` and the pure-l1 bound ``||c_g||_inf / a``
    — each of which alone nulls the group, so their min is a valid
    (possibly slightly loose) upper bound that reduces exactly to the
    group rule at a=0 and the lasso rule at a=1.
    """
    G = int(weights.shape[0])
    Xty = dot(Xs.T, ys)
    gn = jnp.sqrt(jax.ops.segment_sum(Xty * Xty, groups, num_segments=G))
    if l1_ratio <= 0.0:
        ratios = jnp.where(weights > 0,
                           gn / jnp.maximum(weights, 1e-30), 0.0)
        return jnp.max(ratios)
    ginf = jax.ops.segment_max(jnp.abs(Xty), groups, num_segments=G)
    bound_l1 = ginf / l1_ratio
    bound_grp = jnp.where(
        (weights > 0) & (l1_ratio < 1.0),
        gn / jnp.maximum((1.0 - l1_ratio) * weights, 1e-30), jnp.inf)
    return jnp.max(jnp.minimum(bound_grp, bound_l1))


def _gl_tall_engine(Xs, ys, lam_first, rho0, gp):
    """Engine triple (cold state, solver, reported iterate) for the
    tall group-Lasso: the Lasso tall engine with the z-prox swapped."""
    n, p = Xs.shape
    dtype = Xs.dtype
    Minv, Xty, rho = _tall_setup(Xs, ys, lam_first, rho0)
    prox = _group_prox_fn(gp.groups, gp.weights, gp.l1_ratio)

    # The Lasso tall ops with the z-update's prox swapped.
    base = _tall_ops(Minv, Xty, 1.0, p)

    def next_z(st, x_new):
        v = x_new + st.adj_y / st.rho
        return prox(v, st.lam / st.rho), st.aux

    ops = base._replace(next_z=next_z)
    solve = make_fadmm_solver(ops, adapt_rho=False)
    zeros = jnp.zeros((p,), dtype)
    st0 = make_state(zeros, zeros, zeros, rho, lam_first, dtype=dtype)
    return st0, solve, (lambda st: st.z)


def _solve_gl_tall(Xs, ys, ilams, rho0, maxit, eps_abs, eps_rel, gp,
                   trace_len=None):
    st0, solve, report = _gl_tall_engine(Xs, ys, ilams[0], rho0, gp)
    _, coefs, niter, traces = _scan_path(st0, solve, report,
                                         ilams, maxit, eps_abs, eps_rel,
                                         trace_len)
    return coefs, niter, traces


def _gl_wide_engine(Xs, ys, lam_first, rho0, gp):
    """Engine triple for the wide group-Lasso (linearized x-update with
    the block prox; adaptive rho as in the wide Lasso)."""
    n, p = Xs.shape
    dtype = Xs.dtype
    sprad = spectral_radius_gram(Xs)
    # Auto-rho (as reference: src/ADMMLassoWide.h:227-228).
    rho = jnp.where(rho0 > 0, jnp.asarray(rho0, dtype),
                    jnp.cbrt(lam_first / sprad))
    lambda0 = _gl_lambda0(Xs, ys, gp.groups, gp.weights, gp.l1_ratio)
    prox = _group_prox_fn(gp.groups, gp.weights, gp.l1_ratio)

    base = _wide_ops(Xs, ys, sprad, lambda0, 1.0, n, p)

    def next_x(st):
        tmp = st.aux + st.z + st.y / st.rho
        v = st.x - dot(Xs.T, tmp) / sprad
        x_new = prox(v, st.lam / (st.rho * sprad))
        return jnp.where(st.lam > lambda0 * (1.0 - 1e-5),
                         jnp.zeros_like(x_new), x_new)

    ops = base._replace(next_x=next_x)
    solve = make_admm_solver(ops, adapt_rho=True)
    st0 = make_state(jnp.zeros((p,), dtype), jnp.zeros((n,), dtype),
                     jnp.zeros((n,), dtype), rho, lam_first,
                     aux=jnp.zeros((n,), dtype), dtype=dtype)
    return st0, solve, (lambda st: st.x)


def _solve_gl_wide(Xs, ys, ilams, rho0, maxit, eps_abs, eps_rel, gp,
                   trace_len=None):
    st0, solve, report = _gl_wide_engine(Xs, ys, ilams[0], rho0, gp)
    _, coefs, niter, traces = _scan_path(st0, solve, report,
                                         ilams, maxit, eps_abs, eps_rel,
                                         trace_len)
    return coefs, niter, traces


@partial(jax.jit, static_argnames=("standardize_x", "intercept",
                                   "nlambda", "trace_len", "l1_ratio"))
def _gl_path(X, y, groups, weights, nlambda, lambda_min_ratio, user_lams,
             rho, maxit, eps_abs, eps_rel, obs_weights=None, *,
             standardize_x, intercept, trace_len=None, l1_ratio=0.0):
    n, p = X.shape
    Xs, ys, stats = standardize(X, y, standardize_x=standardize_x,
                                intercept=intercept, weights=obs_weights)
    gp = _GroupProblem(groups=groups, weights=weights,
                       l1_ratio=l1_ratio)
    if user_lams is None:
        lam0 = _gl_lambda0(Xs, ys, groups, weights, l1_ratio)
        lmax = lam0 / n * stats.scale_y
        lams = jnp.exp(jnp.linspace(jnp.log(lmax),
                                    jnp.log(lambda_min_ratio * lmax),
                                    nlambda))
    else:
        lams = user_lams
    ilams = lams * n / stats.scale_y
    if n > p:
        coefs, niter, traces = _solve_gl_tall(Xs, ys, ilams, rho, maxit,
                                              eps_abs, eps_rel, gp,
                                              trace_len)
    else:
        coefs, niter, traces = _solve_gl_wide(Xs, ys, ilams, rho, maxit,
                                              eps_abs, eps_rel, gp,
                                              trace_len)
    beta0, coef = recover(stats, coefs, standardize_x=standardize_x,
                          intercept=intercept)
    return PathResult(lambdas=lams, beta0=beta0, coef=coef, niter=niter,
                      trace=traces)


def group_lasso_path(X, y, groups, *, weights: Optional[jnp.ndarray] = None,
                     lambdas: Optional[jnp.ndarray] = None,
                     nlambda: int = 100,
                     lambda_min_ratio: Optional[float] = None,
                     standardize: bool = True, intercept: bool = True,
                     maxit: int = 10000, eps_abs: float = 1e-5,
                     eps_rel: float = 1e-5, rho: float = -1.0,
                     trace_len: Optional[int] = None,
                     obs_weights: Optional[jnp.ndarray] = None,
                     l1_ratio: float = 0.0, data_mesh=None,
                     dtype=jnp.float32) -> PathResult:
    """Solve the group-Lasso lambda path on device.

    ``groups`` is a length-p array of group ids (0..G-1, any order);
    ``weights`` defaults to sqrt(group size) (Yuan & Lin).
    ``l1_ratio`` (extension — the SPARSE-GROUP LASSO of Simon et al.
    2013): mixes a coordinate l1 term into the penalty,
    ``lambda [l1_ratio ||b||_1 + (1 - l1_ratio) sum_g w_g ||b_g||]`` —
    within-group sparsity on top of group selection, via the exact
    compound prox (soft-threshold then group shrink).  0 (default) is
    the pure group lasso; 1 is the plain Lasso.

    ``obs_weights`` (extension — glmnet's ``weights`` argument, named
    to avoid colliding with the GROUP weights): observation weights;
    the sqrt(w) row scaling of the shared standardization makes the
    quadratic loss, the lambda grid and the KKT boundary weighted
    (data/standardize.py).  Other arguments mirror
    :func:`admm_tpu.models.lasso.lasso_path`, including ``trace_len``
    (per-iteration residual trace).
    """
    X = jnp.asarray(X, dtype)
    y = jnp.asarray(y, dtype)
    if data_mesh is not None:
        # Operator parallelism (the lasso_path(data_mesh=) pattern):
        # X/y row-sharded, so the standardization moments and the
        # tall/wide Gram builds distribute; iteration state replicated.
        from ..parallel.mesh import put_dim_sharded

        X = put_dim_sharded(X, data_mesh, 0)
        y = put_dim_sharded(y, data_mesh, 0)
    n, p = X.shape
    groups_j, weights = normalize_groups(groups, p, weights, dtype)
    if lambda_min_ratio is None:
        lambda_min_ratio = 0.01 if n < p else 1e-4
    lams = (None if lambdas is None
            else jnp.sort(jnp.asarray(lambdas, dtype))[::-1])
    if not 0.0 <= l1_ratio <= 1.0:
        raise ValueError("l1_ratio must be in [0, 1]")
    ow = None if obs_weights is None else jnp.asarray(obs_weights, dtype)
    return _gl_path(X, y, groups_j, weights, int(nlambda),
                    lambda_min_ratio, lams, rho, maxit, eps_abs, eps_rel,
                    ow, standardize_x=standardize, intercept=intercept,
                    trace_len=(None if trace_len is None
                               else int(trace_len)),
                    l1_ratio=float(l1_ratio))
