"""Robust PCA: sparse + low-rank decomposition by ADMM.

Extension beyond the reference: Principal Component Pursuit
(Candes, Li, Ma, Wright 2011) —

    minimize_{L, S}  ||L||_* + lambda ||S||_1   s.t.  L + S = M

the third classic matrix-variable ADMM application (with the graphical
lasso and the generalized Lasso), and like them a pure prox exchange:

* L-update: SINGULAR-VALUE THRESHOLDING — a fresh SVD of
  ``M - S - Y/rho`` each iteration with the singular values
  soft-thresholded at ``1/rho`` (the nuclear-norm prox);
* S-update: elementwise ``soft_threshold(M - L - Y/rho, lambda/rho)``;
* dual ascent on ``L + S - M``.

Nothing is factorized-and-cached, so (as with the graphical lasso) the
plain-ADMM ADAPTIVE rho ladder applies (reference:
src/ADMMBase.h:85-109) and the SVD rides XLA's matmul-dominated
one-sided Jacobi on the MXU.

Defaults follow the paper: ``lam = 1/sqrt(max(m, n))`` recovers the
exact (L0, S0) pair with high probability when L0 is incoherent
low-rank and S0 is sparse — which is also the oracle the tests pin
(exact recovery IS the certificate; tests/test_rpca.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.engine import ProblemOps, make_admm_solver, make_state
from ..core.prox import l2norm, soft_threshold
from ..linalg import dot


class RPCAResult(NamedTuple):
    """Low-rank + sparse decomposition ``M ~ low_rank + sparse``."""
    low_rank: jnp.ndarray  # (m, n) L
    sparse: jnp.ndarray    # (m, n) S (exact zeros)
    lam: jnp.ndarray       # the sparsity penalty used
    niter: jnp.ndarray     # int32 ADMM iterations
    trace: Optional[jnp.ndarray] = None


def svt(A, tau):
    """Singular-value thresholding: the prox of ``tau * ||.||_*``.

    HIGHEST-precision reconstruction: the product feeds the Boyd
    residuals, which floor above tolerance at the TPU's default bf16
    matmul accumulation (CLAUDE.md solve-path rule)."""
    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    return dot(U * jnp.maximum(s - tau, 0.0)[None, :], Vt)


def _rpca_ops(M, m, n) -> ProblemOps:
    def next_x(st):
        # L-update: SVT of M - S - Y/rho at threshold 1/rho.
        return svt(M - st.z - st.y / st.rho, 1.0 / st.rho)

    def next_z(st, x_new):
        v = M - x_new - st.y / st.rho
        return soft_threshold(v, st.lam / st.rho), None

    return ProblemOps(
        next_x=next_x,
        next_z=next_z,
        primal_residual=lambda st, x, z, aux: x + z - M,
        eps_primal_scale=lambda st: jnp.maximum(
            jnp.maximum(l2norm(st.x), l2norm(st.z)), l2norm(M)),
        eps_dual_scale=lambda st: l2norm(st.y),
        dual_residual=lambda st, z_new: st.rho * l2norm(z_new - st.z),
        combined_extra=None,
        dim_main=m * n, dim_dual=m * n,
    )


@partial(jax.jit, static_argnames=("trace_len",))
def _rpca_dev(M, lam, rho0, maxit, eps_abs, eps_rel, trace_len=None):
    m, n = M.shape
    dtype = M.dtype
    ops = _rpca_ops(M, m, n)
    solve = make_admm_solver(ops, adapt_rho=True)
    # Paper default step (Candes et al. sec. 5): rho = m n / (4 ||M||_1)
    # balances the two prox thresholds on natural data scales.
    rho = jnp.where(rho0 > 0, jnp.asarray(rho0, dtype),
                    m * n / (4.0 * jnp.sum(jnp.abs(M)) + 1e-30))
    Z = jnp.zeros((m, n), dtype)
    st0 = make_state(Z, Z, Z, rho, lam, dtype=dtype)
    if trace_len is not None:
        from ..core.engine import make_traced_solve

        st, buf = make_traced_solve(solve, trace_len)(st0, maxit,
                                                      eps_abs, eps_rel)
        return RPCAResult(low_rank=st.x, sparse=st.z, lam=st.lam,
                          niter=st.it, trace=buf)
    st = solve(st0, maxit, eps_abs, eps_rel)
    return RPCAResult(low_rank=st.x, sparse=st.z, lam=st.lam,
                      niter=st.it, trace=None)


def _mc_ops(M, mask, m, n) -> ProblemOps:
    def next_x(st):
        # L-update: nuclear prox of the constraint-feasible iterate.
        return svt(st.z - st.y / st.rho, 1.0 / st.rho)

    def next_z(st, x_new):
        v = x_new + st.y / st.rho
        # Projection onto {Z : Z_ij = M_ij on observed entries}.
        return jnp.where(mask, M, v), None

    return ProblemOps(
        next_x=next_x,
        next_z=next_z,
        primal_residual=lambda st, x, z, aux: x - z,
        eps_primal_scale=lambda st: jnp.maximum(l2norm(st.x),
                                                l2norm(st.z)),
        eps_dual_scale=lambda st: l2norm(st.y),
        dual_residual=lambda st, z_new: st.rho * l2norm(z_new - st.z),
        combined_extra=None,
        dim_main=m * n, dim_dual=m * n,
    )


@partial(jax.jit, static_argnames=())
def _mc_dev(M, mask, rho0, maxit, eps_abs, eps_rel):
    m, n = M.shape
    dtype = M.dtype
    ops = _mc_ops(M, mask, m, n)
    solve = make_admm_solver(ops, adapt_rho=True)
    nobs = jnp.sum(mask)
    # Same balance heuristic as rpca, on the observed entries only.
    rho = jnp.where(rho0 > 0, jnp.asarray(rho0, dtype),
                    nobs / (4.0 * jnp.sum(jnp.abs(M) * mask) + 1e-30))
    Z0 = M * mask
    st0 = make_state(Z0, Z0, jnp.zeros((m, n), dtype), rho, 0.0,
                     dtype=dtype)
    st = solve(st0, maxit, eps_abs, eps_rel)
    return st.x, st.it


def matrix_complete(M, observed=None, *, rho: float = -1.0,
                    maxit: int = 5000, eps_abs: float = 1e-7,
                    eps_rel: float = 1e-6, dtype=jnp.float32):
    """Exact NUCLEAR-NORM MATRIX COMPLETION (Candes & Recht 2009):

        minimize ||L||_*   s.t.  L_ij = M_ij  on observed entries

    by the same SVT/projection ADMM as :func:`rpca`.  ``observed`` is a
    boolean mask (default: the nonzero entries of ``M``).  Returns
    ``(L, niter)``.  Oracle: exact completion of planted incoherent
    low-rank matrices at sufficient sampling (tests/test_rpca.py)."""
    M = jnp.asarray(M, dtype)
    if M.ndim != 2:
        raise ValueError("M must be a 2-D matrix")
    if observed is None:
        mask = M != 0
    else:
        mask = jnp.asarray(observed, bool)
        if mask.shape != M.shape:
            raise ValueError("observed mask must match M's shape")
    L, niter = _mc_dev(M, mask, jnp.asarray(rho, dtype), maxit,
                       eps_abs, eps_rel)
    return L, niter


def rpca(M, *, lam: Optional[float] = None, rho: float = -1.0,
         maxit: int = 5000, eps_abs: float = 1e-7, eps_rel: float = 1e-6,
         trace_len: Optional[int] = None,
         dtype=jnp.float32) -> RPCAResult:
    """Principal Component Pursuit: split ``M`` into a low-rank and a
    sparse part.  ``lam`` defaults to the paper's universal
    ``1/sqrt(max(m, n))``; ``rho`` to ``m n / (4 ||M||_1)``.  The
    tolerances default tighter than the regression families because
    exact recovery is the use case."""
    M = jnp.asarray(M, dtype)
    if M.ndim != 2:
        raise ValueError("M must be a 2-D matrix")
    m, n = M.shape
    if lam is None:
        lam = 1.0 / np.sqrt(max(m, n))
    if trace_len is not None:
        trace_len = int(trace_len)
    return _rpca_dev(M, jnp.asarray(lam, dtype), jnp.asarray(rho, dtype),
                     maxit, eps_abs, eps_rel, trace_len)
