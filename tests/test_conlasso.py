"""Equality-constrained lasso: KKT certificates, drop-column and
constrained-LS reductions, zero-sum properties."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.models.conlasso import (constrained_lasso_path,
                                      zerosum_lasso_path)
from admm_tpu.models.lasso import lasso_path


def _problem(n=200, p=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [2.0, -1.0, 1.5, -2.5]   # sums to zero
    y = X @ b + 0.3 * rng.normal(size=n)
    return X, y


def test_constraint_holds_to_tolerance_with_exact_support():
    X, y = _problem()
    res = zerosum_lasso_path(X, y, nlambda=8, dtype=jnp.float64,
                             eps_abs=1e-9, eps_rel=1e-9)
    # Support entries come from the constraint-feasible x iterate; the
    # dropped (exactly zero) entries are O(eps), so the constraint
    # holds to solver tolerance and tightens with eps.
    sums = np.asarray(res.coef).sum(axis=1)
    assert np.abs(sums).max() < 1e-7
    nnz = [(np.asarray(c) != 0).sum() for c in res.coef]
    assert nnz[0] < nnz[-1]      # exact zeros: support grows


def test_kkt_certificate_zero_sum():
    """At the optimum there is a multiplier nu with
    X'(Xb - y)/n + lam*g + C'nu = 0, g in the l1 subdifferential:
    recover nu by least squares on the active coordinates and check
    the zero coordinates fall inside [-lam, lam]."""
    X, y = _problem()
    n, p = X.shape
    lam = 0.05
    res = zerosum_lasso_path(X, y, lambdas=[lam], intercept=False,
                             dtype=jnp.float64, eps_abs=1e-11,
                             eps_rel=1e-11, maxit=50000)
    b = np.asarray(res.coef[0])
    grad = X.T @ (X @ b - y) / n
    act = np.abs(b) > 1e-8
    assert act.any()
    C = np.ones((1, p))
    # active rows: grad_A + lam*sign(b_A) + nu = 0  (C' = ones column)
    nu = -(grad[act] + lam * np.sign(b[act])).mean()
    resid = grad + nu
    assert np.abs(resid[act] + lam * np.sign(b[act])).max() < 5e-5
    if (~act).any():
        assert np.abs(resid[~act]).max() <= lam + 5e-5
    assert abs(b.sum()) < 1e-9


def test_single_zero_constraint_equals_drop_column():
    """C = e_j (force b_j = 0) must equal the lasso on the remaining
    columns — an exact reduction oracle."""
    X, y = _problem(p=12, seed=1)
    j = 3
    C = np.zeros((1, 12))
    C[0, j] = 1.0
    lams = [0.2, 0.08, 0.02]
    rc = constrained_lasso_path(X, y, C, lambdas=lams,
                                dtype=jnp.float64, eps_abs=1e-10,
                                eps_rel=1e-10)
    Xdrop = np.delete(X, j, axis=1)
    rl = lasso_path(Xdrop, y, lambdas=lams, standardize=False,
                    dtype=jnp.float64, eps_abs=1e-10, eps_rel=1e-10)
    ours = np.delete(np.asarray(rc.coef), j, axis=1)
    assert np.abs(np.asarray(rc.coef)[:, j]).max() < 1e-9
    assert np.abs(ours - np.asarray(rl.coef)).max() < 1e-6
    assert np.asarray(rc.beta0) == pytest.approx(np.asarray(rl.beta0),
                                                 abs=1e-6)


def test_lambda_zero_limit_is_constrained_ls():
    """lam -> 0 equals the direct KKT solve of equality-constrained
    least squares (independent numpy oracle)."""
    X, y = _problem(n=100, p=8, seed=2)
    n, p = X.shape
    C = np.vstack([np.ones(8), np.arange(8.0)])
    d = np.array([0.0, 1.0])
    res = constrained_lasso_path(X, y, C, d, lambdas=[1e-10],
                                 intercept=False, dtype=jnp.float64,
                                 eps_abs=1e-11, eps_rel=1e-11,
                                 maxit=50000)
    K = np.block([[X.T @ X / n, C.T], [C, np.zeros((2, 2))]])
    rhs = np.concatenate([X.T @ y / n, d])
    b_exact = np.linalg.solve(K, rhs)[:p]
    assert np.abs(np.asarray(res.coef[0]) - b_exact).max() < 1e-6
    assert np.abs(C @ np.asarray(res.coef[0]) - d).max() < 1e-9


def test_nonzero_rhs_and_grid():
    X, y = _problem(n=150, p=10, seed=3)
    C = np.ones((1, 10))
    d = np.array([2.0])
    res = constrained_lasso_path(X, y, C, d, nlambda=6,
                                 dtype=jnp.float64, eps_abs=1e-9,
                                 eps_rel=1e-9)
    sums = np.asarray(res.coef).sum(axis=1)
    assert np.abs(sums - 2.0).max() < 1e-6
    # Auto grid top nulls the solution when d = 0 (the reported iterate
    # is x — feasible exactly, zero to solver tolerance).
    r0 = zerosum_lasso_path(X, y, nlambda=5, dtype=jnp.float64,
                            eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(r0.coef[0])).max() < 1e-6


def test_batch_scan_and_weights():
    X, y = _problem(n=120, p=10, seed=4)
    rb = zerosum_lasso_path(X, y, nlambda=5, dtype=jnp.float64)
    rs = zerosum_lasso_path(X, y, nlambda=5, path_mode="scan",
                            dtype=jnp.float64)
    assert np.abs(np.asarray(rb.coef) - np.asarray(rs.coef)).max() < 1e-5
    w = np.ones(120)
    w[:8] = 2.0
    Xd = np.concatenate([X, X[:8]], axis=0)
    yd = np.concatenate([y, y[:8]])
    rw = zerosum_lasso_path(X, y, weights=w, lambdas=[0.1, 0.03],
                            dtype=jnp.float64, eps_abs=1e-9,
                            eps_rel=1e-9)
    rd = zerosum_lasso_path(Xd, yd, lambdas=[0.1, 0.03],
                            dtype=jnp.float64, eps_abs=1e-9,
                            eps_rel=1e-9)
    assert np.abs(np.asarray(rw.coef) - np.asarray(rd.coef)).max() < 1e-6


def test_validation():
    X, y = _problem(n=40, p=6)
    with pytest.raises(ValueError, match="ncol"):
        constrained_lasso_path(X, y, np.ones((1, 5)))
    with pytest.raises(ValueError, match="fewer constraints"):
        constrained_lasso_path(X, y, np.eye(6))
    with pytest.raises(ValueError, match="one entry per constraint"):
        constrained_lasso_path(X, y, np.ones((1, 6)), d=np.ones(2))
    with pytest.raises(ValueError, match="path_mode"):
        constrained_lasso_path(X, y, np.ones((1, 6)), path_mode="x")


def test_cv_onepass_matches_loop():
    from admm_tpu.models.cv import (cv_constrained_lasso_path,
                                    cv_zerosum_lasso_path)

    X, y = _problem(n=120, p=10, seed=5)
    kw = dict(nfolds=4, nlambda=5, seed=3, eps_abs=1e-7, eps_rel=1e-7)
    one = cv_zerosum_lasso_path(X, y, cv_mode="onepass", **kw)
    loop = cv_zerosum_lasso_path(X, y, cv_mode="loop", **kw)
    assert one.cvm == pytest.approx(loop.cvm, rel=1e-4, abs=1e-7)
    assert one.lambda_min == loop.lambda_min
    # Every fold fit honors the constraint (support-thresholded).
    assert abs(np.asarray(one.fit.coef).sum(axis=1)).max() < 1e-4
    # General C/d through the generic driver.
    C = np.vstack([np.ones(10)])
    cvc = cv_constrained_lasso_path(X, y, C, d=np.array([1.0]),
                                    nfolds=3, nlambda=4)
    assert np.all(np.isfinite(cvc.cvm))
