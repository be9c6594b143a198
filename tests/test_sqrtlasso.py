"""Square-root lasso: KKT certificate, exact lasso reduction, scale
equivariance (the pivotal property), both protocols."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.models.lasso import lasso_path
from admm_tpu.models.sqrtlasso import l2_prox, sqrt_lasso_path


def _problem(n=200, p=25, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [2.0, -1.5, 1.0, 0.7]
    y = X @ b + 0.5 * rng.normal(size=n)
    return X, y


def test_l2_prox_properties():
    rng = np.random.default_rng(1)
    v = rng.normal(size=10)
    tau = 0.5
    z = np.asarray(l2_prox(jnp.asarray(v), tau))
    # Norm shrinks by exactly tau (outside the ball).
    assert np.linalg.norm(z) == pytest.approx(np.linalg.norm(v) - tau)
    # Direction preserved.
    assert np.abs(z / np.linalg.norm(z)
                  - v / np.linalg.norm(v)).max() < 1e-12
    # Inside the ball -> 0.
    assert np.all(np.asarray(l2_prox(jnp.asarray(0.1 * v /
                                                 np.linalg.norm(v)),
                                     tau)) == 0.0)


def test_kkt_and_lasso_reduction():
    """At the optimum with nonzero residual:
    X'r / (sqrt(n)||r||) = lam * subgradient — and therefore the
    solution EQUALS the lasso at lam_lasso = lam ||r|| / sqrt(n)
    (identical KKT systems): the self-oracle."""
    X, y = _problem()
    n = X.shape[0]
    lam = 0.15
    r = sqrt_lasso_path(X, y, lambdas=[lam], standardize=False,
                        intercept=False, dtype=jnp.float64,
                        eps_abs=1e-10, eps_rel=1e-10, maxit=50000)
    b = np.asarray(r.coef[0])
    res = y - X @ b
    g = X.T @ res / (np.sqrt(n) * np.linalg.norm(res))
    act = np.abs(b) > 1e-9
    assert act.sum() == 4
    assert np.abs(g[act] - lam * np.sign(b[act])).max() < 1e-8
    assert np.abs(g[~act]).max() <= lam + 1e-8
    lam_las = lam * np.linalg.norm(res) / np.sqrt(n)
    rl = lasso_path(X, y, lambdas=[lam_las], standardize=False,
                    intercept=False, dtype=jnp.float64, eps_abs=1e-10,
                    eps_rel=1e-10)
    assert np.abs(np.asarray(rl.coef[0]) - b).max() < 1e-8


def test_scale_equivariance():
    """The pivotal property: scaling y scales the solution at FIXED
    lam — exactly what the plain lasso lacks (its lam must track
    sigma)."""
    X, y = _problem(seed=2)
    lam = 0.12
    kw = dict(lambdas=[lam], standardize=False, intercept=False,
              dtype=jnp.float64, eps_abs=1e-10, eps_rel=1e-10,
              maxit=50000)
    b1 = np.asarray(sqrt_lasso_path(X, y, **kw).coef[0])
    b3 = np.asarray(sqrt_lasso_path(X, 3.0 * y, **kw).coef[0])
    assert np.abs(b3 - 3.0 * b1).max() < 1e-8
    # The lasso at the same lam does NOT satisfy this (sanity that the
    # property is nontrivial).
    l1 = np.asarray(lasso_path(X, y, lambdas=[lam], standardize=False,
                               intercept=False,
                               dtype=jnp.float64).coef[0])
    l3 = np.asarray(lasso_path(X, 3.0 * y, lambdas=[lam],
                               standardize=False, intercept=False,
                               dtype=jnp.float64).coef[0])
    assert np.abs(l3 - 3.0 * l1).max() > 1e-3


def test_auto_grid_and_protocols():
    X, y = _problem(seed=3)
    res = sqrt_lasso_path(X, y, nlambda=6, dtype=jnp.float64)
    nnz = [(np.asarray(c) != 0).sum() for c in res.coef]
    assert nnz[0] == 0           # exact null threshold (nudged)
    assert nnz[-1] > nnz[0]
    rs = sqrt_lasso_path(X, y, nlambda=6, dtype=jnp.float64,
                         path_mode="scan")
    assert np.abs(np.asarray(res.coef) - np.asarray(rs.coef)).max() < 1e-6
    # Standardize/intercept recovery round-trip: predictions at the
    # smallest lam approach the (well-conditioned) OLS fit.
    with pytest.raises(ValueError, match="path_mode"):
        sqrt_lasso_path(X, y, path_mode="nope")


def test_algorithms_agree():
    """Concomitant alternation (default) and the stacked splitting
    solve the same problem — coefficient agreement across the path, in
    both protocols."""
    X, y = _problem(seed=7)
    kw = dict(nlambda=5, dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9,
              maxit=50000)
    rc = sqrt_lasso_path(X, y, **kw)
    rs = sqrt_lasso_path(X, y, algorithm="stacked", **kw)
    assert np.abs(np.asarray(rc.coef) - np.asarray(rs.coef)).max() < 1e-6
    rcs = sqrt_lasso_path(X, y, path_mode="scan", **kw)
    assert np.abs(np.asarray(rc.coef) - np.asarray(rcs.coef)).max() < 1e-8
    with pytest.raises(ValueError, match="algorithm"):
        sqrt_lasso_path(X, y, algorithm="nope")


def test_weights_match_row_duplication():
    X, y = _problem(n=80, p=10, seed=5)
    w = np.ones(80)
    w[:6] = 2.0
    Xd = np.concatenate([X, X[:6]], axis=0)
    yd = np.concatenate([y, y[:6]])
    rw = sqrt_lasso_path(X, y, lambdas=[0.1, 0.03], weights=w,
                         dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    rd = sqrt_lasso_path(Xd, yd, lambdas=[0.1, 0.03], dtype=jnp.float64,
                         eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(rw.coef) - np.asarray(rd.coef)).max() < 1e-6


def test_cv_onepass_matches_loop():
    from admm_tpu.models.cv import cv_sqrt_lasso_path

    X, y = _problem(n=120, p=10, seed=6)
    kw = dict(nfolds=4, nlambda=5, seed=3, eps_abs=1e-7, eps_rel=1e-7)
    one = cv_sqrt_lasso_path(X, y, cv_mode="onepass", **kw)
    loop = cv_sqrt_lasso_path(X, y, cv_mode="loop", **kw)
    assert one.cvm == pytest.approx(loop.cvm, rel=1e-4, abs=1e-7)
    assert one.lambda_min == loop.lambda_min


def test_wide_regime_kkt_and_protocols():
    """p > n (the pivotal lasso's home regime): the concomitant
    alternation dispatches to the linearized wide inner engine; the
    KKT certificate, the lasso reduction, the exact null grid top and
    batch/scan agreement all hold."""
    rng = np.random.default_rng(11)
    n, p = 60, 150
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [2.0, -1.5, 1.0, 0.7]
    y = X @ b + 0.3 * rng.normal(size=n)
    lam = 0.25
    r = sqrt_lasso_path(X, y, lambdas=[lam], standardize=False,
                        intercept=False, dtype=jnp.float64,
                        eps_abs=1e-10, eps_rel=1e-10, maxit=100000)
    bb = np.asarray(r.coef[0])
    res = y - X @ bb
    g = X.T @ res / (np.sqrt(n) * np.linalg.norm(res))
    act = np.abs(bb) > 1e-7
    assert act.sum() >= 4
    assert np.abs(g[act] - lam * np.sign(bb[act])).max() < 1e-7
    assert np.abs(g[~act]).max() <= lam + 1e-7
    lam_las = lam * np.linalg.norm(res) / np.sqrt(n)
    rl = lasso_path(X, y, lambdas=[lam_las], standardize=False,
                    intercept=False, dtype=jnp.float64, eps_abs=1e-10,
                    eps_rel=1e-10)
    assert np.abs(np.asarray(rl.coef[0]) - bb).max() < 1e-6
    # Auto grid: exact null at the top.
    ra = sqrt_lasso_path(X, y, nlambda=5, dtype=jnp.float64,
                         eps_abs=1e-8, eps_rel=1e-8, maxit=100000)
    assert (np.asarray(ra.coef[0]) == 0).all()
    # Protocol agreement ABOVE the interpolation threshold: for p > n
    # small lambdas make the sqrt-lasso INTERPOLATE (sigma -> 0, the
    # solution set degenerates — module docstring), where different
    # warm-start routes legitimately reach different interpolators.
    good = np.array([0.6, 0.4, 0.25])
    rb = sqrt_lasso_path(X, y, lambdas=good, dtype=jnp.float64,
                         eps_abs=1e-9, eps_rel=1e-9, maxit=100000)
    rs = sqrt_lasso_path(X, y, lambdas=good, dtype=jnp.float64,
                         path_mode="scan", eps_abs=1e-9, eps_rel=1e-9,
                         maxit=100000)
    assert np.abs(np.asarray(rb.coef) - np.asarray(rs.coef)).max() < 1e-6
