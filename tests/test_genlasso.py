"""Generalized Lasso (fused lasso / trend filtering) tests.

Extension beyond the reference.  Oracles: (a) D = I must reduce exactly
to the Lasso path; (b) the fused-lasso signal approximator (X = I) has
an exact dual — a box-constrained least-squares problem solved by
scipy.optimize.lsq_linear — giving a ground-truth solution."""
import numpy as np
import pytest

from admm_tpu.models.genlasso import (difference_matrix, fused_lasso_path,
                                      gen_lasso_path)


def test_difference_matrix():
    D1 = difference_matrix(5, 1)
    assert D1.shape == (4, 5)
    np.testing.assert_array_equal(D1 @ np.arange(5.0), np.ones(4))
    D2 = difference_matrix(5, 2)
    assert D2.shape == (3, 5)
    np.testing.assert_array_equal(D2 @ np.arange(5.0) ** 2,
                                  np.full(3, 2.0))


def test_identity_D_reduces_to_lasso():
    """gen_lasso_path(D=I) must match lasso_path (same objective)."""
    from admm_tpu.models.lasso import lasso_path

    rng = np.random.default_rng(5)
    n, p = 200, 30
    b = np.zeros(p)
    b[:6] = rng.uniform(1, 2, 6)
    X = rng.normal(size=(n, p))
    y = X @ b + 0.3 * rng.normal(size=n)
    lams = np.geomspace(0.5, 0.01, 10)

    g = gen_lasso_path(X, y, np.eye(p), lambdas=lams, intercept=False,
                       eps_abs=1e-6, eps_rel=1e-6)
    l = lasso_path(X, y, lambdas=lams, standardize=False,
                   intercept=False, eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(g.coef), np.asarray(l.coef),
                               atol=2e-3)


def _tv_oracle(y, t):
    """Exact fused-lasso signal approximator via the dual:
    min_b 1/2||y - b||^2 + t ||D b||_1  <=>  b = y - D'v*,
    v* = argmin ||y - D'v||^2 s.t. |v| <= t  (box-constrained LSQ)."""
    from scipy.optimize import lsq_linear

    n = y.shape[0]
    Dt = difference_matrix(n, 1).T           # (n, n-1)
    res = lsq_linear(Dt, y, bounds=(-t, t), tol=1e-12)
    return y - Dt @ res.x


def test_fused_lasso_matches_exact_dual_oracle():
    rng = np.random.default_rng(9)
    n = 80
    truth = np.concatenate([np.zeros(30), 2.0 * np.ones(30),
                            -1.0 * np.ones(20)])
    y = truth + 0.3 * rng.normal(size=n)
    X = np.eye(n)
    lams = np.array([0.05, 0.01])
    res = fused_lasso_path(X, y, lambdas=lams, intercept=False,
                           eps_abs=1e-7, eps_rel=1e-7)
    for i, lam in enumerate(np.asarray(res.lambdas)):
        exact = _tv_oracle(y, n * float(lam))  # objective is 1/(2n)-scaled
        np.testing.assert_allclose(np.asarray(res.coef[i]), exact,
                                   atol=2e-3)


def test_fused_lasso_recovers_changepoints():
    rng = np.random.default_rng(3)
    n = 120
    truth = np.concatenate([np.ones(40), 3.0 * np.ones(40),
                            np.zeros(40)])
    y = truth + 0.2 * rng.normal(size=n)
    res = fused_lasso_path(np.eye(n), y, lambdas=np.array([0.02]),
                           intercept=False)
    b = np.asarray(res.coef[0])
    jumps = np.abs(np.diff(b)) > 0.15
    assert jumps[39] and jumps[79]          # the two true changepoints
    assert jumps.sum() <= 6                  # and few spurious ones


def test_trend_filtering_piecewise_linear():
    rng = np.random.default_rng(7)
    n = 100
    t = np.arange(n, dtype=float)
    truth = np.where(t < 50, t * 0.1, 5.0 - (t - 50) * 0.05)
    y = truth + 0.2 * rng.normal(size=n)
    res = fused_lasso_path(np.eye(n), y, order=2,
                           lambdas=np.array([0.05]), intercept=False)
    b = np.asarray(res.coef[0])
    assert np.max(np.abs(b - truth)) < 0.5
    # second differences are sparse (piecewise linear fit)
    d2 = difference_matrix(n, 2) @ b
    assert (np.abs(d2) > 1e-2).sum() <= 8


def test_genlasso_intercept_centering():
    """Adding a constant to y must move beta0 only."""
    rng = np.random.default_rng(11)
    n, p = 150, 20
    X = rng.normal(size=(n, p))
    y = X[:, :4] @ np.ones(4) + 0.2 * rng.normal(size=n)
    D = difference_matrix(p, 1)
    lams = np.array([0.1, 0.02])
    a = gen_lasso_path(X, y, D, lambdas=lams, intercept=True)
    b = gen_lasso_path(X, y + 7.0, D, lambdas=lams, intercept=True)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.beta0),
                               np.asarray(a.beta0) + 7.0, atol=1e-3)


def test_genlasso_batch_scan_agree():
    rng = np.random.default_rng(2)
    n, p = 120, 25
    X = rng.normal(size=(n, p))
    y = X[:, :5] @ np.ones(5) + 0.2 * rng.normal(size=n)
    D = difference_matrix(p, 1)
    lams = np.geomspace(0.3, 0.02, 6)
    a = gen_lasso_path(X, y, D, lambdas=lams, path_mode="batch")
    s = gen_lasso_path(X, y, D, lambdas=lams, path_mode="scan")
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(s.coef),
                               atol=2e-3)


def test_genlasso_validates_D():
    with pytest.raises(ValueError, match="D must be"):
        gen_lasso_path(np.ones((10, 3)), np.ones(10), np.ones((2, 5)))


def test_auto_grid_rank_deficient_D_f64():
    """Stacked [I; D1] has linearly dependent rows (m > p), so DD' is
    singular: the auto lambda grid must stay finite under f64 (advisor
    r2: a zero f64 jitter silently produced an all-NaN grid)."""
    import jax.numpy as jnp

    from admm_tpu.models.genlasso import difference_matrix, gen_lasso_path

    rng = np.random.default_rng(0)
    n, p = 60, 20
    X = rng.normal(size=(n, p))
    y = rng.normal(size=n)
    D = np.vstack([np.eye(p), difference_matrix(p, 1)])
    res = gen_lasso_path(X, y, D, nlambda=8, maxit=500,
                         dtype=jnp.float64)
    assert np.all(np.isfinite(np.asarray(res.lambdas)))
    assert np.all(np.isfinite(np.asarray(res.coef)))


def test_tv2d_denoising():
    """2-D total variation (difference_matrix_2d on the generalized
    Lasso): a piecewise-constant image under noise is recovered with
    near-exact plateaus — the fused-lasso identity in both grid
    directions (X = I denoising)."""
    import jax.numpy as jnp

    from admm_tpu.models.genlasso import (difference_matrix_2d,
                                          gen_lasso_path)

    rng = np.random.default_rng(0)
    r, c = 8, 10
    img = np.zeros((r, c))
    img[2:6, 3:8] = 2.0        # one bright block
    y = (img + 0.2 * rng.normal(size=(r, c))).ravel()
    D = difference_matrix_2d((r, c))
    assert D.shape == (r * (c - 1) + (r - 1) * c, r * c)
    # gen_lasso_path's loss is 1/(2n)||y - b||^2, so the TV scale is
    # lam_tv / n (n = r*c rows of the identity design here).
    res = gen_lasso_path(np.eye(r * c), y, D, lambdas=[0.003],
                         intercept=False, dtype=jnp.float64,
                         eps_abs=1e-8, eps_rel=1e-8)
    rec = np.asarray(res.coef[0]).reshape(r, c)
    # Within each true plateau the reconstruction is (near-)constant,
    # and the two plateau means stay well separated.
    inside = rec[2:6, 3:8]
    outside = np.concatenate([rec[:2].ravel(), rec[6:].ravel(),
                              rec[2:6, :3].ravel(),
                              rec[2:6, 8:].ravel()])
    assert inside.std() < 0.12
    assert outside.std() < 0.12
    assert inside.mean() - outside.mean() > 1.0
