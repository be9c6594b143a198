"""Observation weights for the gaussian Lasso/Enet path (extension —
glmnet's ``weights`` argument; the reference has none).

Semantics pinned three ways: against sklearn's sample_weight, against
exact row duplication for integer weights (including the weighted
standardization moments), and weights == ones must be bit-identical to
the unweighted path."""
import numpy as np

from admm_tpu.models.lasso import lasso_path


def _problem(n=250, p=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [1.5, -2.0, 1.0, 0.5]
    y = 1.0 + X @ b + 0.4 * rng.normal(size=n)
    return X, y, rng


def test_weights_match_sklearn_sample_weight():
    from sklearn.linear_model import Lasso

    X, y, rng = _problem()
    w = rng.uniform(0.2, 3.0, X.shape[0])
    lam = 0.08
    r = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                   intercept=True, weights=w, eps_abs=1e-7, eps_rel=1e-7)
    sk = Lasso(alpha=lam, fit_intercept=True, tol=1e-12,
               max_iter=500000)
    sk.fit(X, y, sample_weight=w)
    np.testing.assert_allclose(np.asarray(r.coef[0]), sk.coef_,
                               atol=1e-5)
    assert abs(float(r.beta0[0]) - sk.intercept_) < 1e-5


def test_integer_weights_equal_row_duplication():
    """Weight k == repeating the row k times, INCLUDING the weighted
    standardization moments (standardize=True default)."""
    X, y, rng = _problem()
    w = rng.integers(1, 4, X.shape[0]).astype(float)
    Xd = np.repeat(X, w.astype(int), axis=0)
    yd = np.repeat(y, w.astype(int))
    lams = np.array([0.2, 0.05])
    a = lasso_path(X, y, lambdas=lams, weights=w,
                   eps_abs=1e-7, eps_rel=1e-7)
    d = lasso_path(Xd, yd, lambdas=lams, eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.beta0), np.asarray(d.beta0),
                               atol=1e-5)


def test_unit_weights_identical_to_unweighted_grid_and_fit():
    X, y, _ = _problem()
    u = lasso_path(X, y, nlambda=8)
    o = lasso_path(X, y, nlambda=8, weights=np.ones(X.shape[0]))
    np.testing.assert_allclose(np.asarray(u.lambdas),
                               np.asarray(o.lambdas), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u.coef), np.asarray(o.coef),
                               atol=1e-6)


def test_weights_scale_invariance():
    """Multiplying all weights by a constant changes nothing (glmnet
    normalizes weights to sum to n)."""
    X, y, rng = _problem()
    w = rng.uniform(0.5, 2.0, X.shape[0])
    lams = np.array([0.1])
    a = lasso_path(X, y, lambdas=lams, weights=w)
    b = lasso_path(X, y, lambdas=lams, weights=17.0 * w)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Observation weights beyond the gaussian serial path (VERDICT r2
# missing #3): GLM families, group/generalized Lasso, consensus paths.
# ---------------------------------------------------------------------------

def test_logistic_weights_match_sklearn_sample_weight():
    """Weighted binomial path vs sklearn saga with sample_weight (the
    weights are pre-normalized to sum to n so both sides solve the
    identical objective 1/n sum w_i NLL_i + lam |b|_1)."""
    from sklearn.linear_model import LogisticRegression

    from admm_tpu.models.logistic import logistic_lasso_path

    rng = np.random.default_rng(2)
    n, p = 400, 12
    b = np.zeros(p)
    b[:4] = [1.5, -2.0, 1.0, 0.5]
    X = rng.normal(size=(n, p))
    yp = 1.0 / (1.0 + np.exp(-(0.3 + X @ b)))
    y = (rng.uniform(size=n) < yp).astype(float)
    w = rng.uniform(0.2, 3.0, n)
    w = w * n / w.sum()
    lam = 0.02
    r = logistic_lasso_path(X, y, lambdas=np.array([lam]),
                            standardize=False, weights=w,
                            eps_abs=1e-7, eps_rel=1e-7)
    sk = LogisticRegression(penalty="l1", C=1.0 / (n * lam),
                            solver="saga", tol=1e-10, max_iter=200000,
                            fit_intercept=True)
    sk.fit(X, y, sample_weight=w)
    np.testing.assert_allclose(np.asarray(r.coef[0]), sk.coef_[0],
                               atol=2e-4)
    assert abs(float(r.beta0[0]) - sk.intercept_[0]) < 2e-4


def test_glm_integer_weights_equal_row_duplication_per_family():
    """Weight k == repeating the row k times for EVERY GLM family,
    including the weighted standardization moments and the weighted
    lambda_max rule (auto grids must agree)."""
    from admm_tpu.models.glm import (binomial, glm_lasso_path, huber,
                                     poisson)

    rng = np.random.default_rng(4)
    n, p = 200, 10
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [1.0, -0.8, 0.5]
    w = rng.integers(1, 4, n).astype(float)
    Xd = np.repeat(X, w.astype(int), axis=0)

    eta = 0.4 + X @ b
    cases = {
        "binomial": (binomial(),
                     (rng.uniform(size=n) < 1 / (1 + np.exp(-eta)))
                     .astype(float)),
        "huber": (huber(1.345), eta + 0.3 * rng.normal(size=n)),
        "poisson": (poisson(), rng.poisson(np.exp(0.25 * eta))
                    .astype(float)),
    }
    for name, (fam, y) in cases.items():
        yd = np.repeat(y, w.astype(int))
        a = glm_lasso_path(X, y, fam, nlambda=5, weights=w,
                           eps_abs=1e-7, eps_rel=1e-7)
        d = glm_lasso_path(Xd, yd, fam, nlambda=5,
                           eps_abs=1e-7, eps_rel=1e-7)
        np.testing.assert_allclose(np.asarray(a.lambdas),
                                   np.asarray(d.lambdas), rtol=1e-5,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(a.coef),
                                   np.asarray(d.coef), atol=2e-4,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(a.beta0),
                                   np.asarray(d.beta0), atol=2e-4,
                                   err_msg=name)


def test_group_lasso_obs_weights_equal_row_duplication():
    from admm_tpu.models.grouplasso import group_lasso_path

    X, y, rng = _problem(n=200, p=12)
    groups = np.arange(12) % 4
    w = rng.integers(1, 4, X.shape[0]).astype(float)
    Xd = np.repeat(X, w.astype(int), axis=0)
    yd = np.repeat(y, w.astype(int))
    a = group_lasso_path(X, y, groups, nlambda=5, obs_weights=w,
                         eps_abs=1e-7, eps_rel=1e-7)
    d = group_lasso_path(Xd, yd, groups, nlambda=5,
                         eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(a.lambdas),
                               np.asarray(d.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=1e-4)


def test_genlasso_weights_equal_row_duplication():
    from admm_tpu.models.genlasso import fused_lasso_path

    rng = np.random.default_rng(6)
    n, p = 150, 12
    X = rng.normal(size=(n, p))
    bstep = np.repeat([1.0, -0.5, 0.8], 4)
    y = 0.5 + X @ bstep + 0.3 * rng.normal(size=n)
    w = rng.integers(1, 4, n).astype(float)
    Xd = np.repeat(X, w.astype(int), axis=0)
    yd = np.repeat(y, w.astype(int))
    a = fused_lasso_path(X, y, nlambda=5, weights=w,
                         eps_abs=1e-7, eps_rel=1e-7)
    d = fused_lasso_path(Xd, yd, nlambda=5, eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(a.lambdas),
                               np.asarray(d.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(a.beta0), np.asarray(d.beta0),
                               atol=2e-4)


def test_consensus_weights_match_serial_weighted():
    """Weighted consensus paths (gaussian AND GLM) must reproduce their
    serial weighted solvers over the 8-device mesh."""
    from admm_tpu.models.glm import huber, glm_lasso_path
    from admm_tpu.parallel.consensus import (parallel_glm_lasso_path,
                                             parallel_lasso_path)
    from admm_tpu.parallel.mesh import make_mesh

    X, y, rng = _problem(n=240, p=16)
    w = rng.uniform(0.2, 3.0, X.shape[0])
    lams = np.array([0.2, 0.05])
    par = parallel_lasso_path(X, y, nworkers=8, mesh=make_mesh(8),
                              lambdas=lams, weights=w,
                              eps_abs=1e-6, eps_rel=1e-6)
    ser = lasso_path(X, y, lambdas=lams, weights=w,
                     eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef), np.asarray(ser.coef),
                               atol=2e-3)

    yh = y.copy()
    yh[rng.choice(X.shape[0], 10, replace=False)] += 20.0
    parg = parallel_glm_lasso_path(X, yh, huber(1.345), nworkers=8,
                                   mesh=make_mesh(8),
                                   lambdas=np.array([0.08, 0.03]),
                                   weights=w, eps_abs=1e-6, eps_rel=1e-6)
    serg = glm_lasso_path(X, yh, huber(1.345),
                          lambdas=np.array([0.08, 0.03]), weights=w,
                          eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(parg.coef),
                               np.asarray(serg.coef), atol=2e-3)
    np.testing.assert_allclose(np.asarray(parg.beta0),
                               np.asarray(serg.beta0), atol=2e-3)


def test_matrix_families_integer_weights_equal_row_duplication():
    """Weight k == repeating the row k times for the matrix-variable
    families too (multi-task and multinomial)."""
    from admm_tpu.models.multinomial import multinomial_lasso_path
    from admm_tpu.models.multitask import multitask_lasso_path

    rng = np.random.default_rng(7)
    n, p, K = 150, 10, 3
    X = rng.normal(size=(n, p))
    B = np.zeros((p, K))
    B[:3] = rng.uniform(0.5, 1.5, (3, K))
    Y = X @ B + 0.3 * rng.normal(size=(n, K))
    w = rng.integers(1, 4, n).astype(float)
    Xd = np.repeat(X, w.astype(int), axis=0)
    Yd = np.repeat(Y, w.astype(int), axis=0)
    a = multitask_lasso_path(X, Y, nlambda=5, weights=w,
                             eps_abs=1e-7, eps_rel=1e-7)
    d = multitask_lasso_path(Xd, Yd, nlambda=5,
                             eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(a.lambdas),
                               np.asarray(d.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=2e-4)

    ylab = rng.integers(0, 3, n)
    yd = np.repeat(ylab, w.astype(int))
    am = multinomial_lasso_path(X, ylab, nlambda=5, weights=w,
                                eps_abs=1e-7, eps_rel=1e-7)
    dm = multinomial_lasso_path(Xd, yd, nlambda=5,
                                eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(am.lambdas),
                               np.asarray(dm.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(am.coef), np.asarray(dm.coef),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(am.beta0),
                               np.asarray(dm.beta0), atol=3e-4)
