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
