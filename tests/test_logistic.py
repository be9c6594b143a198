"""Sparse logistic regression (binomial Lasso) tests.

Extension beyond the reference (gaussian-only).  Oracle: sklearn
LogisticRegression(solver='saga') — saga, unlike liblinear, leaves the
intercept unpenalized, matching the glmnet objective this model
implements."""
import warnings

import numpy as np
import pytest

from admm_tpu.models.logistic import logistic_lasso_path

warnings.filterwarnings("ignore", category=FutureWarning)
warnings.filterwarnings("ignore", category=UserWarning)


def _problem(n=400, p=30, seed=0):
    rng = np.random.default_rng(seed)
    b = np.zeros(p)
    b[:5] = rng.uniform(1.0, 2.0, 5) * rng.choice([-1, 1], 5)
    X = rng.normal(size=(n, p))
    prob = 1.0 / (1.0 + np.exp(-(0.5 + X @ b)))
    y = (rng.uniform(size=n) < prob).astype(float)
    return X, y, b


def test_matches_sklearn_saga():
    from sklearn.linear_model import LogisticRegression

    X, y, _ = _problem()
    n = X.shape[0]
    lams = np.array([0.05, 0.02, 0.005])
    res = logistic_lasso_path(X, y, lambdas=lams, standardize=False,
                              eps_abs=1e-6, eps_rel=1e-6)
    for i, lam in enumerate(np.asarray(res.lambdas)):
        sk = LogisticRegression(penalty="l1", C=1.0 / (n * float(lam)),
                                solver="saga", tol=1e-10,
                                max_iter=200000,
                                fit_intercept=True).fit(X, y)
        np.testing.assert_allclose(np.asarray(res.coef[i]),
                                   sk.coef_.ravel(), atol=5e-4)
        assert abs(float(res.beta0[i])
                   - float(sk.intercept_[0])) < 5e-4


def test_support_recovery_and_lambda0():
    X, y, b = _problem()
    res = logistic_lasso_path(X, y, nlambda=20)
    # The auto grid's top lambda gives the all-zero model (the glmnet
    # lambda_max rule) ...
    assert np.abs(np.asarray(res.coef[0])).max() == 0.0
    # ... and an interior lambda recovers the true support.
    mid = np.asarray(res.coef[8])
    assert np.all(np.abs(mid[:5]) > 0.05)
    assert np.abs(mid[5:]).max() < np.abs(mid[:5]).min()


def test_standardize_invariance():
    """Column scaling must not change predictions when standardizing."""
    X, y, _ = _problem(n=300, p=12, seed=3)
    scales = np.exp(np.linspace(-2, 2, 12))
    lams = np.array([0.02])
    a = logistic_lasso_path(X, y, lambdas=lams, standardize=True)
    b = logistic_lasso_path(X * scales, y, lambdas=lams,
                            standardize=True)
    fa = np.asarray(a.beta0)[0] + X @ np.asarray(a.coef[0])
    fb = np.asarray(b.beta0)[0] + (X * scales) @ np.asarray(b.coef[0])
    np.testing.assert_allclose(fa, fb, atol=1e-3)


def test_elastic_net_alpha():
    """alpha < 1 shrinks without exact zeros at moderate lambda
    (ridge component) and still classifies."""
    X, y, _ = _problem()
    res = logistic_lasso_path(X, y, lambdas=np.array([0.02]), alpha=0.5,
                              standardize=False)
    coef = np.asarray(res.coef[0])
    pred = (1 / (1 + np.exp(-(np.asarray(res.beta0)[0] + X @ coef)))
            > 0.5)
    assert (pred == y.astype(bool)).mean() > 0.85


def test_batch_matches_scan():
    X, y, _ = _problem(n=250, p=15, seed=5)
    lams = np.geomspace(0.08, 0.01, 6)
    s = logistic_lasso_path(X, y, lambdas=lams, path_mode="scan")
    b = logistic_lasso_path(X, y, lambdas=lams, path_mode="batch")
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(s.coef),
                               atol=2e-3)


def test_trace_and_validation():
    X, y, _ = _problem(n=200, p=10, seed=7)
    res = logistic_lasso_path(X, y, lambdas=np.array([0.03]),
                              trace_len=64)
    assert res.trace.shape == (1, 64, 5)
    nrec = int((~np.isnan(np.asarray(res.trace)[0, :, 0])).sum())
    assert nrec == min(int(res.niter[0]), 64)
    with pytest.raises(ValueError, match="alpha"):
        logistic_lasso_path(X, y, alpha=0.0)


def test_cv_logistic_selects_sensible_lambda():
    from admm_tpu.models.cv import cv_logistic_path

    X, y, _ = _problem(n=360, p=24, seed=2)
    cv = cv_logistic_path(X, y, nfolds=4, nlambda=15)
    assert np.all(np.isfinite(cv.cvm)) and np.all(cv.cvsd >= 0)
    assert cv.lambda_1se >= cv.lambda_min
    # Deviance at lambda_min clearly beats the null model's.
    pbar = y.mean()
    null_dev = -2 * (pbar * np.log(pbar) + (1 - pbar) * np.log(1 - pbar))
    assert cv.cvm.min() < 0.75 * null_dev
    # Coefficients at lambda_min recover the support.
    i = int(np.argmin(np.abs(cv.lambdas - cv.lambda_min)))
    coef = np.asarray(cv.fit.coef[i])
    assert np.all(np.abs(coef[:5]) > 0.1)
