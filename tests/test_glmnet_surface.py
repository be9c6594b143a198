"""glmnet argument-surface extensions: exclude, dfmax/pmax, keep,
predict(type='coefficients'/'nonzero')."""
import numpy as np
import pytest

import admm_tpu
from admm_tpu.models.lasso import lasso_path


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(0)
    n, p = 200, 30
    X = rng.normal(size=(n, p))
    b = np.zeros(p); b[:5] = [1.0, -0.9, 0.8, -0.6, 0.5]
    y = X @ b + 0.4 * rng.normal(size=n)
    return X, y


def test_exclude_forces_zero_and_matches_drop_column(prob):
    X, y = prob
    res = lasso_path(X, y, nlambda=12, exclude=[0, 3])
    c = np.asarray(res.coef)
    assert np.all(c[:, [0, 3]] == 0.0)
    assert np.any(c[:, 1] != 0.0)
    # Equivalent to deleting the columns (same grid): remaining
    # coefficients agree.
    keepc = [j for j in range(X.shape[1]) if j not in (0, 3)]
    ref = lasso_path(X[:, keepc], y, lambdas=np.asarray(res.lambdas))
    np.testing.assert_allclose(c[:, keepc], np.asarray(ref.coef),
                               atol=2e-4)
    with pytest.raises(ValueError):
        lasso_path(X, y, nlambda=5, exclude=[X.shape[1]])


def test_dfmax_pmax_truncate_path(prob):
    X, y = prob
    res = lasso_path(X, y, nlambda=30, dfmax=6)
    df = np.count_nonzero(np.asarray(res.coef), axis=1)
    assert df.max() <= 6 and res.lambdas.shape[0] < 30
    assert res.niter.shape[0] == res.lambdas.shape[0]
    r3 = lasso_path(X, y, nlambda=30, pmax=8)
    ever = np.logical_or.accumulate(
        np.asarray(r3.coef) != 0, axis=0).sum(axis=1)
    assert ever.max() <= 8
    # dfmax large enough -> untouched path
    r4 = lasso_path(X, y, nlambda=10, dfmax=X.shape[1])
    assert r4.lambdas.shape[0] == 10
    with pytest.raises(ValueError):
        lasso_path(X, y, nlambda=5, dfmax=0,
                   lambdas=np.array([1e-4]))  # even top violates


def test_glm_dfmax(prob):
    X, y = prob
    rng = np.random.default_rng(1)
    yb = (rng.uniform(size=y.size)
          < 1 / (1 + np.exp(-(y - y.mean())))).astype(float)
    res = admm_tpu.logistic_lasso_path(X, yb, nlambda=20, dfmax=5)
    assert np.count_nonzero(np.asarray(res.coef), axis=1).max() <= 5
    assert res.lambdas.shape[0] < 20


def test_predict_coefficients_and_nonzero(prob):
    X, y = prob
    res = lasso_path(X, y, nlambda=12, exclude=[2])
    cm = admm_tpu.predict(res, None, type="coefficients")
    assert cm.shape == (12, X.shape[1] + 1)
    np.testing.assert_array_equal(cm[:, 0], np.asarray(res.beta0))
    one = admm_tpu.predict(res, None, type="coefficients",
                           lam=float(res.lambdas[-1]))
    assert one.shape == (X.shape[1] + 1,)
    nz = admm_tpu.predict(res, None, type="nonzero",
                          lam=float(res.lambdas[-1]))
    assert 2 not in nz and len(nz) > 0
    allnz = admm_tpu.predict(res, None, type="nonzero")
    assert len(allnz) == 12


def test_cv_keep_prevalidated(prob):
    X, y = prob
    cv = admm_tpu.cv_lasso_path(X, y, nfolds=4, nlambda=12, keep=True)
    assert cv.fit_preval.shape == (y.size, 12)
    mse = ((cv.fit_preval - y[:, None]) ** 2).mean(axis=0)
    np.testing.assert_allclose(mse, cv.cvm, atol=1e-10)
    # default: not kept
    cv0 = admm_tpu.cv_lasso_path(X, y, nfolds=4, nlambda=12)
    assert cv0.fit_preval is None
