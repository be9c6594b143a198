"""Prediction utilities (admm_tpu.predict — glmnet's predict analog)."""
import numpy as np
import pytest

import admm_tpu


def test_predict_gaussian_and_lam_selection():
    rng = np.random.default_rng(0)
    n, p = 150, 10
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [2.0, -1.0, 0.5]
    y = 1.0 + X @ b + 0.2 * rng.normal(size=n)
    res = admm_tpu.models.lasso.lasso_path(X, y, nlambda=8)
    eta = admm_tpu.predict(res, X)
    assert eta.shape == (8, n)
    # Manual assembly matches.
    i = 5
    np.testing.assert_allclose(
        eta[i], np.asarray(res.beta0)[i] + X @ np.asarray(res.coef)[i],
        rtol=1e-6)
    # Nearest-lambda selection drops the leading axis.
    one = admm_tpu.predict(res, X, lam=float(res.lambdas[i]))
    np.testing.assert_allclose(one, eta[i], rtol=1e-6)


def test_predict_binomial_response_and_class():
    rng = np.random.default_rng(1)
    n, p = 200, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[2.0, -2.0], np.zeros(p - 2)])
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ b)))).astype(float)
    res = admm_tpu.logistic_lasso_path(X, y, nlambda=6)
    pr = admm_tpu.predict(res, X, type="response", family="binomial")
    assert np.all((pr >= 0) & (pr <= 1))
    lab = admm_tpu.predict(res, X, type="class", family="binomial",
                           lam=float(res.lambdas[-1]))
    assert (lab == y).mean() > 0.8


def test_predict_multinomial_and_multitask():
    rng = np.random.default_rng(2)
    n, p, C = 200, 8, 3
    X = rng.normal(size=(n, p))
    y = rng.integers(0, C, n)
    mn = admm_tpu.multinomial_lasso_path(X, y, nlambda=4, maxit=300)
    pr = admm_tpu.predict(mn, X, type="response")
    assert pr.shape == (4, n, C)
    np.testing.assert_allclose(pr.sum(axis=2), 1.0, atol=1e-5)
    lab = admm_tpu.predict(mn, X, type="class")
    assert lab.shape == (4, n) and lab.dtype.kind == "i"

    Y = X @ np.ones((p, 2)) + rng.normal(size=(n, 2))
    mt = admm_tpu.multitask_lasso_path(X, Y, nlambda=4, maxit=300)
    eta = admm_tpu.predict(mt, X)
    assert eta.shape == (4, n, 2)
    with pytest.raises(ValueError, match="link"):
        admm_tpu.predict(mt, X, type="response")


def test_predict_validates():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 5))
    res = admm_tpu.models.lasso.lasso_path(X, rng.normal(size=50),
                                           nlambda=4)
    with pytest.raises(ValueError, match="type"):
        admm_tpu.predict(res, X, type="nope")
    with pytest.raises(ValueError, match="family"):
        admm_tpu.predict(res, X, type="response", family="nope")
    with pytest.raises(ValueError, match="class"):
        admm_tpu.predict(res, X, type="class")


def test_predict_cox_relative_risk():
    rng = np.random.default_rng(4)
    n, p = 120, 6
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.8, -0.6], np.zeros(p - 2)])
    t = rng.exponential(np.exp(-(X @ b)))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    r = admm_tpu.cox_lasso_path(X, t, d, nlambda=4, maxit=2000)
    rr = admm_tpu.predict(r, X, type="response")
    assert rr.shape == (4, n) and np.all(rr > 0)
    with pytest.raises(ValueError, match="cox"):
        admm_tpu.predict(r, X, type="class")


def test_predict_cv_result_lambda_strings():
    """glmnet's predict.cv.glmnet / coef.cv.glmnet: a CV result
    predicts through its full-data fit, defaulting to s='lambda.1se',
    with 'lambda.min' and numeric overrides."""
    from admm_tpu.models.cv import cv_lasso_path
    from admm_tpu.predict import coef, predict

    rng = np.random.default_rng(12)
    n, p = 150, 15
    X = rng.normal(size=(n, p))
    b = np.concatenate([[1.0, -0.8], np.zeros(p - 2)])
    y = X @ b + 0.3 * rng.normal(size=n)
    cv = cv_lasso_path(X, y, nfolds=3, nlambda=10)
    np.testing.assert_allclose(
        predict(cv, X), predict(cv.fit, X, lam=cv.lambda_1se))
    np.testing.assert_allclose(
        predict(cv, X, lam="lambda.min"),
        predict(cv.fit, X, lam=cv.lambda_min))
    np.testing.assert_allclose(
        coef(cv, lam="lambda_min"), coef(cv.fit, lam=cv.lambda_min))
    np.testing.assert_allclose(
        predict(cv, X, lam=cv.lambda_min),
        predict(cv.fit, X, lam=cv.lambda_min))
    with pytest.raises(ValueError, match="lambda"):
        predict(cv, X, lam="lambda.best")
    with pytest.raises(ValueError, match="CV result"):
        predict(cv.fit, X, lam="lambda.min")


def test_predict_lambda_interpolation():
    """glmnet's lambda.interp (predict's exact=FALSE default): off-grid
    s blends the bracketing grid points linearly on the lambda scale;
    on-grid s is exact; s outside the grid clamps."""
    from admm_tpu.models.lasso import lasso_path
    from admm_tpu.predict import coef, predict

    rng = np.random.default_rng(14)
    n, p = 120, 10
    X = rng.normal(size=(n, p))
    y = X[:, 0] - 0.7 * X[:, 1] + 0.1 * rng.normal(size=n)
    r = lasso_path(X, y, nlambda=8)
    lams = np.asarray(r.lambdas, np.float64)
    # On-grid: exact.
    np.testing.assert_allclose(coef(r, lam=lams[3]),
                               np.asarray(coef(r))[3], rtol=1e-12)
    # Midpoint (lambda scale): the exact 50/50 blend.
    s = 0.5 * (lams[2] + lams[3])
    full = np.asarray(coef(r))
    np.testing.assert_allclose(coef(r, lam=s),
                               0.5 * (full[2] + full[3]), rtol=1e-10)
    # eta interpolates consistently (linear in the coefficients).
    np.testing.assert_allclose(
        predict(r, X, lam=s),
        0.5 * (predict(r, X)[2] + predict(r, X)[3]), rtol=1e-8)
    # Clamped outside the grid.
    np.testing.assert_allclose(coef(r, lam=lams[0] * 10.0), full[0])
    np.testing.assert_allclose(coef(r, lam=lams[-1] / 10.0), full[-1])


def test_predict_offset_reaches_cox_and_matrix_families():
    """Review fix: predict() silently dropped offset= for cox and the
    matrix families (only the scalar GLM branch applied it)."""
    import jax.numpy as jnp

    from admm_tpu.models.cox import cox_lasso_path
    from admm_tpu.models.multinomial import multinomial_lasso_path

    predict = admm_tpu.predict
    rng = np.random.default_rng(5)
    n, p = 120, 6
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.8).astype(float)
    off = 0.5 * rng.normal(size=n)
    res = cox_lasso_path(X, t, d, lambdas=[0.05], offset=off,
                         dtype=jnp.float64)
    eta0 = predict(res, X)
    eta1 = predict(res, X, offset=off)
    np.testing.assert_allclose(eta1, eta0 + off[None, :], atol=1e-12)
    rr = predict(res, X, offset=off, type="response")
    np.testing.assert_allclose(rr, np.exp(eta1), atol=1e-10)

    lab = rng.integers(0, 3, n)
    mn = multinomial_lasso_path(X, lab, lambdas=[0.05])
    e0 = predict(mn, X)
    e1 = predict(mn, X, offset=off)          # (n,) broadcasts classes
    np.testing.assert_allclose(e1, e0 + off[None, :, None], atol=1e-6)
    offc = rng.normal(size=(n, 3))
    e2 = predict(mn, X, offset=offc)         # (n, C) per class
    np.testing.assert_allclose(e2, e0 + offc[None], atol=1e-6)
