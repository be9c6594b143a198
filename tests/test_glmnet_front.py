"""The glmnet() / cv_glmnet() front door (admm_tpu.glmnet module).

Pins dispatch equivalence: every family= string must produce exactly
the result of calling the family's own driver directly (same seeds,
same kwargs), plus the Surv-style y parsing for cox and the argument
validation."""
import numpy as np
import pytest

import admm_tpu


def _xy(n=120, p=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [2.0, -1.5, 1.0]
    y = 0.5 + X @ b + 0.3 * rng.normal(size=n)
    return X, y


def test_gaussian_dispatch_matches_lasso_and_enet():
    X, y = _xy()
    a = admm_tpu.glmnet(X, y, nlambda=8)
    b = admm_tpu.lasso_path(X, y, nlambda=8)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))
    ae = admm_tpu.glmnet(X, y, alpha=0.4, nlambda=8)
    be = admm_tpu.enet_path(X, y, alpha=0.4, nlambda=8)
    np.testing.assert_array_equal(np.asarray(ae.coef),
                                  np.asarray(be.coef))


def test_binomial_poisson_huber_dispatch():
    rng = np.random.default_rng(1)
    n, p = 150, 6
    X = rng.normal(size=(n, p))
    yb = (rng.uniform(size=n) <
          1 / (1 + np.exp(-(2 * X[:, 0])))).astype(float)
    a = admm_tpu.glmnet(X, yb, family="binomial", nlambda=6)
    b = admm_tpu.logistic_lasso_path(X, yb, nlambda=6)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))

    yp = rng.poisson(np.exp(0.3 + 0.5 * X[:, 0])).astype(float)
    a = admm_tpu.glmnet(X, yp, family="poisson", nlambda=6)
    b = admm_tpu.poisson_lasso_path(X, yp, nlambda=6)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))

    yh = X[:, 0] + 0.2 * rng.normal(size=n)
    a = admm_tpu.glmnet(X, yh, family="huber", nlambda=6)
    b = admm_tpu.huber_lasso_path(X, yh, nlambda=6)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))


def test_multinomial_and_mgaussian_dispatch():
    rng = np.random.default_rng(2)
    n, p, C = 150, 5, 3
    X = rng.normal(size=(n, p))
    y = np.argmax(X @ rng.normal(size=(p, C)) * 2
                  + rng.gumbel(size=(n, C)), axis=1)
    a = admm_tpu.glmnet(X, y, family="multinomial", nlambda=5,
                        type_multinomial="grouped")
    b = admm_tpu.multinomial_lasso_path(X, y, nlambda=5, grouped=True)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))

    Y = X @ rng.normal(size=(p, 2)) + 0.1 * rng.normal(size=(n, 2))
    a = admm_tpu.glmnet(X, Y, family="mgaussian", nlambda=5)
    b = admm_tpu.multitask_lasso_path(X, Y, nlambda=5)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))


def test_cox_dispatch_surv_y_and_keywords():
    rng = np.random.default_rng(3)
    n, p = 80, 4
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-0.8 * X[:, 0]))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    a = admm_tpu.glmnet(X, np.c_[t, d], family="cox", nlambda=5)
    b = admm_tpu.cox_lasso_path(X, t, d, nlambda=5)
    np.testing.assert_array_equal(np.asarray(a.coef), np.asarray(b.coef))
    c = admm_tpu.glmnet(X, family="cox", time=t, event=d, nlambda=5)
    np.testing.assert_array_equal(np.asarray(c.coef), np.asarray(b.coef))


def test_cv_glmnet_dispatch():
    X, y = _xy(seed=4)
    a = admm_tpu.cv_glmnet(X, y, nfolds=4, nlambda=8, seed=0)
    b = admm_tpu.cv_lasso_path(X, y, nfolds=4, nlambda=8, seed=0)
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=1e-12)
    assert a.lambda_min == b.lambda_min

    rng = np.random.default_rng(5)
    yb = (rng.uniform(size=y.size) <
          1 / (1 + np.exp(-(2 * X[:, 0])))).astype(float)
    cv = admm_tpu.cv_glmnet(X, yb, family="binomial", nfolds=4,
                            nlambda=6, seed=0)
    ref = admm_tpu.cv_logistic_path(X, yb, nfolds=4, nlambda=6, seed=0)
    np.testing.assert_allclose(cv.cvm, ref.cvm, rtol=1e-12)


def test_coef_accessor_and_parallel_exports():
    """coef() == predict(type='coefficients'); the gaussian consensus
    drivers are top-level exports like their GLM counterparts."""
    X, y = _xy(seed=7)
    res = admm_tpu.lasso_path(X, y, nlambda=5)
    np.testing.assert_array_equal(
        admm_tpu.coef(res),
        admm_tpu.predict(res, None, type="coefficients"))
    one = admm_tpu.coef(res, lam=float(res.lambdas[2]))
    assert one.shape == (X.shape[1] + 1,)
    for name in ("parallel_lasso_path", "parallel_enet_path",
                 "parallel_group_lasso_path", "parallel_bp_fit"):
        assert callable(getattr(admm_tpu, name))
        assert name in admm_tpu.__all__


def test_glmnet_validation():
    X, y = _xy(n=60, seed=6)
    with pytest.raises(ValueError, match="family"):
        admm_tpu.glmnet(X, y, family="gamma")
    with pytest.raises(ValueError, match="family"):
        admm_tpu.cv_glmnet(X, y, family="gamma")
    with pytest.raises(ValueError, match="type_multinomial"):
        admm_tpu.glmnet(X, y, family="multinomial",
                        type_multinomial="both")
    with pytest.raises(ValueError, match="cox"):
        admm_tpu.glmnet(X, y, family="cox")
    with pytest.raises(ValueError, match="event"):
        admm_tpu.glmnet(X, family="cox", time=y)


def test_big_glm_unpenalized_oracles():
    """bigGlm == the unpenalized fit: OLS for gaussian (lstsq oracle),
    sklearn LogisticRegression(C→inf) for binomial; limits and the cox
    family work at lambda = 0."""
    rng = np.random.default_rng(8)
    n, p = 200, 6
    X = rng.normal(size=(n, p))
    b = rng.normal(size=p)
    y = 1.0 + X @ b + 0.2 * rng.normal(size=n)

    fit = admm_tpu.big_glm(X, y)
    A = np.c_[np.ones(n), X]
    ols = np.linalg.lstsq(A, y, rcond=None)[0]
    np.testing.assert_allclose(float(fit.beta0[0]), ols[0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(fit.coef)[0], ols[1:],
                               atol=2e-3)

    from sklearn.linear_model import LogisticRegression

    yb = (rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ b)))).astype(float)
    fb = admm_tpu.big_glm(X, yb, family="binomial", eps_abs=1e-7,
                          eps_rel=1e-7)
    sk = LogisticRegression(C=1e8, tol=1e-10).fit(X, yb)
    np.testing.assert_allclose(np.asarray(fb.coef)[0], sk.coef_[0],
                               atol=5e-3)

    # Nonnegative unpenalized least squares (limits at lambda = 0).
    fnn = admm_tpu.big_glm(X, y, lower_limits=0.0)
    assert np.asarray(fnn.coef).min() >= 0.0

    # Cox at lambda = 0 runs and is finite.
    t = rng.exponential(np.exp(-0.5 * X[:, 0]))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    fc = admm_tpu.big_glm(X, family="cox", time=t, event=d)
    assert np.isfinite(np.asarray(fc.coef)).all()
    assert np.asarray(fc.lambdas).tolist() == [0.0]


def test_front_door_relax():
    """glmnet(relax=TRUE) / cv.glmnet(relax=TRUE) dispatch to the
    relaxed drivers; non-gaussian rejected (scoped claim)."""
    from admm_tpu import cv_glmnet, glmnet
    from admm_tpu.models.relaxed import relaxed_lasso_path

    rng = np.random.default_rng(19)
    X = rng.normal(size=(120, 10))
    y = X[:, 0] + 0.2 * rng.normal(size=120)
    r = glmnet(X, y, relax=True, nlambda=8)
    direct = relaxed_lasso_path(X, y, nlambda=8)
    np.testing.assert_allclose(np.asarray(r.coef),
                               np.asarray(direct.coef))
    cv = cv_glmnet(X, y, relax=True, nfolds=3, nlambda=8)
    assert "gamma_min" in cv and np.all(np.isfinite(cv["cvm"]))
    with pytest.raises(ValueError, match="gaussian"):
        glmnet(X, (y > 0).astype(float), "binomial", relax=True)
