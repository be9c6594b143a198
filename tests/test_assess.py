"""Model assessment utilities (admm_tpu.assess — glmnet's
assess.glmnet / roc.glmnet / confusion.glmnet / Cindex analogs).

Pins: sklearn metrics for auc/roc/confusion/log-loss/poisson deviance,
brute-force pair loops for Harrell's C, and the CV drivers' own cvm for
the keep=True prevalidated-eta path (assess must reproduce exactly what
cv_*_path cross-validated, per the module contract)."""
import numpy as np
import pytest

import admm_tpu


def _gauss(n=120, p=12, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [2.0, -1.5, 1.0]
    y = 0.5 + X @ b + 0.3 * rng.normal(size=n)
    return X, y


def test_assess_gaussian_matches_direct():
    X, y = _gauss()
    res = admm_tpu.lasso_path(X, y, nlambda=8)
    out = admm_tpu.assess(res, X, y)
    eta = np.asarray(admm_tpu.predict(res, X))
    np.testing.assert_allclose(out["mse"],
                               ((eta - y) ** 2).mean(axis=1), rtol=1e-12)
    np.testing.assert_allclose(out["mae"],
                               np.abs(eta - y).mean(axis=1), rtol=1e-12)
    np.testing.assert_allclose(out["deviance"], out["mse"], rtol=1e-12)
    # lam= selects one grid point and returns scalars.
    i = 4
    one = admm_tpu.assess(res, X, y, lam=float(res.lambdas[i]))
    assert np.isscalar(one["mse"]) or one["mse"].ndim == 0
    np.testing.assert_allclose(one["mse"], out["mse"][i], rtol=1e-12)


def test_assess_gaussian_weighted():
    X, y = _gauss(seed=1)
    w = np.random.default_rng(2).uniform(0.5, 2.0, size=y.size)
    res = admm_tpu.lasso_path(X, y, nlambda=6)
    out = admm_tpu.assess(res, X, y, weights=w)
    eta = np.asarray(admm_tpu.predict(res, X))
    np.testing.assert_allclose(
        out["mse"], ((eta - y) ** 2 * w).sum(axis=1) / w.sum(),
        rtol=1e-12)


def _binom(n=200, p=8, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.concatenate([[2.0, -2.0, 1.0], np.zeros(p - 3)])
    y = (rng.uniform(size=n) <
         1 / (1 + np.exp(-(X @ b)))).astype(float)
    return X, y


def test_assess_binomial_vs_sklearn():
    from sklearn.metrics import log_loss, roc_auc_score

    X, y = _binom()
    res = admm_tpu.logistic_lasso_path(X, y, nlambda=6)
    out = admm_tpu.assess(res, X, y, family="binomial")
    eta = np.asarray(admm_tpu.predict(res, X))
    p = 1 / (1 + np.exp(-eta))
    for i in (0, 3, 5):
        np.testing.assert_allclose(
            out["deviance"][i], 2 * log_loss(y, p[i]), rtol=1e-9)
        np.testing.assert_allclose(
            out["auc"][i], roc_auc_score(y, eta[i]), rtol=1e-12)
        np.testing.assert_allclose(
            out["class"][i], ((eta[i] > 0) != (y > 0.5)).mean(),
            rtol=1e-12)
    # Weighted AUC matches sklearn's sample_weight.
    w = np.random.default_rng(4).uniform(0.5, 2.0, size=y.size)
    outw = admm_tpu.assess(res, X, y, family="binomial", weights=w)
    np.testing.assert_allclose(
        outw["auc"][3], roc_auc_score(y, eta[3], sample_weight=w),
        rtol=1e-10)


def test_assess_poisson_vs_sklearn():
    from sklearn.metrics import mean_poisson_deviance

    rng = np.random.default_rng(5)
    n, p = 150, 6
    X = rng.normal(size=(n, p)) * 0.5
    y = rng.poisson(np.exp(0.3 + X[:, 0] - 0.5 * X[:, 1])).astype(float)
    res = admm_tpu.poisson_lasso_path(X, y, nlambda=6)
    out = admm_tpu.assess(res, X, y, family="poisson")
    eta = np.asarray(admm_tpu.predict(res, X))
    for i in (0, 5):
        np.testing.assert_allclose(
            out["deviance"][i],
            mean_poisson_deviance(y, np.exp(eta[i])), rtol=1e-9)


def test_roc_vs_sklearn():
    from sklearn.metrics import roc_curve

    X, y = _binom(seed=6)
    res = admm_tpu.logistic_lasso_path(X, y, nlambda=5)
    lam = float(res.lambdas[-1])
    fpr, tpr = admm_tpu.roc(res, X, y, lam=lam)
    eta = np.asarray(admm_tpu.predict(res, X, lam=lam))
    f2, t2, _ = roc_curve(y, eta, drop_intermediate=False)
    np.testing.assert_allclose(fpr, f2, atol=1e-12)
    np.testing.assert_allclose(tpr, t2, atol=1e-12)
    # Trapezoid under the curve equals the Mann-Whitney AUC.
    auc = admm_tpu.assess(res, X, y, family="binomial")["auc"][-1]
    np.testing.assert_allclose(np.trapezoid(tpr, fpr), auc, rtol=1e-12)


def test_confusion_binomial_and_multinomial():
    from sklearn.metrics import confusion_matrix

    X, y = _binom(seed=7)
    res = admm_tpu.logistic_lasso_path(X, y, nlambda=5)
    tab = admm_tpu.confusion(res, X, y)
    pred = np.asarray(admm_tpu.predict(
        res, X, lam=float(res.lambdas[-1]), type="class",
        family="binomial"))
    np.testing.assert_array_equal(
        tab, confusion_matrix(y.astype(int), pred.astype(int),
                              labels=[0, 1]))
    assert tab.sum() == y.size

    rng = np.random.default_rng(8)
    n, p, C = 180, 6, 3
    Xm = rng.normal(size=(n, p))
    B = rng.normal(size=(p, C)) * 2.0
    ym = np.argmax(Xm @ B + rng.gumbel(size=(n, C)), axis=1)
    rm = admm_tpu.multinomial_lasso_path(Xm, ym, nlambda=5)
    tabm = admm_tpu.confusion(rm, Xm, ym)
    predm = np.asarray(admm_tpu.predict(
        rm, Xm, lam=float(rm.lambdas[-1]), type="class"))
    np.testing.assert_array_equal(
        tabm, confusion_matrix(ym, predm.astype(int),
                               labels=[0, 1, 2]))


def test_assess_multinomial_measures():
    rng = np.random.default_rng(9)
    n, p, C = 150, 5, 3
    X = rng.normal(size=(n, p))
    B = rng.normal(size=(p, C)) * 2.0
    y = np.argmax(X @ B + rng.gumbel(size=(n, C)), axis=1)
    res = admm_tpu.multinomial_lasso_path(X, y, nlambda=5)
    out = admm_tpu.assess(res, X, y)
    eta = np.asarray(admm_tpu.predict(res, X))          # (L, n, C)
    i = 4
    m = eta[i].max(axis=1, keepdims=True)
    P = np.exp(eta[i] - m)
    P /= P.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(
        out["deviance"][i],
        (-2 * np.log(P[np.arange(n), y])).mean(), rtol=1e-9)
    np.testing.assert_allclose(
        out["class"][i], (eta[i].argmax(axis=1) != y).mean(),
        rtol=1e-12)


def test_c_index_brute_force_and_cox_assess():
    rng = np.random.default_rng(10)
    n, p = 80, 5
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-0.8 * X[:, 0]))
    t = np.round(t, 1) + 0.1          # introduce ties
    d = (rng.uniform(size=n) < 0.7).astype(float)
    eta = 0.8 * X[:, 0] + 0.1 * rng.normal(size=n)
    c = admm_tpu.c_index(eta, t, d)
    # brute force over comparable pairs
    num = den = 0.0
    for i in range(n):
        for j in range(n):
            if t[i] < t[j] and d[i] > 0:
                den += 1
                num += 1.0 if eta[i] > eta[j] else \
                    (0.5 if eta[i] == eta[j] else 0.0)
    np.testing.assert_allclose(c, num / den, rtol=1e-12)
    assert c > 0.6   # informative score beats chance

    res = admm_tpu.cox_lasso_path(X, t, d, nlambda=5)
    out = admm_tpu.assess(res, X, None, time=t, event=d)
    assert out["C"].shape == (5,)
    assert out["deviance"].shape == (5,)
    # last (least-penalized) point concentrates on the true signal
    assert out["C"][-1] > out["C"][0] - 1e-9
    # y as an (n, 2) [time, event] array works too
    out2 = admm_tpu.assess(res, X, np.c_[t, d])
    np.testing.assert_allclose(out2["C"], out["C"], rtol=1e-12)


def test_assess_preval_reproduces_cvm():
    """assess(eta=cv.fit_preval.T) on the keep=True prevalidated
    predictions reproduces the CV driver's own cvm (the module
    contract: shared measure definitions)."""
    X, y = _gauss(n=150, seed=11)
    cv = admm_tpu.cv_lasso_path(X, y, nfolds=5, nlambda=12, keep=True,
                                seed=0)
    out = admm_tpu.assess(None, None, y, eta=cv.fit_preval.T)
    np.testing.assert_allclose(out["mse"], cv.cvm, rtol=1e-7)


def test_assess_validation_errors():
    X, y = _gauss(n=60, seed=12)
    res = admm_tpu.lasso_path(X, y, nlambda=4)
    with pytest.raises(ValueError, match="family"):
        admm_tpu.assess(res, X, y, family="weibull")
    with pytest.raises(ValueError, match="eta"):
        admm_tpu.assess(None, None, y)
    with pytest.raises(ValueError, match="nlambda"):
        admm_tpu.assess(None, None, y, eta=np.zeros(60))


def test_assess_cv_result_defaults_to_1se():
    """glmnet's assess.glmnet on a cv object: scored at lambda.1se by
    default, lambda.min on request."""
    from admm_tpu import assess
    from admm_tpu.models.cv import cv_lasso_path

    rng = np.random.default_rng(13)
    n, p = 150, 12
    X = rng.normal(size=(n, p))
    y = X[:, 0] - 0.5 * X[:, 1] + 0.2 * rng.normal(size=n)
    cv = cv_lasso_path(X, y, nfolds=3, nlambda=8)
    a = assess(cv, X, y)
    b = assess(cv.fit, X, y, lam=cv.lambda_1se)
    assert np.isscalar(a["mse"]) or a["mse"].ndim == 0
    np.testing.assert_allclose(a["mse"], b["mse"])
    c = assess(cv, X, y, lam="lambda.min")
    np.testing.assert_allclose(
        c["mse"], assess(cv.fit, X, y, lam=cv.lambda_min)["mse"])


def test_c_index_weights_equal_duplication():
    """glmnet's Cindex weights: pair weight w_i * w_j — integer
    weights equal exact row duplication (tied duplicate times add no
    comparable pairs under Breslow semantics)."""
    from admm_tpu.assess import c_index

    rng = np.random.default_rng(0)
    n = 40
    t = rng.exponential(size=n)
    d = (rng.uniform(size=n) < 0.7).astype(float)
    eta = rng.normal(size=n)
    w = rng.integers(1, 3, n).astype(float)
    idx = np.repeat(np.arange(n), w.astype(int))
    assert abs(c_index(eta, t, d, weights=w)
               - c_index(eta[idx], t[idx], d[idx])) < 1e-12
