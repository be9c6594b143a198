"""glmnet 4.x family objects: alternative links and extra GLM families
(admm_tpu.models.glm: binomial_probit, binomial_cloglog, gamma_log,
negative_binomial) riding the generic smooth-loss engine, and the
``glmnet(family=<GLMFamily>)`` front-door dispatch.

Oracles: unpenalized fits against independent numpy Newton solvers
(full-Hessian IRLS written here, no jax), KKT subgradient certificates
at mid-path lambdas, the auto grid top nulling the model, integer-weight
== row-duplication equivalence, and negative_binomial(theta -> inf)
reducing to poisson."""
import numpy as np
import pytest
from scipy.special import log_ndtr, ndtr

from admm_tpu.models.glm import (binomial_cloglog, binomial_probit,
                                 gamma_log, glm_lasso_path,
                                 negative_binomial, poisson)

RNG = np.random.default_rng(7)


def _design(n=400, p=10):
    X = RNG.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [1.0, -0.8, 0.6]
    return X, b, 0.3 + X @ b


def _kkt(X, y, fam_jax, res, lam, grad_np, tol=2e-4):
    """Subgradient optimality at the solved point: |grad_j| <= lam off
    the support, grad_j = -lam sign(b_j) on it."""
    n = X.shape[0]
    b = np.asarray(res.coef[0], np.float64)
    eta = float(res.beta0[0]) + X @ b
    grad = X.T @ grad_np(eta, y) / n
    active = np.abs(b) > 1e-6
    if (~active).any():
        assert np.abs(grad[~active]).max() <= lam * 1.002
    if active.any():
        assert np.abs(grad[active] + lam * np.sign(b[active])).max() < tol


def _newton_mle(X1, y, grad_np, hess_np, iters=60, damp=0.5):
    """Independent numpy damped-Newton MLE on the augmented design
    (ones column included) — the unpenalized oracle."""
    b = np.zeros(X1.shape[1])
    n = X1.shape[0]
    for _ in range(iters):
        eta = X1 @ b
        g = X1.T @ grad_np(eta, y) / n
        W = hess_np(eta, y)
        H = (X1 * W[:, None]).T @ X1 / n + 1e-10 * np.eye(X1.shape[1])
        b = b - damp * np.linalg.solve(H, g)
    return b


def test_probit_unpenalized_matches_numpy_newton():
    X, _, eta = _design()
    y = (RNG.uniform(size=X.shape[0]) < ndtr(eta)).astype(float)

    def grad_np(e, y):
        r1 = np.exp(-0.5 * e * e) / np.sqrt(2 * np.pi) / ndtr(e)
        r0 = np.exp(-0.5 * e * e) / np.sqrt(2 * np.pi) / ndtr(-e)
        return (1 - y) * r0 - y * r1

    def hess_np(e, y):
        r1 = np.exp(-0.5 * e * e) / np.sqrt(2 * np.pi) / ndtr(e)
        r0 = np.exp(-0.5 * e * e) / np.sqrt(2 * np.pi) / ndtr(-e)
        return y * r1 * (r1 + e) + (1 - y) * r0 * (r0 - e)

    X1 = np.concatenate([np.ones((X.shape[0], 1)), X], axis=1)
    ref = _newton_mle(X1, y, grad_np, hess_np)
    r = glm_lasso_path(X, y, binomial_probit(), lambdas=np.zeros(1),
                       standardize=False, rho=1.0,
                       eps_abs=1e-8, eps_rel=1e-8, maxit=20000)
    got = np.concatenate([[float(r.beta0[0])], np.asarray(r.coef[0])])
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_probit_kkt_grid_top_and_weights():
    X, _, eta = _design()
    y = (RNG.uniform(size=X.shape[0]) < ndtr(eta)).astype(float)
    lam = 0.02

    def grad_np(e, y):
        phi = np.exp(-0.5 * e * e) / np.sqrt(2 * np.pi)
        return (1 - y) * phi / ndtr(-e) - y * phi / ndtr(e)

    r = glm_lasso_path(X, y, binomial_probit(), lambdas=np.array([lam]),
                       standardize=False, eps_abs=1e-7, eps_rel=1e-7)
    _kkt(X, y, binomial_probit(), r, lam, grad_np)
    # Auto grid top nulls the model.
    top = glm_lasso_path(X, y, binomial_probit(), nlambda=5)
    assert np.abs(np.asarray(top.coef[0])).max() < 1e-5
    # Integer weights == exact row duplication.
    w = RNG.integers(1, 4, size=X.shape[0]).astype(float)
    rep = np.repeat(np.arange(X.shape[0]), w.astype(int))
    rw = glm_lasso_path(X, y, binomial_probit(), lambdas=np.array([lam]),
                        weights=w, eps_abs=1e-7, eps_rel=1e-7)
    rd = glm_lasso_path(X[rep], y[rep], binomial_probit(),
                        lambdas=np.array([lam]),
                        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(rw.coef), np.asarray(rd.coef),
                               atol=2e-5)


def test_cloglog_kkt_and_grid_top():
    X, _, eta = _design()
    pc = -np.expm1(-np.exp(eta))
    y = (RNG.uniform(size=X.shape[0]) < pc).astype(float)
    lam = 0.02

    def grad_np(e, y):
        t = np.exp(np.minimum(e, 30.0))
        p = np.maximum(-np.expm1(-t), 1e-300)
        return (1 - y) * t - y * t * np.exp(-t) / p

    r = glm_lasso_path(X, y, binomial_cloglog(), lambdas=np.array([lam]),
                       standardize=False, eps_abs=1e-7, eps_rel=1e-7)
    _kkt(X, y, binomial_cloglog(), r, lam, grad_np)
    top = glm_lasso_path(X, y, binomial_cloglog(), nlambda=5)
    assert np.abs(np.asarray(top.coef[0])).max() < 1e-4


def test_gamma_unpenalized_matches_numpy_newton_and_kkt():
    X, _, eta = _design()
    y = RNG.gamma(shape=2.0, scale=np.exp(eta) / 2.0) + 1e-6

    def grad_np(e, y):
        return 1.0 - y * np.exp(-e)

    def hess_np(e, y):
        return y * np.exp(-e)

    X1 = np.concatenate([np.ones((X.shape[0], 1)), X], axis=1)
    ref = _newton_mle(X1, y, grad_np, hess_np)
    r0 = glm_lasso_path(X, y, gamma_log(), lambdas=np.zeros(1),
                        standardize=False, rho=1.0,
                        eps_abs=1e-8, eps_rel=1e-8, maxit=20000)
    got = np.concatenate([[float(r0.beta0[0])], np.asarray(r0.coef[0])])
    np.testing.assert_allclose(got, ref, atol=5e-4)

    lam = 0.03
    r = glm_lasso_path(X, y, gamma_log(), lambdas=np.array([lam]),
                       standardize=False, eps_abs=1e-7, eps_rel=1e-7)
    _kkt(X, y, gamma_log(), r, lam, grad_np, tol=5e-4)
    top = glm_lasso_path(X, y, gamma_log(), nlambda=5)
    assert np.abs(np.asarray(top.coef[0])).max() < 1e-4


def test_negbin_kkt_and_poisson_limit():
    X, _, eta = _design()
    mu, th = np.exp(eta), 2.0
    y = RNG.negative_binomial(th, th / (th + mu)).astype(float)
    lam = 0.02

    def grad_np(e, y):
        m = np.exp(np.minimum(e, 30.0))
        return (y + th) * m / (m + th) - y

    r = glm_lasso_path(X, y, negative_binomial(th),
                       lambdas=np.array([lam]), standardize=False,
                       eps_abs=1e-7, eps_rel=1e-7)
    _kkt(X, y, negative_binomial(th), r, lam, grad_np, tol=5e-4)
    top = glm_lasso_path(X, y, negative_binomial(th), nlambda=5)
    assert np.abs(np.asarray(top.coef[0])).max() < 1e-4

    # theta -> inf: the NB2 likelihood tends to poisson.
    yp = RNG.poisson(mu).astype(float)
    lams = np.array([0.05, 0.02])
    rn = glm_lasso_path(X, yp, negative_binomial(1e7), lambdas=lams,
                        standardize=False, eps_abs=1e-7, eps_rel=1e-7)
    rp = glm_lasso_path(X, yp, poisson(), lambdas=lams,
                        standardize=False, eps_abs=1e-7, eps_rel=1e-7,
                        newton_steps=2)
    np.testing.assert_allclose(np.asarray(rn.coef), np.asarray(rp.coef),
                               atol=2e-4)


def test_front_door_family_objects_and_cv():
    from admm_tpu import cv_glmnet, glmnet

    X, _, eta = _design(n=240, p=8)
    y = (RNG.uniform(size=X.shape[0]) < ndtr(eta)).astype(float)
    # glmnet(family=<instance>) == the driver; a zero-arg factory works.
    r1 = glmnet(X, y, binomial_probit(), nlambda=6)
    r2 = glm_lasso_path(X, y, binomial_probit(), nlambda=6)
    np.testing.assert_array_equal(np.asarray(r1.coef),
                                  np.asarray(r2.coef))
    r3 = glmnet(X, y, binomial_probit, nlambda=6)
    np.testing.assert_array_equal(np.asarray(r3.coef),
                                  np.asarray(r2.coef))
    with pytest.raises(ValueError, match="relax"):
        glmnet(X, y, binomial_probit(), relax=True)
    # CV with the family's own deviance: finite curve, sane selection,
    # and the probit deviance really is the scorer (matches a direct
    # evaluation on the prevalidated predictions).
    cv = cv_glmnet(X, y, binomial_probit(), nfolds=4, nlambda=8,
                   seed=0, keep=True)
    assert np.isfinite(np.asarray(cv.cvm)).all()
    eta_pre = np.asarray(cv.fit_preval)
    dev = -2.0 * (y[None, :] * log_ndtr(eta_pre.T)
                  + (1 - y[None, :]) * log_ndtr(-eta_pre.T))
    np.testing.assert_allclose(dev.mean(axis=1), np.asarray(cv.cvm),
                               rtol=1e-5)


def test_predict_assess_cv_measures_with_family_objects():
    """predict(type='response'/'class'), assess() and the CV
    type_measure surface all honor the family object's inverse link."""
    from admm_tpu import assess, cv_glmnet, glmnet, predict

    X, _, eta = _design(n=240, p=8)
    y = (RNG.uniform(size=X.shape[0]) < ndtr(eta)).astype(float)
    fit = glmnet(X, y, binomial_probit(), nlambda=6)
    lam = float(np.asarray(fit.lambdas)[-1])
    pr = predict(fit, X, lam=lam, type="response",
                 family=binomial_probit())
    # The response really is Phi(eta), not sigmoid(eta) and not eta.
    el = predict(fit, X, lam=lam, type="link")
    np.testing.assert_allclose(pr, ndtr(el), rtol=1e-6)
    assert pr.min() >= 0.0 and pr.max() <= 1.0
    cl = predict(fit, X, lam=lam, type="class", family=binomial_probit)
    np.testing.assert_array_equal(cl, (pr > 0.5).astype(np.int64))
    # assess: deviance via the family's cv_loss; class/auc present.
    a = assess(fit, X, y, family=binomial_probit(), lam=lam)
    dev = -2.0 * (y * log_ndtr(el) + (1 - y) * log_ndtr(-el))
    np.testing.assert_allclose(a["deviance"], dev.mean(), rtol=1e-5)
    assert {"mse", "mae", "class", "auc"} <= set(a)
    # CV measures on the family object: class selects, mse uses Phi.
    cvc = cv_glmnet(X, y, binomial_probit(), nfolds=4, nlambda=6,
                    seed=0, type_measure="class")
    assert np.isfinite(np.asarray(cvc.cvm)).all()
    # gamma: mse on the MEAN scale (exp link), not the eta scale.
    yg = RNG.gamma(2.0, np.exp(eta) / 2.0) + 1e-6
    gfit = glmnet(X, yg, gamma_log(), nlambda=6)
    glam = float(np.asarray(gfit.lambdas)[-1])
    mu = predict(gfit, X, lam=glam, type="response", family=gamma_log())
    np.testing.assert_allclose(
        mu, np.exp(predict(gfit, X, lam=glam, type="link")), rtol=1e-6)
    ag = assess(gfit, X, yg, family=gamma_log(), lam=glam)
    np.testing.assert_allclose(ag["mse"], ((mu - yg) ** 2).mean(),
                               rtol=1e-6)


def test_consensus_family_objects_match_serial():
    """The distributed consensus GLM engine is family-generic: probit
    (bounded curvature -> fixed-majorizer workers) and gamma (unbounded
    -> exact-Newton workers) both converge to their serial solvers."""
    from admm_tpu.parallel.consensus import parallel_glm_lasso_path

    X, _, eta = _design(n=256, p=8)
    lams = np.array([0.05, 0.02])
    yb = (RNG.uniform(size=X.shape[0]) < ndtr(eta)).astype(float)
    par = parallel_glm_lasso_path(X, yb, binomial_probit(), nworkers=4,
                                  lambdas=lams, eps_abs=1e-6,
                                  eps_rel=1e-6)
    ser = glm_lasso_path(X, yb, binomial_probit(), lambdas=lams,
                         eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef),
                               np.asarray(ser.coef), atol=2e-3)
    yg = RNG.gamma(2.0, np.exp(eta) / 2.0) + 1e-6
    parg = parallel_glm_lasso_path(X, yg, gamma_log(), nworkers=4,
                                   lambdas=lams, eps_abs=1e-6,
                                   eps_rel=1e-6)
    serg = glm_lasso_path(X, yg, gamma_log(), lambdas=lams,
                          eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(parg.coef),
                               np.asarray(serg.coef), atol=2e-3)


def test_checkpoint_family_objects_and_param_fingerprint(tmp_path):
    """checkpointed_glm_path works for the new families, and the
    fingerprint distinguishes PARAMETRIZED likelihoods: a checkpoint
    written under negative_binomial(2.0) must refuse to resume under
    negative_binomial(3.0) (fam.param enters the model tag)."""
    from admm_tpu.diag.checkpoint import checkpointed_glm_path

    X, _, eta = _design(n=200, p=6)
    y = RNG.poisson(np.exp(eta)).astype(float)
    lams = np.geomspace(0.2, 0.01, 8)
    ck = str(tmp_path / "nb.npz")
    out = checkpointed_glm_path(X, y, negative_binomial(2.0),
                                lambdas=lams, checkpoint=ck,
                                chunk_size=3, _stop_after_chunks=1)
    assert out is None
    with pytest.raises(ValueError, match="different"):
        checkpointed_glm_path(X, y, negative_binomial(3.0),
                              lambdas=lams, checkpoint=ck, chunk_size=3)
    res = checkpointed_glm_path(X, y, negative_binomial(2.0),
                                lambdas=lams, checkpoint=ck,
                                chunk_size=3)
    full = glm_lasso_path(X, y, negative_binomial(2.0), lambdas=lams,
                          hessian="exact", path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(full.coef), atol=2e-5)


def test_big_glm_accepts_family_object():
    from admm_tpu import big_glm

    X, _, eta = _design(n=200, p=6)
    y = RNG.gamma(shape=2.0, scale=np.exp(eta) / 2.0) + 1e-6
    r = big_glm(X, y, gamma_log(), rho=1.0)
    assert np.asarray(r.lambdas).item() == 0.0
    assert np.isfinite(np.asarray(r.coef)).all()
