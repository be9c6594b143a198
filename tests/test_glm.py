"""Generic smooth-loss GLM families (admm_tpu.models.glm): huber and
poisson (binomial is oracle-tested in tests/test_logistic.py).

Oracles: huber with M -> inf must reduce EXACTLY to the gaussian Lasso;
at finite M the KKT subgradient conditions certify optimality directly;
poisson is checked by KKT plus support recovery on a seeded problem."""
import numpy as np
import pytest

from admm_tpu.models.glm import (glm_lasso_path, huber, huber_lasso_path,
                                 poisson, poisson_lasso_path)


def _problem(n=300, p=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [1.5, -2.0, 1.0, 0.5]
    y = 1.0 + X @ b + 0.4 * rng.normal(size=n)
    return X, y, b, rng


def test_huber_large_M_reduces_to_gaussian_lasso():
    from admm_tpu.models.lasso import lasso_path

    X, y, _, _ = _problem()
    lams = np.array([0.2, 0.05])
    h = huber_lasso_path(X, y, M=1e6, lambdas=lams, standardize=False,
                         eps_abs=1e-7, eps_rel=1e-7)
    g = lasso_path(X, y, lambdas=lams, standardize=False,
                   eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(h.coef), np.asarray(g.coef),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.beta0), np.asarray(g.beta0),
                               atol=1e-5)


def test_huber_kkt_at_finite_M():
    X, y, _, _ = _problem()
    n = X.shape[0]
    lam, M = 0.05, 1.0
    r = huber_lasso_path(X, y, M=M, lambdas=np.array([lam]),
                         standardize=False, eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(r.coef[0])
    eta = float(r.beta0[0]) + X @ b
    grad = X.T @ (-np.clip(y - eta, -M, M)) / n
    active = np.abs(b) > 1e-6
    # Subgradient optimality: |grad_j| <= lam off-support, grad_j =
    # -lam sign(b_j) on-support (to solver tolerance).
    assert np.abs(grad[~active]).max() <= lam * 1.001
    assert np.abs(grad[active] + lam * np.sign(b[active])).max() < 1e-4


def test_huber_robust_to_outliers():
    X, y, b, _ = _problem()
    yo = y.copy()
    yo[:10] += 50.0   # gross outliers
    from admm_tpu.models.lasso import lasso_path

    hr = huber_lasso_path(X, yo, M=1.345, lambdas=np.array([0.05]),
                          standardize=False)
    gr = lasso_path(X, yo, lambdas=np.array([0.05]), standardize=False)
    err_h = np.abs(np.asarray(hr.coef[0]) - b).max()
    err_g = np.abs(np.asarray(gr.coef[0]) - b).max()
    assert err_h < 0.2 and err_h < err_g / 3


def test_poisson_recovery_and_kkt():
    X, y, _, rng = _problem()
    eta_true = 0.3 + X[:, :3] @ np.array([0.4, -0.5, 0.3])
    yc = rng.poisson(np.exp(eta_true)).astype(float)
    n = X.shape[0]
    lam = 0.01
    r = poisson_lasso_path(X, yc, lambdas=np.array([lam]),
                           standardize=False, eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(r.coef[0])
    eta = float(r.beta0[0]) + X @ b
    grad = X.T @ (np.exp(eta) - yc) / n
    active = np.abs(b) > 1e-6
    assert np.abs(grad[~active]).max() <= lam * 1.001
    assert np.abs(grad[active] + lam * np.sign(b[active])).max() < 2e-4
    # True support is recovered dominantly.
    assert np.all(np.abs(b[:3]) > 0.1)


def test_glm_family_validation_and_factory_arg():
    from admm_tpu.models.glm import poisson

    X, y, _, _ = _problem(n=80, p=6)
    with pytest.raises(ValueError, match="alpha"):
        glm_lasso_path(X, y, huber(1.0), alpha=0.0)
    # A zero-arg factory is accepted in place of an instance.
    res = glm_lasso_path(X, np.clip(y, 0, None), poisson,
                         lambdas=np.array([0.1]))
    assert np.isfinite(np.asarray(res.coef)).all()


def test_no_intercept_standardize_does_not_center():
    """standardize=True with intercept=False must SCALE ONLY (flag-1
    semantics, data/standardize.py): centering would covertly fit the
    intercept the caller disabled.  beta0 must be exactly 0."""
    from admm_tpu.models.logistic import logistic_lasso_path

    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 8)) + 3.0   # strongly off-center columns
    y = (rng.uniform(size=200) < 0.5).astype(float)
    r = logistic_lasso_path(X, y, lambdas=np.array([0.02]),
                            intercept=False, standardize=True)
    assert float(np.asarray(r.beta0)[0]) == 0.0


def test_huber_lambda_max_nulls_under_asymmetric_outliers():
    """The huber auto-grid top must null the model even with skewed
    contamination: the null intercept is the huber location M-estimate,
    not the mean (which the outliers drag)."""
    X, y, b, rng = _problem()
    yy = X @ b + 0.3 * rng.normal(size=X.shape[0])
    yy[:15] += 40.0
    h = huber_lasso_path(X, yy, M=1.345, nlambda=8)
    assert np.abs(np.asarray(h.coef[0])).max() < 1e-3


def test_cv_glm_huber_and_poisson():
    """cv_glm_path scores folds with the family's own loss; selected
    models are sensible for both new families."""
    import admm_tpu
    from admm_tpu.models.glm import poisson

    X, y, b, rng = _problem(n=240, p=16, seed=4)
    yo = y.copy()
    yo[:8] += 25.0
    cvh = admm_tpu.cv_glm_path(X, yo, huber(1.345), nfolds=4, nlambda=10)
    assert np.isfinite(cvh.cvm).all() and cvh.lambda_1se >= cvh.lambda_min
    i = int(np.argmin(np.abs(cvh.lambdas - cvh.lambda_min)))
    assert np.all(np.abs(np.asarray(cvh.fit.coef[i])[:4]) > 0.2)

    eta = 0.2 + X[:, :3] @ np.array([0.4, -0.3, 0.3])
    yc = rng.poisson(np.exp(eta)).astype(float)
    cvp = admm_tpu.cv_glm_path(X, yc, poisson, nfolds=4, nlambda=10)
    assert np.isfinite(cvp.cvm).all()


def test_cv_newton_steps_default_follows_family():
    """The CV fits run each family's SHIPPED x-update protocol:
    poisson's measured newton_steps=1 default
    (models/glm.py::poisson_lasso_path), the generic 2 elsewhere —
    unless overridden."""
    from admm_tpu.models.cv import _default_newton_steps
    from admm_tpu.models.glm import _NEWTON_STEPS, binomial, poisson

    assert _default_newton_steps(poisson(), None) == 1
    assert _default_newton_steps(binomial(), None) == _NEWTON_STEPS
    assert _default_newton_steps(poisson(), 3) == 3


def test_huber_null_resid_extreme_contamination():
    """The huber null intercept must solve sum clip(y - mu, -M, M) = 0
    even when outliers at 1e6 empty the inlier window at the starting
    mean (advisor r2: the old undamped Newton stalled there; bisection
    on the monotone score is globally convergent)."""
    import jax.numpy as jnp

    M = 1.345
    rng = np.random.default_rng(3)
    y = np.concatenate([0.3 * rng.normal(size=90) + 0.29,
                        np.full(10, 1e6)])
    r = np.asarray(huber(M).null_resid(jnp.asarray(y), True))
    assert abs(r.sum()) < 1e-3 * len(y)


def test_fixed_majorizer_matches_exact_hessian():
    """hessian='fixed' (one-time-factorized curvature majorizer) must
    reproduce the exact-Hessian solutions for the bounded-curvature
    families, weighted included; poisson (unbounded curvature) must
    reject it loudly."""
    import jax.numpy as jnp

    from admm_tpu.models.glm import binomial, poisson

    rng = np.random.default_rng(8)
    n, p = 300, 16
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [1.5, -2.0, 1.0, 0.5]
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(0.3 + X @ b)))
         ).astype(float)
    w = rng.uniform(0.2, 3.0, n)
    for kw in (dict(), dict(weights=w)):
        e = glm_lasso_path(X, y, binomial(), nlambda=6, hessian="exact",
                           eps_abs=1e-7, eps_rel=1e-7, **kw)
        f = glm_lasso_path(X, y, binomial(), nlambda=6, hessian="fixed",
                           eps_abs=1e-7, eps_rel=1e-7, **kw)
        np.testing.assert_allclose(np.asarray(e.coef), np.asarray(f.coef),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(e.beta0),
                                   np.asarray(f.beta0), atol=2e-5)
    yh = X @ b + 0.3 * rng.normal(size=n)
    eh = huber_lasso_path(X, yh, nlambda=5, hessian="exact",
                          eps_abs=1e-7, eps_rel=1e-7)
    fh = huber_lasso_path(X, yh, nlambda=5, hessian="fixed",
                          eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(eh.coef), np.asarray(fh.coef),
                               atol=2e-5)
    yp = rng.poisson(np.exp(0.2 * (X @ b))).astype(float)
    with pytest.raises(ValueError, match="unbounded"):
        poisson_lasso_path(X, yp, nlambda=4, hessian="fixed")
    with pytest.raises(ValueError, match="hessian"):
        glm_lasso_path(X, y, binomial(), hessian="nope")


def test_offset_constant_equals_intercept_shift():
    """glmnet's offset: a CONSTANT offset c must reproduce the
    no-offset fit with the intercept shifted by -c (slopes identical),
    for binomial and poisson."""
    import jax.numpy as jnp

    from admm_tpu.models.glm import binomial, poisson

    rng = np.random.default_rng(71)
    n, p = 300, 10
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [1.0, -0.8, 0.5]
    c = 0.7
    cases = {
        "binomial": (binomial(),
                     (rng.uniform(size=n)
                      < 1 / (1 + np.exp(-(0.2 + X @ b))))
                     .astype(float)),
        "poisson": (poisson(),
                    rng.poisson(np.exp(0.3 + 0.3 * X @ b))
                    .astype(float)),
    }
    for name, (fam, y) in cases.items():
        base = glm_lasso_path(X, y, fam, nlambda=5,
                              eps_abs=1e-7, eps_rel=1e-7)
        off = glm_lasso_path(X, y, fam, nlambda=5,
                             offset=np.full(n, c),
                             eps_abs=1e-7, eps_rel=1e-7)
        # Same auto grid (the null score is offset-aware).
        np.testing.assert_allclose(np.asarray(base.lambdas),
                                   np.asarray(off.lambdas), rtol=1e-4,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(off.coef),
                                   np.asarray(base.coef), atol=3e-4,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(off.beta0),
                                   np.asarray(base.beta0) - c,
                                   atol=3e-4, err_msg=name)


def test_offset_kkt_poisson_exposure():
    """A genuine per-row offset (log exposure): KKT subgradient check
    at convergence with the offset in the predictor."""
    from admm_tpu.models.glm import poisson_lasso_path

    rng = np.random.default_rng(72)
    n, p = 300, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.5, -0.4], np.zeros(p - 2)])
    expo = rng.uniform(0.5, 4.0, n)
    y = rng.poisson(expo * np.exp(0.2 + X @ b)).astype(float)
    lam = 0.05
    off = np.log(expo)
    r = poisson_lasso_path(X, y, lambdas=np.array([lam]),
                           standardize=False, offset=off,
                           eps_abs=1e-8, eps_rel=1e-8)
    b0, coef = float(r.beta0[0]), np.asarray(r.coef)[0]
    eta = b0 + X @ coef + off
    g = X.T @ (np.exp(eta) - y) / n
    act = np.abs(coef) > 1e-6
    np.testing.assert_allclose(g[act], -lam * np.sign(coef[act]),
                               atol=5e-4)
    assert np.all(np.abs(g[~act]) <= lam * (1 + 1e-3))
    # Intercept (unpenalized): gradient zero.
    assert abs(np.mean(np.exp(eta) - y)) < 5e-4


def test_poisson_adaptive_majorizer_matches_exact():
    """The shipped poisson engine (hessian='adaptive': per-lambda
    refreshed majorizer + pointwise curvature-ratio damping) solves the
    SAME problems as exact per-step Newton — including the regime that
    diverges WITHOUT the safeguard (e^eta growing ~10x along the
    path)."""
    rng = np.random.default_rng(11)
    n, p = 300, 25
    X = rng.normal(size=(n, p))
    b = np.zeros(p); b[:4] = [0.6, -0.4, 0.3, -0.2]
    y = rng.poisson(np.exp(0.5 + X @ b)).astype(float)
    ex = glm_lasso_path(X, y, poisson, nlambda=15, hessian="exact",
                        eps_abs=1e-7, eps_rel=1e-7)
    ad = glm_lasso_path(X, y, poisson, nlambda=15, hessian="adaptive",
                        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(ad.coef), np.asarray(ex.coef),
                               atol=2e-6)
    # auto resolves to adaptive for the unbounded family
    au = glm_lasso_path(X, y, poisson, nlambda=15,
                        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_array_equal(np.asarray(au.coef),
                                  np.asarray(ad.coef))
    # weights + offset ride the adaptive engine too
    w = rng.uniform(0.5, 2.0, n)
    off = np.log(rng.uniform(0.5, 2.0, n))
    ex2 = glm_lasso_path(X, y, poisson, nlambda=8, hessian="exact",
                         weights=w, offset=off,
                         eps_abs=1e-7, eps_rel=1e-7)
    ad2 = glm_lasso_path(X, y, poisson, nlambda=8, hessian="adaptive",
                         weights=w, offset=off,
                         eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(ad2.coef),
                               np.asarray(ex2.coef), atol=2e-6)
