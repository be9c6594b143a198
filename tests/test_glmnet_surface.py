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


# ---------------------------------------------------------------------------
# penalty_factor / limits / exclude for the GLM tier (glmnet applies
# its per-coefficient arguments to every family)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def glm_prob():
    rng = np.random.default_rng(3)
    n, p = 250, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[1.5, -1.5, 1.0], np.zeros(p - 3)])
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ b)))).astype(float)
    return X, y


def test_glm_neutral_pf_limits_are_noop(glm_prob):
    X, y = glm_prob
    p = X.shape[1]
    base = admm_tpu.logistic_lasso_path(X, y, nlambda=6)
    neut = admm_tpu.logistic_lasso_path(
        X, y, nlambda=6, penalty_factor=np.ones(p),
        lower_limits=-np.inf, upper_limits=np.inf)
    np.testing.assert_array_equal(np.asarray(base.coef),
                                  np.asarray(neut.coef))


def test_glm_penalty_factor_column_rescaling_oracle(glm_prob):
    """pf_j-weighted penalty == uniform penalty on X_j / pf_j with
    b_j = c_j / pf_j (the gaussian path's oracle, applied to the
    logistic family; factors pre-rescaled to sum p as the driver
    does)."""
    X, y = glm_prob
    p = X.shape[1]
    pf = np.array([2.0, 0.5, 1.0, 3.0, 1.0, 1.0, 0.5, 1.0])
    pfs = pf * (p / pf.sum())
    lams = np.geomspace(0.1, 0.005, 6)
    r1 = admm_tpu.logistic_lasso_path(
        X, y, lambdas=lams, standardize=False, penalty_factor=pf,
        eps_abs=1e-7, eps_rel=1e-7)
    r2 = admm_tpu.logistic_lasso_path(
        X / pfs, y, lambdas=lams, standardize=False,
        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(r1.coef),
                               np.asarray(r2.coef) / pfs, atol=3e-5)


def test_glm_zero_pf_always_in_and_grid_top(glm_prob):
    X, y = glm_prob
    p = X.shape[1]
    pf = np.ones(p)
    pf[0] = 0.0
    res = admm_tpu.logistic_lasso_path(X, y, nlambda=8,
                                       penalty_factor=pf)
    c = np.asarray(res.coef)
    # Unpenalized coordinate is active along the whole path.  (With an
    # unpenalized variable present the intercept-only gradient no
    # longer EXACTLY nulls the penalized coordinates at the grid top —
    # same as glmnet and the gaussian path — so assert near-null.)
    assert np.all(np.abs(c[:, 0]) > 1e-4)
    assert np.abs(c[0, 1:]).max() < 0.1 * np.abs(c[-1, 1:]).max()


def test_glm_exclude_matches_drop_column(glm_prob):
    X, y = glm_prob
    lams = np.geomspace(0.1, 0.005, 6)
    res = admm_tpu.logistic_lasso_path(X, y, lambdas=lams,
                                       exclude=[1, 4],
                                       eps_abs=1e-7, eps_rel=1e-7)
    c = np.asarray(res.coef)
    assert np.all(c[:, [1, 4]] == 0.0)
    keepc = [j for j in range(X.shape[1]) if j not in (1, 4)]
    ref = admm_tpu.logistic_lasso_path(X[:, keepc], y, lambdas=lams,
                                       eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(c[:, keepc], np.asarray(ref.coef),
                               atol=2e-5)


def test_glm_nonnegative_and_box(glm_prob):
    X, y = glm_prob
    res = admm_tpu.logistic_lasso_path(X, y, nlambda=6,
                                       lower_limits=0.0)
    c = np.asarray(res.coef)
    assert c.min() >= 0.0
    assert (c[-1] > 1e-6).sum() >= 2     # positive-truth coords survive
    box = admm_tpu.logistic_lasso_path(X, y, nlambda=6,
                                       lower_limits=-0.4,
                                       upper_limits=0.4)
    cb = np.asarray(box.coef)
    assert cb.min() >= -0.4 - 1e-6 and cb.max() <= 0.4 + 1e-6
    with pytest.raises(ValueError, match="lower <= 0 <= upper"):
        admm_tpu.logistic_lasso_path(X, y, nlambda=4, lower_limits=0.1)


def test_glm_pf_limits_other_families(glm_prob):
    """poisson (adaptive majorizer) and huber (fixed majorizer /
    kernel bypass) take the same arguments."""
    X, _ = glm_prob
    rng = np.random.default_rng(4)
    n, p = X.shape
    pf = np.ones(p); pf[2] = 2.5
    yp = rng.poisson(np.exp(0.2 + 0.5 * X[:, 0])).astype(float)
    rp = admm_tpu.poisson_lasso_path(X, yp, nlambda=5,
                                     penalty_factor=pf,
                                     upper_limits=1.0)
    cp = np.asarray(rp.coef)
    assert np.isfinite(cp).all() and cp.max() <= 1.0 + 1e-6
    yh = X[:, 0] + 0.2 * rng.normal(size=n)
    rh = admm_tpu.huber_lasso_path(X, yh, nlambda=5, lower_limits=0.0)
    assert np.asarray(rh.coef).min() >= 0.0


def test_cv_exclude_onepass_matches_loop(prob):
    """REGRESSION: the one-pass fold sweep must honor exclude (it once
    dropped it while the full fit and the loop fallback applied it)."""
    X, y = prob
    kw = dict(nfolds=4, nlambda=8, seed=0, exclude=[0, 2])
    cv1 = admm_tpu.cv_lasso_path(X, y, cv_mode="onepass", **kw)
    cv2 = admm_tpu.cv_lasso_path(X, y, cv_mode="loop", **kw)
    np.testing.assert_allclose(cv1.cvm, cv2.cvm, rtol=1e-4)
    assert np.all(np.asarray(cv1.fit.coef)[:, [0, 2]] == 0.0)


def test_cv_glm_pf_limits_onepass_matches_loop(glm_prob):
    X, y = glm_prob
    p = X.shape[1]
    pf = np.ones(p); pf[3] = 3.0
    kw = dict(nfolds=4, nlambda=6, seed=0, penalty_factor=pf,
              lower_limits=-0.5, upper_limits=2.0)
    c1 = admm_tpu.cv_logistic_path(X, y, cv_mode="onepass", **kw)
    c2 = admm_tpu.cv_logistic_path(X, y, cv_mode="loop", **kw)
    np.testing.assert_allclose(c1.cvm, c2.cvm, rtol=1e-5, atol=1e-7)
    c = np.asarray(c1.fit.coef)
    assert c.min() >= -0.5 - 1e-6 and c.max() <= 2.0 + 1e-6
