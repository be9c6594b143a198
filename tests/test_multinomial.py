"""Sparse multinomial (softmax) regression (admm_tpu.models.multinomial).

Extension beyond the reference; oracle: sklearn LogisticRegression with
the multinomial saga solver (identical objective up to the softmax
intercept gauge, which both sides fix by sum-to-zero centering)."""
import numpy as np
import pytest

from admm_tpu.models.multinomial import multinomial_lasso_path


def _problem(n=400, p=12, C=3, seed=0):
    rng = np.random.default_rng(seed)
    B = np.zeros((p, C))
    B[:4] = rng.uniform(0.8, 2.0, (4, C)) * rng.choice([-1, 1], (4, C))
    X = rng.normal(size=(n, p))
    eta = 0.3 * rng.normal(size=C) + X @ B
    pr = np.exp(eta - eta.max(axis=1, keepdims=True))
    pr /= pr.sum(axis=1, keepdims=True)
    y = np.array([rng.choice(C, p=pi) for pi in pr])
    return X, y, B


def test_matches_sklearn_multinomial_saga():
    from sklearn.linear_model import LogisticRegression

    X, y, _ = _problem()
    n = X.shape[0]
    lam = 0.02
    r = multinomial_lasso_path(X, y, lambdas=np.array([lam]),
                               standardize=False, eps_abs=1e-7,
                               eps_rel=1e-7)
    sk = LogisticRegression(penalty="l1", C=1.0 / (n * lam),
                            solver="saga", tol=1e-10, max_iter=200000,
                            fit_intercept=True)
    sk.fit(X, y)
    np.testing.assert_allclose(np.asarray(r.coef)[0], sk.coef_.T,
                               atol=3e-4)
    sk_b0 = sk.intercept_ - sk.intercept_.mean()
    np.testing.assert_allclose(np.asarray(r.beta0)[0], sk_b0, atol=3e-4)


def test_grid_top_nulls_and_path_is_finite():
    X, y, _ = _problem(seed=2)
    r = multinomial_lasso_path(X, y, nlambda=8)
    c = np.asarray(r.coef)
    assert np.all(np.isfinite(c))
    assert np.allclose(c[0], 0.0)       # all slopes zero at lambda_max
    assert np.abs(c[-1]).max() > 0.5    # signal recovered at the bottom


def test_grouped_penalty_shared_support():
    """type.multinomial='grouped': a feature's row dies for ALL classes
    at once."""
    X, y, _ = _problem(n=500, seed=3)
    r = multinomial_lasso_path(X, y, nlambda=6, grouped=True,
                               eps_abs=1e-6, eps_rel=1e-6)
    mid = np.asarray(r.coef)[3]
    rownz = np.abs(mid).max(axis=1) > 1e-6
    for j in range(mid.shape[0]):
        if rownz[j]:
            assert np.all(np.abs(mid[j]) > 0), f"row {j} partially zero"
    # Grid top nulls the model to solver tolerance (the l2 prox reaches
    # exact zero only strictly inside the boundary, hence the 1.001
    # lambda_max nudge; residual magnitudes are O(eps)).
    assert np.abs(np.asarray(r.coef)[0]).max() < 1e-4


def test_batch_matches_scan():
    X, y, _ = _problem(n=300, seed=4)
    b = multinomial_lasso_path(X, y, nlambda=5, path_mode="batch",
                               eps_abs=1e-6, eps_rel=1e-6)
    s = multinomial_lasso_path(X, y, nlambda=5, path_mode="scan",
                               eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(s.coef),
                               atol=3e-4)


def test_validates_inputs():
    X, y, _ = _problem()
    with pytest.raises(ValueError, match="classes"):
        multinomial_lasso_path(X, np.zeros(X.shape[0]))
    with pytest.raises(ValueError, match="alpha"):
        multinomial_lasso_path(X, y, alpha=0.0)


def test_cv_multinomial():
    from admm_tpu.models.cv import cv_multinomial_path

    X, y, _ = _problem(n=240, seed=6)
    cv = cv_multinomial_path(X, y, nfolds=4, nlambda=6, maxit=2000)
    assert np.all(np.isfinite(cv.cvm)) and np.all(cv.cvsd >= 0)
    assert cv.lambda_1se >= cv.lambda_min
    # Deviance at lambda_min beats the null top of the grid.
    assert cv.cvm[np.argmin(np.abs(cv.lambdas - cv.lambda_min))] \
        < cv.cvm[0]


def test_multinomial_trace_and_data_mesh():
    from admm_tpu.parallel.mesh import make_mesh

    X, y, _ = _problem(n=160, seed=9)
    r = multinomial_lasso_path(X, y, nlambda=4, trace_len=64,
                               maxit=500)
    assert r.trace.shape == (4, 64, 5)
    rep = multinomial_lasso_path(X, y, nlambda=4, maxit=500)
    shd = multinomial_lasso_path(X, y, nlambda=4, maxit=500,
                                 data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef),
                               np.asarray(rep.coef), atol=2e-4)


def test_multinomial_penalty_factor_and_exclude():
    """glmnet's penalty.factor / exclude for family='multinomial':
    column-rescaling oracle (ungrouped), zero-factor variable always
    in, exclusion exact for the grouped penalty too."""
    import admm_tpu

    rng = np.random.default_rng(12)
    n, p, C = 200, 10, 3
    X = rng.normal(size=(n, p))
    y = np.argmax(X @ (rng.normal(size=(p, C)) * 2.0)
                  + rng.gumbel(size=(n, C)), axis=1)

    pf = np.array([2.0, 0.5, 1.0, 3.0, 1.0, 1.0, 0.5, 1.0, 1.0, 2.0])
    pfs = pf * (p / pf.sum())
    lams = np.geomspace(0.1, 0.01, 5)
    r1 = admm_tpu.multinomial_lasso_path(X, y, lambdas=lams,
                                         standardize=False,
                                         penalty_factor=pf,
                                         eps_abs=1e-7, eps_rel=1e-7)
    r2 = admm_tpu.multinomial_lasso_path(X / pfs, y, lambdas=lams,
                                         standardize=False,
                                         eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(
        np.asarray(r1.coef), np.asarray(r2.coef) / pfs[:, None],
        atol=1e-4)

    pf0 = np.ones(p)
    pf0[0] = 0.0
    r0 = admm_tpu.multinomial_lasso_path(X, y, nlambda=6,
                                         penalty_factor=pf0)
    assert np.all(np.abs(np.asarray(r0.coef)[:, 0]).max(axis=1) > 1e-4)

    for grouped in (False, True):
        re = admm_tpu.multinomial_lasso_path(X, y, nlambda=6,
                                             exclude=[1, 4],
                                             grouped=grouped)
        assert np.abs(np.asarray(re.coef)[:, [1, 4]]).max() == 0.0


def test_multinomial_offset_invariances():
    """glmnet's (n, C) multinomial offset: a per-row constant across
    classes is the softmax gauge (fit invariant); a per-CLASS constant
    is absorbed by the sum-to-zero intercepts (coef invariant, beta0
    shifted by the centered offset); the offset-aware auto grid still
    nulls the model at its top."""
    import admm_tpu

    rng = np.random.default_rng(15)
    n, p, C = 150, 8, 3
    X = rng.normal(size=(n, p))
    y = np.argmax(X @ (rng.normal(size=(p, C)) * 2.0)
                  + rng.gumbel(size=(n, C)), axis=1)
    lams = np.geomspace(0.1, 0.01, 5)
    m0 = admm_tpu.multinomial_lasso_path(X, y, lambdas=lams,
                                         eps_abs=1e-7, eps_rel=1e-7)
    r = rng.normal(size=n)
    mg = admm_tpu.multinomial_lasso_path(
        X, y, lambdas=lams, offset=np.tile(r[:, None], (1, C)),
        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(m0.coef), np.asarray(mg.coef),
                               atol=1e-5)
    o = np.array([0.7, -0.3, 0.1])
    mc = admm_tpu.multinomial_lasso_path(
        X, y, lambdas=lams, offset=np.tile(o, (n, 1)),
        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(m0.coef), np.asarray(mc.coef),
                               atol=1e-5)
    shift = np.asarray(m0.beta0) - np.asarray(mc.beta0)
    np.testing.assert_allclose(
        shift, np.broadcast_to(o - o.mean(), shift.shape), atol=1e-5)
    ma = admm_tpu.multinomial_lasso_path(X, y, nlambda=6,
                                         offset=np.tile(o, (n, 1)))
    assert np.abs(np.asarray(ma.coef)[0]).max() < 1e-6
