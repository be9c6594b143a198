"""Relaxed lasso (admm_tpu.models.relaxed — glmnet's relax=TRUE)."""
import numpy as np
import pytest

from admm_tpu.models.relaxed import (cv_relaxed_lasso_path,
                                     relaxed_lasso_path)


def _problem(n=200, p=20, seed=0):
    rng = np.random.default_rng(seed)
    b = np.zeros(p)
    b[:5] = [2.0, -1.5, 1.0, -0.8, 0.6]
    X = rng.normal(size=(n, p))
    y = 1.0 + X @ b + 0.4 * rng.normal(size=n)
    return X, y, b


def test_gamma_one_is_the_lasso():
    X, y, _ = _problem()
    r = relaxed_lasso_path(X, y, nlambda=8, gammas=(0.0, 1.0))
    np.testing.assert_allclose(np.asarray(r.coef)[1],
                               np.asarray(r.fit.coef), atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.beta0)[1],
                               np.asarray(r.fit.beta0), atol=1e-7)


def test_gamma_zero_is_the_support_restricted_ls():
    """The gamma = 0 end must equal numpy lstsq on each support
    (raw scale, no intercept, for an exact oracle)."""
    X, y, _ = _problem()
    r = relaxed_lasso_path(X, y, nlambda=6, gammas=(0.0,),
                           standardize=False, intercept=False,
                           eps_abs=1e-7, eps_rel=1e-7)
    coefs = np.asarray(r.fit.coef)
    refit = np.asarray(r.refit_coef)
    for i in range(coefs.shape[0]):
        S = np.flatnonzero(np.abs(coefs[i]) > 0)
        expect = np.zeros(coefs.shape[1])
        if S.size:
            expect[S] = np.linalg.lstsq(X[:, S], y, rcond=None)[0]
        np.testing.assert_allclose(refit[i], expect, atol=2e-4)


def test_blend_is_affine():
    X, y, _ = _problem()
    r = relaxed_lasso_path(X, y, nlambda=5, gammas=(0.0, 0.5, 1.0))
    c = np.asarray(r.coef)
    np.testing.assert_allclose(c[1], 0.5 * (c[0] + c[2]), atol=1e-6)


def test_refit_debiases_and_cv_selects():
    """On a strong sparse signal the refit end recovers the true
    coefficients better than the shrunken lasso at the same lambda, and
    the joint (lambda, gamma) CV picks a small gamma."""
    X, y, b = _problem(n=300)
    r = relaxed_lasso_path(X, y, nlambda=20)
    c = np.asarray(r.coef)
    # The debiasing shows where shrinkage is heaviest: the LARGEST
    # lambda whose lasso support is exactly the true support.
    true_S = frozenset(np.flatnonzero(b))
    i = next(i for i in range(c.shape[1])
             if frozenset(np.flatnonzero(np.abs(c[-1, i]) > 1e-6))
             == true_S)
    err_lasso = np.abs(c[-1, i] - b).max()   # gamma = 1
    err_refit = np.abs(c[0, i] - b).max()    # gamma = 0
    assert err_refit < err_lasso

    cv = cv_relaxed_lasso_path(X, y, nfolds=4, nlambda=12,
                               gammas=(0.0, 0.5, 1.0))
    assert cv["cvm"].shape == (3, 12)
    assert np.isfinite(cv["cvm"]).all()
    assert cv["gamma_min"] in (0.0, 0.5)  # debiasing helps here


def test_relaxed_weighted_refit_matches_duplication():
    """Integer weights == row duplication for the whole (lambda, gamma)
    grid — the refit must be the WEIGHTED least squares, not the plain
    one."""
    X, y, _ = _problem(n=120, p=10, seed=3)
    rng = np.random.default_rng(4)
    w = rng.integers(1, 4, 120).astype(float)
    Xd = np.repeat(X, w.astype(int), axis=0)
    yd = np.repeat(y, w.astype(int))
    a = relaxed_lasso_path(X, y, nlambda=5, gammas=(0.0, 0.5),
                           weights=w, eps_abs=1e-7, eps_rel=1e-7)
    d = relaxed_lasso_path(Xd, yd, nlambda=5, gammas=(0.0, 0.5),
                           eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=3e-4)


def test_cv_relaxed_onepass_matches_loop():
    """The relaxed lasso's one-program fold sweep (weighted paths +
    weighted refits as fold lanes) equals the host per-fold refit."""
    from admm_tpu.models.relaxed import cv_relaxed_lasso_path

    rng = np.random.default_rng(23)
    n, p = 150, 12
    X = rng.normal(size=(n, p))
    y = X[:, 0] - 0.7 * X[:, 2] + 0.3 * rng.normal(size=n)
    w = rng.uniform(0.5, 2.0, n)
    for kw in ({}, {"weights": w, "alpha": 0.8}):
        a = cv_relaxed_lasso_path(X, y, nfolds=3, nlambda=8, seed=0,
                                  cv_mode="onepass",
                                  eps_abs=1e-7, eps_rel=1e-7, **kw)
        b = cv_relaxed_lasso_path(X, y, nfolds=3, nlambda=8, seed=0,
                                  cv_mode="loop",
                                  eps_abs=1e-7, eps_rel=1e-7, **kw)
        np.testing.assert_allclose(a["cvm"], b["cvm"], rtol=2e-3,
                                   err_msg=str(kw))
        assert (np.unravel_index(np.argmin(a["cvm"]), a["cvm"].shape)
                == np.unravel_index(np.argmin(b["cvm"]),
                                    b["cvm"].shape)), kw
    with pytest.raises(ValueError, match="onepass"):
        cv_relaxed_lasso_path(X, y, nlambda=4, cv_mode="onepass",
                              exclude=[0])


def test_relax_front_door_enet_grid_and_weighted_cvm():
    """Review fixes: relax=True at alpha<1 keeps the enet lambda
    convention (same auto grid as relax=False), and weighted relaxed
    CV aggregates with glmnet's weighted cvm."""
    import admm_tpu
    from admm_tpu.models.relaxed import cv_relaxed_lasso_path

    rng = np.random.default_rng(29)
    n, p = 130, 10
    X = rng.normal(size=(n, p))
    y = X[:, 0] - 0.6 * X[:, 3] + 0.2 * rng.normal(size=n)
    fit_r = admm_tpu.glmnet(X, y, alpha=0.5, relax=True, nlambda=8)
    fit_e = admm_tpu.glmnet(X, y, alpha=0.5, nlambda=8)
    np.testing.assert_allclose(np.asarray(fit_r.lambdas),
                               np.asarray(fit_e.lambdas), rtol=1e-6)
    # gamma = 1 slice reproduces the enet fit on the same grid.
    np.testing.assert_allclose(np.asarray(fit_r.coef)[-1],
                               np.asarray(fit_e.coef), atol=2e-5)

    w = rng.uniform(0.5, 2.0, n)
    cv = cv_relaxed_lasso_path(X, y, nfolds=3, nlambda=6, seed=0,
                               weights=w, cv_mode="onepass")
    cl = cv_relaxed_lasso_path(X, y, nfolds=3, nlambda=6, seed=0,
                               weights=w, cv_mode="loop")
    np.testing.assert_allclose(cv["cvm"], cl["cvm"], rtol=2e-3)
    # Hand-check the weighted aggregation on the loop mode's errors.
    cu = cv_relaxed_lasso_path(X, y, nfolds=3, nlambda=6, seed=0,
                               cv_mode="loop")
    assert not np.allclose(cl["cvm"], cu["cvm"])   # weights matter
