"""l1-penalized quantile regression: sklearn QuantileRegressor oracle,
LAD reduction, pivotal structure of the grids, weights, protocols, CV."""
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.linear_model import QuantileRegressor

from admm_tpu.models.quantile import (cv_quantile_lasso_path,
                                      pinball_loss,
                                      quantile_lasso_path)


def _problem(n=200, p=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [1.5, -1.0, 0.5]
    y = 0.7 + X @ b + rng.standard_t(df=3, size=n)
    return X, y


def test_matches_sklearn_quantile_regressor():
    """Identical objective at standardize=False: coefficient AND
    intercept agreement with the LP solver across taus and lambdas."""
    X, y = _problem()
    for tau in (0.3, 0.5, 0.8):
        for lam in (0.1, 0.02):
            r = quantile_lasso_path(X, y, tau=tau, lambdas=[lam],
                                    standardize=False,
                                    dtype=jnp.float64, eps_abs=1e-9,
                                    eps_rel=1e-9, maxit=100000)
            sk = QuantileRegressor(quantile=tau, alpha=lam,
                                   solver="highs").fit(X, y)
            assert np.abs(np.asarray(r.coef[0, 0])
                          - sk.coef_).max() < 1e-6
            assert abs(float(r.beta0[0, 0]) - sk.intercept_) < 1e-6


def test_tau_half_tiny_lambda_approaches_lad():
    """tau = 0.5 at lambda -> 0 is median regression — agreement with
    the LAD fit (which shares the check-loss prox)."""
    from admm_tpu.models.lad import lad_fit

    X, y = _problem(seed=1)
    r = quantile_lasso_path(X, y, tau=0.5, lambdas=[1e-8],
                            dtype=jnp.float64, eps_abs=1e-9,
                            eps_rel=1e-9, maxit=100000)
    lad = lad_fit(X, y, eps_abs=1e-9, eps_rel=1e-9, maxit=100000)
    assert np.abs(np.asarray(r.coef[0, 0])
                  - np.asarray(lad.coef)).max() < 1e-5
    assert abs(float(r.beta0[0, 0]) - float(lad.beta0)) < 1e-5


def test_auto_grid_null_and_protocols():
    """Grid tops: every tau's first path point is exactly null; batch
    and scan protocols agree; tau x lambda lanes shape correctly."""
    X, y = _problem(seed=2)
    taus = np.array([0.25, 0.5, 0.75])
    rb = quantile_lasso_path(X, y, tau=taus, nlambda=5,
                             dtype=jnp.float64)
    assert rb.coef.shape == (3, 5, 10)
    assert rb.lambdas.shape == (3, 5)
    for t in range(3):
        assert (np.asarray(rb.coef[t, 0]) == 0).all()
        assert (np.asarray(rb.coef[t, -1]) != 0).any()
    rs = quantile_lasso_path(X, y, tau=taus, nlambda=5,
                             dtype=jnp.float64, path_mode="scan")
    # Cold lanes and the warm scan take different routes to the same
    # optimum; the check loss's flat pieces put the coefficient
    # accuracy floor at ~eps*100 (DESIGN.md "quantile rho"), so the
    # protocols agree to ~1e-3 at eps 1e-6 (the sklearn oracle test
    # pins absolute accuracy at tight eps).
    assert np.abs(np.asarray(rb.coef) - np.asarray(rs.coef)).max() < 1e-3
    with pytest.raises(ValueError, match="tau"):
        quantile_lasso_path(X, y, tau=1.5)
    with pytest.raises(ValueError, match="path_mode"):
        quantile_lasso_path(X, y, path_mode="nope")


def test_weights_match_row_duplication():
    """Integer weight k == repeating the row k times (weights enter
    the check-loss prox thresholds directly, NOT as sqrt-row-scaling —
    the loss is 1-homogeneous)."""
    X, y = _problem(n=80, seed=3)
    w = np.ones(80)
    w[:6] = 2.0
    Xd = np.concatenate([X, X[:6]], axis=0)
    yd = np.concatenate([y, y[:6]])
    kw = dict(tau=0.7, lambdas=[0.08, 0.02], dtype=jnp.float64,
              eps_abs=1e-8, eps_rel=1e-8, maxit=100000)
    rw = quantile_lasso_path(X, y, weights=w, **kw)
    rd = quantile_lasso_path(Xd, yd, **kw)
    assert np.abs(np.asarray(rw.coef) - np.asarray(rd.coef)).max() < 1e-5


def test_quantile_crossing_structure():
    """Predicted quantiles are ordered on average (the fitted tau-th
    quantile levels increase with tau) and the residual sign fractions
    track tau — the defining property of the check loss."""
    X, y = _problem(n=400, seed=4)
    taus = np.array([0.2, 0.5, 0.8])
    r = quantile_lasso_path(X, y, tau=taus, lambdas=[0.02],
                            dtype=jnp.float64, eps_abs=1e-8,
                            eps_rel=1e-8, maxit=100000)
    for t in range(3):
        eta = float(r.beta0[t, 0]) + X @ np.asarray(r.coef[t, 0])
        frac_below = (y < eta).mean()
        assert abs(frac_below - taus[t]) < 0.06
    e = [float(r.beta0[t, 0]) + X @ np.asarray(r.coef[t, 0])
         for t in range(3)]
    assert (e[1] - e[0]).mean() > 0 and (e[2] - e[1]).mean() > 0


def test_cv_onepass_matches_loop():
    X, y = _problem(n=150, p=8, seed=5)
    kw = dict(tau=np.array([0.4, 0.6]), nfolds=4, nlambda=4, seed=3,
              eps_abs=1e-7, eps_rel=1e-7, maxit=60000)
    one = cv_quantile_lasso_path(X, y, cv_mode="onepass", **kw)
    loop = cv_quantile_lasso_path(X, y, cv_mode="loop", **kw)
    assert one["cvm"] == pytest.approx(loop["cvm"], rel=1e-3, abs=1e-6)
    np.testing.assert_array_equal(one["lambda_min"], loop["lambda_min"])
    assert one["cvm"].shape == (2, 4)
    assert (one["lambda_1se"] >= one["lambda_min"] - 1e-12).all()
    with pytest.raises(ValueError, match="cv_mode"):
        cv_quantile_lasso_path(X, y, cv_mode="nope")


def test_pinball_loss_definition():
    r = pinball_loss(np.zeros(3), np.array([1.0, -1.0, 0.0]), 0.3)
    np.testing.assert_allclose(r, [0.3, 0.7, 0.0])


def test_trace_records_residuals():
    r = quantile_lasso_path(*_problem(n=120, p=6, seed=6), tau=0.4,
                            lambdas=[0.1, 0.03], trace_len=25,
                            maxit=5000)
    assert r.trace.shape == (1, 2, 25, 5)
    assert np.isfinite(np.asarray(r.trace)[0, 0, 0]).all()


def test_predict_selects_tau_lane():
    from admm_tpu.predict import predict

    X, y = _problem(n=150, p=8, seed=7)
    r = quantile_lasso_path(X, y, tau=[0.3, 0.7], nlambda=4,
                            maxit=20000)
    eta = predict(r, X, tau=0.7)
    assert eta.shape == (4, 150)
    manual = (np.asarray(r.beta0[1])[:, None]
              + np.asarray(r.coef[1]) @ X.T)
    np.testing.assert_allclose(eta, manual, rtol=1e-6)
    # lam interpolation on the tau lane's own grid.
    mid = float(np.sqrt(r.lambdas[1, 1] * r.lambdas[1, 2]))
    e1 = predict(r, X, tau=0.7, lam=mid)
    assert e1.shape == (150,)
    with pytest.raises(ValueError, match="tau grid"):
        predict(r, X)
    with pytest.raises(ValueError, match="not on the fitted grid"):
        predict(r, X, tau=0.55)


def test_predict_from_cv_dict():
    from admm_tpu.predict import predict

    X, y = _problem(n=120, p=6, seed=8)
    cv = cv_quantile_lasso_path(X, y, tau=[0.3, 0.7], nfolds=3,
                                nlambda=4, maxit=20000)
    eta = predict(cv, X, tau=0.3)              # lambda_min default
    assert eta.shape == (120,)
    e2 = predict(cv, X, tau=0.3, lam="lambda.1se")
    assert e2.shape == (120,)
    with pytest.raises(ValueError, match="lambda"):
        predict(cv, X, tau=0.3, lam="nope")
