"""glmnet-style path summary (Df / %Dev / Lambda) and the CV curve
plot (admm_tpu/summary.py, plotting.plot_cv_curve)."""
import numpy as np
import pytest

import admm_tpu
from admm_tpu.models.glm import binomial, poisson
from admm_tpu.models.lasso import lasso_path


@pytest.fixture(scope="module")
def gauss():
    rng = np.random.default_rng(0)
    n, p = 200, 30
    X = rng.normal(size=(n, p))
    b = np.zeros(p); b[:4] = [1.0, -0.8, 0.6, -0.5]
    y = X @ b + 0.5 * rng.normal(size=n)
    return X, y


def test_path_table_gaussian_matches_ols_r2(gauss):
    X, y = gauss
    n = y.size
    res = lasso_path(X, y, nlambda=20)
    t = admm_tpu.path_table(res, X, y)
    # Df: exact nonzeros, monotone-ish growth down the path; %Dev
    # nondecreasing and converging to the OLS R^2 at vanishing lambda.
    assert t.df[0] <= 1 and t.df[-1] == X.shape[1]
    assert np.all(np.diff(t.dev_ratio) >= -1e-9)
    A = np.c_[np.ones(n), X]
    ols = np.linalg.lstsq(A, y, rcond=None)[0]
    r2 = 1 - np.sum((y - A @ ols) ** 2) / np.sum((y - y.mean()) ** 2)
    assert abs(float(t.dev_ratio[-1]) - r2) < 1e-3
    # formatted table renders one line per lambda + header
    s = admm_tpu.format_path_table(t)
    assert len(s.splitlines()) == 21 and "%Dev" in s


def test_path_table_weighted_null_is_zero_dev(gauss):
    X, y = gauss
    rng = np.random.default_rng(1)
    w = rng.uniform(0.5, 2.0, y.size)
    res = lasso_path(X, y, nlambda=12, weights=w)
    t = admm_tpu.path_table(res, X, y, weights=w)
    # At lambda_max the model IS the weighted null -> %Dev ~ 0.
    assert abs(float(t.dev_ratio[0])) < 1e-3
    assert float(t.dev_ratio[-1]) > 0.5


def test_path_table_glm_families(gauss):
    X, y = gauss
    rng = np.random.default_rng(2)
    eta = X[:, :3] @ np.array([1.0, -0.8, 0.6])
    yb = (rng.uniform(size=y.size) < 1 / (1 + np.exp(-eta))).astype(float)
    rb = admm_tpu.logistic_lasso_path(X, yb, nlambda=15)
    tb = admm_tpu.path_table(rb, X, yb, family=binomial)
    assert abs(float(tb.dev_ratio[0])) < 0.02
    assert float(tb.dev_ratio[-1]) > 0.2
    yp = rng.poisson(np.exp(0.2 + 0.3 * eta)).astype(float)
    rp = admm_tpu.poisson_lasso_path(X, yp, nlambda=15)
    tp = admm_tpu.path_table(rp, X, yp, family=poisson)
    # exact poisson deviance: null ~ 0, increasing down the path
    assert abs(float(tp.dev_ratio[0])) < 0.02
    assert np.all(np.diff(tp.dev_ratio) >= -1e-6)
    assert float(tp.dev_ratio[-1]) > 0.05


def test_path_table_rejects_unknown_family(gauss):
    X, y = gauss
    res = lasso_path(X, y, nlambda=5)
    with pytest.raises(ValueError):
        admm_tpu.path_table(res, X, y, family="weibull")


def test_plot_cv_curve_renders(gauss, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from admm_tpu.plotting import plot_cv_curve

    X, y = gauss
    cv = admm_tpu.cv_lasso_path(X, y, nfolds=4, nlambda=15, seed=0)
    ax = plot_cv_curve(cv)
    assert ax is not None
    ax.figure.savefig(tmp_path / "cv.png")


def test_deviance_accessor():
    """glmnet's deviance.glmnet: (1 - dev.ratio) * nulldev; gaussian
    residual deviance equals the residual sum of squares."""
    import admm_tpu

    rng = np.random.default_rng(15)
    n, p = 120, 10
    X = rng.normal(size=(n, p))
    y = X[:, 0] - 0.5 * X[:, 1] + 0.2 * rng.normal(size=n)
    r = admm_tpu.lasso_path(X, y, nlambda=6)
    dev = admm_tpu.deviance(r, X, y)
    eta = admm_tpu.predict(r, X)
    rss = ((eta - y[None, :]) ** 2).sum(axis=1)
    np.testing.assert_allclose(dev, rss, rtol=1e-4)
    assert dev[0] >= dev[-1]          # deviance decreases along the path


def test_path_table_cox():
    """glmnet's print for family='cox': Df / %Dev from the Breslow
    partial-likelihood deviance; %Dev = 0 at the null top of the grid
    and increases along the path."""
    import admm_tpu
    from admm_tpu.models.cox import _breslow_pl, cox_lasso_path

    rng = np.random.default_rng(16)
    n, p = 150, 8
    X = rng.normal(size=(n, p))
    t_ = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.8).astype(float)
    r = cox_lasso_path(X, t_, d, nlambda=6)
    tab = admm_tpu.path_table(r, X, np.c_[t_, d])
    assert tab.df[0] == 0 and abs(tab.dev_ratio[0]) < 1e-4
    assert tab.dev_ratio[-1] > tab.dev_ratio[0]
    # deviance() accessor consistency.
    dev = admm_tpu.deviance(r, X, np.c_[t_, d])
    np.testing.assert_allclose(
        dev, -2.0 * _breslow_pl(X, t_, d, np.asarray(r.coef)),
        rtol=1e-8)
    admm_tpu.format_path_table(tab)   # renders


def test_plot_path_renders_all_xvars(gauss):
    """glmnet's plot.glmnet: coefficient profiles vs L1 norm (default),
    log lambda, or fraction deviance explained, Df on the top axis."""
    import matplotlib
    matplotlib.use("Agg")
    from admm_tpu.plotting import plot_path

    X, y = gauss
    res = lasso_path(X, y, nlambda=20)
    for xvar in ("norm", "lambda", "dev"):
        ax = plot_path(res, xvar=xvar, label=True, X=X, y=y)
        assert len(ax.lines) > 0
        assert ax.get_xlabel() != ""
    with pytest.raises(ValueError, match="xvar"):
        plot_path(res, xvar="nope")
    with pytest.raises(ValueError, match="needs X="):
        plot_path(res, xvar="dev")
