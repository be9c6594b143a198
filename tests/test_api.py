"""Tests for the chainable builder API (reference R-layer semantics)."""
import numpy as np
import pytest

import admm_tpu
from tests.conftest import make_regression


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(123)
    return make_regression(rng, 100, 20, mean=1.2, sd=2.0)


def test_lasso_builder_chain_and_fit(data):
    X, y, _ = data
    fit = (admm_tpu.admm_lasso(X, y)
           .penalty(nlambda=12, lambda_min_ratio=0.01)
           .opts(maxit=2000, eps_rel=1e-4)
           .fit())
    assert fit.lambda_.shape == (12,)
    assert fit.beta.shape == (21, 12)  # (p+1) x nlambda, intercept row 0
    assert fit.niter.shape == (12,)
    # beta is sparse
    from scipy import sparse
    assert sparse.issparse(fit.beta)


def test_lasso_validation_errors(data):
    X, y, _ = data
    with pytest.raises(ValueError, match="nrow"):
        admm_tpu.admm_lasso(X, y[:-1])
    m = admm_tpu.admm_lasso(X, y)
    with pytest.raises(ValueError, match="lambda must be positive"):
        m.penalty(lambda_=[-1.0])
    with pytest.raises(ValueError, match="nlambda"):
        m.penalty(nlambda=0)
    with pytest.raises(ValueError, match="lambda_min_ratio"):
        m.penalty(lambda_min_ratio=2.0)
    with pytest.raises(ValueError, match="nthread"):
        m.parallel(nthread=10)  # >= ncol/5 = 4
    with pytest.raises(ValueError, match="maxit"):
        m.opts(maxit=0)
    with pytest.raises(ValueError, match="rho"):
        m.opts(rho=-2.0)


def test_enet_builder(data):
    X, y, _ = data
    fit = admm_tpu.admm_enet(X, y).penalty(nlambda=8, alpha=0.5).fit()
    assert fit.beta.shape == (21, 8)
    with pytest.raises(ValueError, match="alpha"):
        admm_tpu.admm_enet(X, y).penalty(alpha=1.5)


def test_lad_builder(data):
    X, y, _ = data
    fit = admm_tpu.admm_lad(X, y).opts(eps_rel=1e-3).fit()
    assert fit.beta.shape == (21,)
    assert fit.niter > 0
    # shape validation: requires n > p
    with pytest.raises(ValueError, match="nrow"):
        admm_tpu.admm_lad(X[:10], y[:10])


def test_bp_builder():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(30, 60))
    x0 = np.zeros(60)
    x0[[3, 17, 40]] = [1.0, -2.0, 0.5]
    fit = admm_tpu.admm_bp(A, A @ x0).fit()
    assert fit.beta.shape == (60, 1)
    got = np.asarray(fit.beta.todense()).ravel()
    np.testing.assert_allclose(got, x0, atol=5e-3)
    # shape validation: requires p > n
    with pytest.raises(ValueError, match="ncol"):
        admm_tpu.admm_bp(A.T, np.zeros(60))


def test_dantzig_builder(data):
    X, y, _ = data
    fit = admm_tpu.admm_dantzig(X, y).penalty(nlambda=6).opts(
        maxit=3000, eps_rel=1e-4).fit()
    assert fit.beta.shape == (21, 6)


def test_parallel_lasso_via_builder(data):
    X, y, _ = data
    fit = (admm_tpu.admm_lasso(X, y)
           .penalty(nlambda=6)
           .parallel(nthread=2)
           .fit())
    ser = admm_tpu.admm_lasso(X, y).penalty(nlambda=6).fit()
    a = np.asarray(fit.beta.todense())
    b = np.asarray(ser.beta.todense())
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_plots_render(data, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    X, y, _ = data
    fit = admm_tpu.admm_lasso(X, y).penalty(nlambda=6).fit()
    ax = fit.plot()
    assert ax is not None
    lad = admm_tpu.admm_lad(X, y).opts(eps_rel=1e-3).fit()
    assert lad.plot() is not None
    rng = np.random.default_rng(0)
    A = rng.normal(size=(20, 50))
    x0 = np.zeros(50)
    x0[5] = 1.0
    bp = admm_tpu.admm_bp(A, A @ x0).fit()
    assert bp.plot() is not None


def test_rejects_nonfinite_inputs():
    import pytest

    X = np.ones((10, 3))
    y = np.ones(10)
    Xbad = X.copy(); Xbad[3, 1] = np.nan
    with pytest.raises(ValueError, match="NaN or Inf"):
        admm_tpu.admm_lasso(Xbad, y)
    ybad = y.copy(); ybad[0] = np.inf
    with pytest.raises(ValueError, match="NaN or Inf"):
        admm_tpu.admm_lad(np.random.default_rng(0).normal(size=(10, 3)),
                          ybad)


def test_accepts_large_finite_inputs():
    """All-finite f32 data whose SUM overflows to inf must not be
    rejected: the fast sum check is only a trigger for the exact scan."""
    X = np.full((16, 3), 3e38, np.float32)  # sum -> inf, entries finite
    assert not np.isfinite(X.sum())
    b = admm_tpu.admm_lasso(X, np.ones(16, np.float32))
    assert b is not None


def test_square_matrix_dispatches_wide():
    """n == p goes to the wide (linearized) formulation
    (reference dispatch is n > p for tall, src/Lasso.cpp:73-76)."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 40))
    y = X @ (rng.uniform(size=40) * (rng.uniform(size=40) < 0.3))
    fit = admm_tpu.admm_lasso(X, y).penalty(nlambda=5).fit()
    assert np.all(np.isfinite(fit.beta.toarray()))


def test_tiny_problems():
    rng = np.random.default_rng(2)
    # p = 1
    X = rng.normal(size=(30, 1)); y = 2.0 * X[:, 0] + 0.1 * rng.normal(size=30)
    fit = admm_tpu.admm_lasso(X, y).penalty(nlambda=4).fit()
    assert np.isfinite(fit.beta.toarray()).all()
    # smallest BP: p > n with n = 2
    A = rng.normal(size=(2, 6)); x0 = np.zeros(6); x0[1] = 1.0
    fitb = admm_tpu.admm_bp(A, A @ x0).fit()
    assert np.isfinite(fitb.beta.toarray()).all()


def test_builder_path_mode_option(data):
    x, y, _ = data
    import pytest

    a = admm_tpu.admm_lasso(x, y).penalty(nlambda=6).fit()  # batch default
    b = (admm_tpu.admm_lasso(x, y).penalty(nlambda=6)
         .opts(path_mode="scan").fit())
    np.testing.assert_allclose(a.beta.toarray(), b.beta.toarray(),
                               atol=1e-3)
    with pytest.raises(ValueError, match="path_mode"):
        admm_tpu.admm_lasso(x, y).opts(path_mode="nope")


def test_lad_defaults_without_opts():
    """admm_lad(...).fit() must work without calling .opts() first
    (regression: an edit once truncated ADMMLAD.__init__)."""
    rng = np.random.default_rng(5)
    X = rng.normal(size=(60, 8))
    y = X @ np.ones(8) + rng.normal(size=60)
    m = admm_tpu.admm_lad(X, y)
    # eps defaults are precision-aware (1e-4 under the x64 test config);
    # rho None = the solver's measured default (5.0 serial; DESIGN.md).
    assert (m.maxit, m.eps_abs, m.eps_rel, m.rho) == (10000, 1e-4, 1e-4,
                                                      None)
    fit = m.fit()
    assert np.isfinite(fit.beta).all()
    with pytest.raises(NotImplementedError):
        m.parallel(2)


def test_f64_eps_default_resolved_at_access_time():
    """Toggling jax_enable_x64 after building the LAD/BP builders must
    change the precision-aware eps default — it was sampled at
    construction (VERDICT r2 weak #6)."""
    import jax

    rng = np.random.default_rng(5)
    X = rng.normal(size=(30, 5))
    y = rng.normal(size=30)
    m = admm_tpu.admm_lad(X, y)
    assert m.eps_abs == 1e-4  # x64 is on in the test config
    jax.config.update("jax_enable_x64", False)
    try:
        assert (m.eps_abs, m.eps_rel) == (2e-5, 2e-5)
    finally:
        jax.config.update("jax_enable_x64", True)
    assert m.eps_abs == 1e-4
    m.opts(eps_abs=3e-6)
    assert m.eps_abs == 3e-6  # explicit value wins regardless


def test_builder_penalty_factor():
    """penalty_factor via the builder surface (glmnet's penalty.factor);
    consensus and Dantzig reject it loudly."""
    rng = np.random.default_rng(6)
    n, p = 120, 10
    X = rng.normal(size=(n, p))
    y = X @ np.concatenate([[2.0], np.zeros(p - 1)]) \
        + 0.2 * rng.normal(size=n)
    pf = np.ones(p)
    pf[0] = 0.5
    fit = admm_tpu.admm_lasso(X, y).penalty(nlambda=5,
                                            penalty_factor=pf).fit()
    assert np.isfinite(fit.beta.todense()).all()
    Xw = rng.normal(size=(n, 20))
    yw = Xw @ np.concatenate([[2.0], np.zeros(19)])
    with pytest.raises(NotImplementedError, match="penalty_factor"):
        admm_tpu.admm_lasso(Xw, yw).penalty(
            penalty_factor=np.ones(20)).parallel(2).fit()
    with pytest.raises(NotImplementedError, match="penalty_factor"):
        admm_tpu.admm_dantzig(X, y).penalty(penalty_factor=pf).fit()


def test_builder_coefficient_limits():
    """Nonnegative lasso via the builder (glmnet's lower.limits)."""
    rng = np.random.default_rng(8)
    n, p = 150, 10
    X = rng.normal(size=(n, p))
    y = X @ np.concatenate([[2.0, -1.5], np.zeros(p - 2)]) \
        + 0.2 * rng.normal(size=n)
    fit = admm_tpu.admm_lasso(X, y).penalty(nlambda=6,
                                            lower_limits=0.0).fit()
    beta = np.asarray(fit.beta.todense())[1:]   # slopes
    assert beta.min() >= -1e-6
    with pytest.raises(NotImplementedError, match="limits"):
        admm_tpu.admm_dantzig(X, y).penalty(lower_limits=0.0).fit()
