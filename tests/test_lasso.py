"""Golden tests for the Lasso/Enet path solvers against scikit-learn.

Modeled on the reference's quality control: coefficient agreement with an
independent solver at ~1e-3..1e-5 (reference README.md:44-123) plus KKT
property tests at convergence (SURVEY.md section 4).
"""
import numpy as np
import pytest
from sklearn.linear_model import ElasticNet, Lasso

from admm_tpu.models.lasso import enet_path, lasso_path
from tests.conftest import make_regression


@pytest.fixture(scope="module")
def tall_problem():
    rng = np.random.default_rng(123)
    return make_regression(rng, 100, 20, mean=1.2, sd=2.0)


@pytest.fixture(scope="module")
def wide_problem():
    rng = np.random.default_rng(123)
    X = rng.normal(size=(60, 120))
    b = np.zeros(120)
    b[:10] = rng.uniform(1, 2, 10)
    y = X @ b + 0.1 * rng.normal(size=60)
    return X, y, b


def test_tall_matches_sklearn_no_standardize(tall_problem):
    X, y, _ = tall_problem
    lam = np.exp(-2.0)
    res = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                     intercept=False)
    sk = Lasso(alpha=lam, fit_intercept=False, tol=1e-10,
               max_iter=100000).fit(X, y)
    np.testing.assert_allclose(np.asarray(res.coef[0]), sk.coef_,
                               atol=2e-4)


def test_tall_matches_sklearn_intercept(tall_problem):
    X, y, _ = tall_problem
    lam = np.exp(-2.0)
    res = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                     intercept=True)
    sk = Lasso(alpha=lam, fit_intercept=True, tol=1e-10,
               max_iter=100000).fit(X, y)
    np.testing.assert_allclose(np.asarray(res.coef[0]), sk.coef_,
                               atol=2e-4)
    np.testing.assert_allclose(float(res.beta0[0]), sk.intercept_,
                               atol=2e-3)


def test_tall_standardized_matches_glmnet_style(tall_problem):
    """standardize=True reproduces glmnet's standardize-then-recover
    solution (emulated with sklearn on manually standardized X)."""
    X, y, _ = tall_problem
    lam = np.exp(-2.0)
    Xm, Xsd = X.mean(0), X.std(0)
    sk = Lasso(alpha=lam, fit_intercept=True, tol=1e-12,
               max_iter=200000).fit((X - Xm) / Xsd, y)
    coef_ref = sk.coef_ / Xsd
    b0_ref = sk.intercept_ - (coef_ref * Xm).sum()
    res = lasso_path(X, y, lambdas=np.array([lam]), standardize=True,
                     intercept=True)
    np.testing.assert_allclose(np.asarray(res.coef[0]), coef_ref,
                               atol=2e-4)
    np.testing.assert_allclose(float(res.beta0[0]), b0_ref, atol=2e-3)


def test_wide_matches_sklearn(wide_problem):
    X, y, _ = wide_problem
    lam = 0.1
    res = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                     intercept=False, eps_abs=1e-6, eps_rel=1e-6)
    sk = Lasso(alpha=lam, fit_intercept=False, tol=1e-12,
               max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(res.coef[0]), sk.coef_,
                               atol=2e-3)


def test_enet_tall_matches_sklearn():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 50))
    b = np.zeros(50)
    b[:5] = 1.5
    y = X @ b + 0.1 * rng.normal(size=200)
    lam, alpha = 0.1, 0.6
    res = enet_path(X, y, alpha=alpha, lambdas=np.array([lam]),
                    standardize=False, intercept=False, eps_abs=1e-7,
                    eps_rel=1e-7)
    sk = ElasticNet(alpha=lam, l1_ratio=alpha, fit_intercept=False,
                    tol=1e-12, max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(res.coef[0]), sk.coef_,
                               atol=2e-4)


def test_enet_wide_matches_sklearn(wide_problem):
    X, y, _ = wide_problem
    lam, alpha = 0.1, 0.6
    res = enet_path(X, y, alpha=alpha, lambdas=np.array([lam]),
                    standardize=False, intercept=False, eps_abs=1e-6,
                    eps_rel=1e-6)
    sk = ElasticNet(alpha=lam, l1_ratio=alpha, fit_intercept=False,
                    tol=1e-12, max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(res.coef[0]), sk.coef_,
                               atol=5e-4)


def test_auto_path_head_is_zero_and_sorted(tall_problem):
    X, y, _ = tall_problem
    res = lasso_path(X, y, nlambda=20, lambda_min_ratio=0.01)
    lams = np.asarray(res.lambdas)
    assert np.all(np.diff(lams) < 0)
    # At lambda_max every coefficient is zero by the lambda0 rule.
    np.testing.assert_allclose(np.asarray(res.coef[0]), 0.0, atol=1e-6)
    assert np.asarray(res.niter).shape == (20,)


def test_warm_start_path_consistent_with_cold_solve(tall_problem):
    X, y, _ = tall_problem
    grid = np.exp(np.linspace(np.log(1.0), np.log(0.01), 10))
    path = lasso_path(X, y, lambdas=grid, standardize=False,
                      intercept=False)
    single = lasso_path(X, y, lambdas=np.array([grid[7]]),
                        standardize=False, intercept=False)
    np.testing.assert_allclose(np.asarray(path.coef[7]),
                               np.asarray(single.coef[0]), atol=5e-4)


def test_kkt_at_convergence(tall_problem):
    """KKT for 1/(2n)||y-Xb||^2 + lam||b||_1: |X'(y-Xb)|/n <= lam, with
    equality (signed) on the support."""
    X, y, _ = tall_problem
    lam = 0.2
    res = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                     intercept=False, eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(res.coef[0])
    g = X.T @ (y - X @ b) / len(y)
    assert np.abs(g).max() <= lam + 1e-4
    support = np.abs(b) > 1e-6
    np.testing.assert_allclose(g[support], lam * np.sign(b[support]),
                               atol=1e-4)


def test_user_lambdas_sorted_descending(tall_problem):
    X, y, _ = tall_problem
    res = lasso_path(X, y, lambdas=np.array([0.01, 1.0, 0.1]),
                     standardize=False, intercept=False, maxit=2000)
    np.testing.assert_allclose(np.asarray(res.lambdas), [1.0, 0.1, 0.01],
                               rtol=1e-6)


def test_huge_lambda_gives_zero(tall_problem):
    X, y, _ = tall_problem
    res = lasso_path(X, y, lambdas=np.array([1e6]), standardize=False,
                     intercept=False, maxit=2000)
    np.testing.assert_allclose(np.asarray(res.coef), 0.0, atol=1e-5)


def test_batch_mode_matches_scan_tall(tall_problem):
    X, y, _ = tall_problem
    a = lasso_path(X, y, nlambda=12)
    b = lasso_path(X, y, nlambda=12, path_mode="batch")
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(a.coef),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(b.beta0), np.asarray(a.beta0),
                               atol=5e-3)
    assert np.all(np.asarray(b.niter) > 0)


def test_batch_mode_matches_scan_wide(wide_problem):
    X, y, _ = wide_problem
    a = lasso_path(X, y, nlambda=10)
    b = lasso_path(X, y, nlambda=10, path_mode="batch")
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(a.coef),
                               atol=2e-3)


def test_batch_mode_enet():
    rng = np.random.default_rng(9)
    X = rng.normal(size=(150, 30))
    b = np.zeros(30)
    b[:5] = 1.0
    y = X @ b + 0.2 * rng.normal(size=150)
    a = enet_path(X, y, alpha=0.6, nlambda=8)
    bm = enet_path(X, y, alpha=0.6, nlambda=8, path_mode="batch")
    np.testing.assert_allclose(np.asarray(bm.coef), np.asarray(a.coef),
                               atol=5e-4)


def test_kkt_at_convergence_wide(wide_problem):
    """Same KKT conditions in the wide (linearized) regime."""
    X, y, _ = wide_problem
    lam = 0.15
    res = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                     intercept=False, eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(res.coef[0])
    g = X.T @ (y - X @ b) / len(y)
    assert np.abs(g).max() <= lam + 2e-4
    support = np.abs(b) > 1e-5
    np.testing.assert_allclose(g[support], lam * np.sign(b[support]),
                               atol=2e-4)


def test_kkt_enet_at_convergence(tall_problem):
    """Enet KKT: |X'(y-Xb)/n - lam(1-a)b| <= lam*a, equality on support."""
    X, y, _ = tall_problem
    lam, a = 0.2, 0.6
    from admm_tpu.models.lasso import enet_path

    res = enet_path(X, y, alpha=a, lambdas=np.array([lam]),
                    standardize=False, intercept=False,
                    eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(res.coef[0])
    g = X.T @ (y - X @ b) / len(y) - lam * (1 - a) * b
    assert np.abs(g).max() <= lam * a + 1e-4
    support = np.abs(b) > 1e-6
    np.testing.assert_allclose(g[support], lam * a * np.sign(b[support]),
                               atol=1e-4)


def test_wide_early_exit_small_scale_data():
    """The lambda >= lambda0 early exit must use a RELATIVE slack: data
    on a tiny raw scale makes the internal lambda0 < 1e-5, and the
    reference's absolute slack then zeroes every solution."""
    rng = np.random.default_rng(13)
    n, p = 40, 80
    X = 1e-4 * rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:5] = rng.normal(size=5)
    y = X @ b + 1e-5 * rng.normal(size=n)
    lam0 = np.abs(X.T @ y).max() / n
    res = lasso_path(X, y, lambdas=np.array([lam0 / 3, lam0 / 10]),
                     standardize=False, intercept=False,
                     path_mode="batch")
    assert np.abs(np.asarray(res.coef)).max() > 0.0


def test_wide_activeset_matches_dense_scan():
    """The compact-gather active-set realisation of the reference's
    4^k-1 cadence (reference: src/ADMMLassoWide.h:86-127) must agree
    with the dense wide path to solver tolerance, with near-identical
    iteration counts (measured perf comparison: DESIGN.md 'the wide-
    regime active-set question')."""
    import jax
    import jax.numpy as jnp

    from admm_tpu.data.standardize import standardize
    from admm_tpu.models.lasso import (_solve_path_wide,
                                       _solve_path_wide_activeset)

    rng = np.random.default_rng(0)
    n, p = 200, 400
    b = np.zeros(p)
    b[:12] = rng.uniform(1, 2, 12) * rng.choice([-1, 1], 12)
    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    y = jnp.asarray(X @ b + 0.2 * rng.normal(size=n), jnp.float32)
    Xs, ys, _ = standardize(X, y, standardize_x=False, intercept=False)
    lams = jnp.asarray(np.geomspace(50.0, 1.0, 10), jnp.float32)

    dc, dn, _ = jax.jit(lambda: _solve_path_wide(
        Xs, ys, lams, -1.0, 5000, 1e-5, 1e-5, 1.0, False))()
    ac, an, _ = jax.jit(lambda: _solve_path_wide_activeset(
        Xs, ys, lams, -1.0, 5000, 1e-5, 1e-5, 1.0, False))()
    np.testing.assert_allclose(np.asarray(ac), np.asarray(dc), atol=2e-3)
    assert np.abs(np.asarray(an).astype(int)
                  - np.asarray(dn).astype(int)).max() <= 3


def test_activeset_public_path_mode():
    """path_mode='activeset' is reachable from the public API (VERDICT
    r2 weak #1) and agrees with the batch solver; tall problems reject
    it loudly."""
    import admm_tpu

    rng = np.random.default_rng(3)
    n, p = 120, 300
    b = np.zeros(p)
    b[:8] = rng.uniform(1, 2, 8) * rng.choice([-1, 1], 8)
    X = rng.normal(size=(n, p))
    y = X @ b + 0.2 * rng.normal(size=n)
    lams = np.array([0.4, 0.15, 0.05])
    a = lasso_path(X, y, lambdas=lams, path_mode="activeset",
                   eps_abs=1e-6, eps_rel=1e-6)
    d = lasso_path(X, y, lambdas=lams, path_mode="batch",
                   eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=2e-3)
    # Builder surface accepts it too.
    fit = (admm_tpu.admm_lasso(X, y).penalty(lambda_=lams)
           .opts(path_mode="activeset", eps_abs=1e-6, eps_rel=1e-6)
           .fit())
    np.testing.assert_allclose(
        np.asarray(fit.beta.todense())[1:].T, np.asarray(a.coef),
        atol=1e-5)
    with pytest.raises(ValueError, match="activeset"):
        lasso_path(rng.normal(size=(50, 10)), rng.normal(size=50),
                   path_mode="activeset")
    with pytest.raises(ValueError, match="path_mode"):
        lasso_path(X, y, path_mode="nope")


def test_activeset_auto_dispatch_at_crossover(monkeypatch):
    """Scan-mode wide solves at p >= the measured crossover dispatch to
    the active-set solver (threshold lowered for the test; the real
    value is chip-measured, DESIGN.md)."""
    from admm_tpu.models import lasso as L

    rng = np.random.default_rng(4)
    n, p = 100, 200
    b = np.zeros(p)
    b[:6] = rng.uniform(1, 2, 6)
    X = rng.normal(size=(n, p))
    y = X @ b + 0.2 * rng.normal(size=n)
    lams = np.array([0.3, 0.1])

    called = {}
    orig = L._solve_path_wide_activeset

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(L, "_solve_path_wide_activeset", spy)
    monkeypatch.setattr(L, "_ACTIVESET_AUTO_P", 128)
    a = lasso_path(X, y, lambdas=lams, path_mode="scan",
                   eps_abs=1e-6, eps_rel=1e-6)
    assert called.get("yes"), "auto-dispatch did not trigger"
    d = lasso_path(X, y, lambdas=lams, path_mode="batch",
                   eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(d.coef),
                               atol=2e-3)


def test_penalty_factor_transform_equivalence():
    """glmnet's penalty.factor (extension): penalizing pf_j |b_j| is
    EXACTLY the column rescaling x_j -> x_j/pf_j with a uniform
    penalty, b_j = u_j/pf_j — pinned in both regimes (after the glmnet
    sum-to-p rescaling, applied to both sides)."""
    rng = np.random.default_rng(31)
    for n, p in ((200, 12), (60, 120)):
        X = rng.normal(size=(n, p))
        b = np.zeros(p)
        b[:4] = [1.5, -2.0, 1.0, 0.5]
        y = X @ b + 0.3 * rng.normal(size=n)
        pf = rng.uniform(0.5, 3.0, p)
        pf_t = pf * p / pf.sum()
        lams = np.array([0.3, 0.1, 0.03])
        a = lasso_path(X, y, lambdas=lams, penalty_factor=pf,
                       standardize=False, intercept=False,
                       eps_abs=1e-7, eps_rel=1e-7)
        u = lasso_path(X / pf_t[None, :], y, lambdas=lams,
                       standardize=False, intercept=False,
                       eps_abs=1e-7, eps_rel=1e-7)
        np.testing.assert_allclose(np.asarray(a.coef),
                                   np.asarray(u.coef) / pf_t[None, :],
                                   atol=2e-4)


def test_penalty_factor_units_and_zeros():
    rng = np.random.default_rng(32)
    n, p = 150, 10
    X = rng.normal(size=(n, p))
    y = X @ np.concatenate([[2.0], np.zeros(p - 1)]) \
        + 0.2 * rng.normal(size=n)
    # All-ones factors == no factors (grids and solutions).
    a = lasso_path(X, y, nlambda=6)
    b = lasso_path(X, y, nlambda=6, penalty_factor=np.ones(p))
    np.testing.assert_allclose(np.asarray(a.lambdas),
                               np.asarray(b.lambdas), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-6)
    # Scale invariance (glmnet rescales to sum p).
    c = lasso_path(X, y, nlambda=6, penalty_factor=7.0 * np.ones(p))
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(c.coef),
                               atol=1e-6)
    # Zero factor: coordinate 3 is unpenalized -> in the model at the
    # grid TOP (where all penalized coords are zero).
    pf = np.ones(p)
    pf[3] = 0.0
    yz = X @ np.concatenate([[0.5, 0, 0, 2.0], np.zeros(p - 4)]) \
        + 0.1 * rng.normal(size=n)
    r = lasso_path(X, yz, nlambda=6, penalty_factor=pf,
                   eps_abs=1e-7, eps_rel=1e-7)
    coef0 = np.asarray(r.coef)[0]
    assert abs(coef0[3]) > 0.5          # unpenalized, present at top
    # Penalized coordinates are heavily shrunk (not exactly zero: the
    # unpenalized fit changes the residual, so the raw-X'y grid top is
    # not their exact KKT boundary — glmnet behaves the same way).
    assert np.abs(np.delete(coef0, 3)).max() < 0.3
    # Validation.
    with pytest.raises(ValueError, match="penalty_factor"):
        lasso_path(X, y, penalty_factor=np.ones(p - 1))
    with pytest.raises(ValueError, match="penalty_factor"):
        lasso_path(X, y, penalty_factor=-np.ones(p))


def test_penalty_factor_wide_zero_factor_no_early_exit():
    """Wide regime with a zero factor: the all-zero early exit must be
    disabled (beta never becomes all-zero when a coordinate is
    unpenalized)."""
    rng = np.random.default_rng(33)
    n, p = 50, 100
    X = rng.normal(size=(n, p))
    y = X[:, 7] * 3.0 + 0.1 * rng.normal(size=n)
    pf = np.ones(p)
    pf[7] = 0.0
    r = lasso_path(X, y, nlambda=5, penalty_factor=pf,
                   standardize=False, intercept=False,
                   eps_abs=1e-6, eps_rel=1e-6)
    # Even at the grid top the unpenalized coordinate is fitted.
    assert abs(np.asarray(r.coef)[0, 7]) > 1.0


def test_nonnegative_lasso_matches_sklearn_positive():
    """lower_limits=0 (the nonnegative lasso) pinned against sklearn
    Lasso(positive=True) — an exact oracle for the box-constraint
    machinery."""
    from sklearn.linear_model import Lasso

    rng = np.random.default_rng(81)
    n, p = 200, 15
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:5] = [2.0, 1.5, -1.0, 0.8, -0.5]   # mixed signs: bounds bind
    y = X @ b + 0.3 * rng.normal(size=n)
    lam = 0.08
    r = lasso_path(X, y, lambdas=np.array([lam]), standardize=False,
                   intercept=True, lower_limits=0.0,
                   eps_abs=1e-7, eps_rel=1e-7)
    sk = Lasso(alpha=lam, positive=True, fit_intercept=True, tol=1e-12,
               max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(r.coef)[0], sk.coef_,
                               atol=2e-4)
    assert abs(float(r.beta0[0]) - sk.intercept_) < 2e-4
    assert np.all(np.asarray(r.coef) >= -1e-7)


def test_limits_validation_and_wide_regime():
    rng = np.random.default_rng(82)
    n, p = 60, 120
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [2.0, -1.5, 1.0, -0.8]
    y = X @ b + 0.1 * rng.normal(size=n)
    # Wide regime nonnegative: all coefficients >= 0 and KKT holds for
    # the feasible-direction condition at an interior lambda.
    r = lasso_path(X, y, nlambda=6, lower_limits=0.0,
                   standardize=False, intercept=False,
                   eps_abs=1e-7, eps_rel=1e-7)
    c = np.asarray(r.coef)
    assert np.all(c >= -1e-6)
    lam = float(r.lambdas[3])
    coef = c[3]
    g = X.T @ (X @ coef - y) / n
    act = coef > 1e-6
    np.testing.assert_allclose(g[act], -lam * np.ones(act.sum()),
                               atol=5e-4)
    # Inactive (at the 0 boundary): only the positive direction is
    # feasible, so the condition is one-sided: g_j + lam >= 0.
    assert np.all(g[~act] + lam >= -5e-4)
    # Per-coordinate vector limits and validation.
    up = np.full(p, np.inf)
    up[0] = 0.5
    r2 = lasso_path(X, y, nlambda=4, lower_limits=0.0, upper_limits=up,
                    standardize=False, intercept=False)
    assert np.asarray(r2.coef)[:, 0].max() <= 0.5 + 1e-6
    with pytest.raises(ValueError, match="lower <= 0 <= upper"):
        lasso_path(X, y, lower_limits=1.0)


def test_gaussian_offset_equals_response_shift(tall_problem):
    """glmnet's gaussian offset: fitting with offset= must equal the
    fit on y - offset exactly (eta = b0 + Xb + offset), and predict's
    newoffset adds it back."""
    from admm_tpu.predict import predict

    X, y, _ = tall_problem
    rng = np.random.default_rng(9)
    off = rng.normal(size=y.shape[0])
    r_off = lasso_path(X, y, offset=off, nlambda=6)
    r_shift = lasso_path(X, y - off, nlambda=6)
    # The shift happens in f32 on device vs f64 on host: one ulp.
    np.testing.assert_allclose(np.asarray(r_off.lambdas),
                               np.asarray(r_shift.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_off.coef),
                               np.asarray(r_shift.coef), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_off.beta0),
                               np.asarray(r_shift.beta0), atol=1e-4)
    eta = predict(r_off, X, offset=off)
    np.testing.assert_allclose(eta, predict(r_shift, X) + off[None, :],
                               atol=1e-3)
    with pytest.raises(ValueError, match="one entry per row"):
        lasso_path(X, y, offset=off[:-1], nlambda=4)


def test_adaptive_lasso():
    """Adaptive lasso (Zou 2006): equals the manual two-stage via
    penalty_factor, and recovers the exact support on a strong-signal
    problem where it holds the oracle property."""
    import jax.numpy as jnp

    from admm_tpu.models.lasso import adaptive_lasso_path, lasso_path

    rng = np.random.default_rng(17)
    n, p = 300, 12
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:3] = [3.0, -2.0, 1.5]
    y = X @ b + 0.5 * rng.normal(size=n)

    res = adaptive_lasso_path(X, y, nlambda=20, dtype=jnp.float64)
    # Manual two-stage with the same OLS init (n > p).
    Xc = X - X.mean(0)
    yc = y - y.mean()
    b0 = np.linalg.lstsq(Xc, yc, rcond=None)[0]
    man = lasso_path(X, y, penalty_factor=1.0 / np.abs(b0), nlambda=20,
                     dtype=jnp.float64)
    assert np.abs(np.asarray(res.coef) - np.asarray(man.coef)).max() < 1e-8
    # Oracle property: some path point selects EXACTLY the truth.
    supports = [tuple(np.flatnonzero(np.asarray(c)))
                for c in res.coef]
    assert (0, 1, 2) in supports
    # Explicit init vector and validation paths.
    r2 = adaptive_lasso_path(X, y, init=b0, nlambda=5,
                             dtype=jnp.float64)
    assert np.all(np.isfinite(np.asarray(r2.coef)))
    with pytest.raises(ValueError, match="one entry"):
        adaptive_lasso_path(X, y, init=np.ones(5))
    with pytest.raises(ValueError, match="n > p"):
        adaptive_lasso_path(X[:8], y[:8], init="ols")
