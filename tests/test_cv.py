"""Cross-validated lambda selection (admm_tpu.models.cv).

Extension beyond the reference (which has no model selection); pinned
against sklearn's LassoCV on a seeded problem.
"""
import numpy as np
import pytest
from sklearn.linear_model import LassoCV

from admm_tpu.models.cv import cv_enet_path, cv_lasso_path


def _problem(n=300, p=40, seed=3):
    rng = np.random.default_rng(seed)
    b = np.zeros(p)
    b[:8] = rng.uniform(1.0, 2.0, 8) * rng.choice([-1, 1], 8)
    X = rng.normal(size=(n, p))
    y = X @ b + rng.normal(size=n)
    return X, y, b


def test_cv_selects_sensible_lambda():
    X, y, b = _problem()
    cv = cv_lasso_path(X, y, nfolds=5, nlambda=50)
    assert cv.cvm.shape == (50,)
    assert np.all(np.isfinite(cv.cvm)) and np.all(cv.cvsd >= 0)
    # The minimiser is interior (signal is strong, grid spans 4 decades).
    i_min = int(np.argmin(cv.cvm))
    assert 0 < i_min < 49
    assert cv.lambda_1se >= cv.lambda_min
    # Coefficients at lambda_min recover the true support.
    i = int(np.argmin(np.abs(cv.lambdas - cv.lambda_min)))
    coef = np.asarray(cv.fit.coef[i])
    assert np.all(np.abs(coef[:8]) > 0.5)
    assert np.abs(coef[8:]).max() < 0.2


def test_cv_matches_sklearn_lassocv_selection():
    X, y, _ = _problem()
    cv = cv_lasso_path(X, y, nfolds=5, nlambda=60, seed=1)
    sk = LassoCV(cv=5, tol=1e-8, max_iter=100000,
                 fit_intercept=True).fit(X, y)
    # Same order of magnitude of selected penalty (fold splits differ).
    assert 0.1 < cv.lambda_min / sk.alpha_ < 10.0
    # Coefficients at the selected lambdas agree on the support.
    i = int(np.argmin(np.abs(cv.lambdas - cv.lambda_min)))
    ours = np.asarray(cv.fit.coef[i])
    np.testing.assert_allclose(ours, sk.coef_, atol=0.15)


def test_cv_custom_foldid_reproducible():
    X, y, _ = _problem(n=200, p=20)
    foldid = np.arange(200) % 4
    a = cv_lasso_path(X, y, nfolds=4, nlambda=20, foldid=foldid)
    b = cv_lasso_path(X, y, nfolds=4, nlambda=20, foldid=foldid)
    np.testing.assert_array_equal(a.cvm, b.cvm)
    assert a.lambda_min == b.lambda_min


def test_cv_ragged_folds_glmnet_scoring():
    """nfolds not dividing n: every row is scored (no dropped rows), fold
    sizes differ by at most one, and cvm/cvsd follow glmnet's
    per-OBSERVATION aggregation — verified against independent sklearn
    Lasso fits per fold."""
    from sklearn.linear_model import Lasso

    n = 150
    X, y, _ = _problem(n=n, p=15)
    nfolds = 4  # 150 = 4*37 + 2 -> ragged
    cv = cv_lasso_path(X, y, nfolds=nfolds, nlambda=8, seed=7,
                       standardize=False)
    counts = np.bincount(cv.foldid, minlength=nfolds)
    assert counts.sum() == n and counts.max() - counts.min() <= 1

    sq = np.empty((n, len(cv.lambdas)))
    for f in range(nfolds):
        tr, va = cv.foldid != f, cv.foldid == f
        for j, lam in enumerate(np.asarray(cv.lambdas)):
            m = Lasso(alpha=float(lam), fit_intercept=True, tol=1e-10,
                      max_iter=200000).fit(X[tr], y[tr])
            sq[va, j] = (m.predict(X[va]) - y[va]) ** 2
    cvm = sq.mean(axis=0)
    cvsd = np.sqrt(((sq - cvm) ** 2).mean(axis=0) / (n - 1))
    np.testing.assert_allclose(cv.cvm, cvm, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(cv.cvsd, cvsd, rtol=2e-2, atol=1e-3)


def test_cv_foldid_minus_one_trains_every_fold():
    """Extension: foldid == -1 rows are excluded from scoring but still
    train every fold (documented behavior)."""
    X, y, _ = _problem(n=120, p=12)
    foldid = np.arange(120) % 3
    foldid[100:] = -1
    cv = cv_lasso_path(X, y, foldid=foldid, nlambda=6)
    assert np.all(np.isfinite(cv.cvm)) and np.all(cv.cvsd >= 0)
    assert np.array_equal(cv.foldid, foldid)


def test_cv_enet():
    X, y, _ = _problem()
    cv = cv_enet_path(X, y, alpha=0.6, nfolds=4, nlambda=25)
    assert np.all(np.isfinite(cv.cvm))
    assert cv.lambda_1se >= cv.lambda_min


def test_cv_validates_nfolds():
    X, y, _ = _problem(n=50, p=20)
    with pytest.raises(ValueError):
        cv_lasso_path(X, y, nfolds=1)


def test_cv_foldid_defines_nfolds():
    """An explicit foldid defines the folds (glmnet convention); the
    default nfolds must not create empty validation splits."""
    X, y, _ = _problem(n=200, p=20)
    cv = cv_lasso_path(X, y, foldid=np.arange(200) % 4, nlambda=10)
    assert np.all(np.isfinite(cv.cvm))


def test_cv_rejects_empty_fold():
    X, y, _ = _problem(n=200, p=20)
    bad = np.zeros(200, np.int64)
    bad[0] = 5  # folds 1..4 empty
    with pytest.raises(ValueError, match="at least one row"):
        cv_lasso_path(X, y, foldid=bad, nlambda=5)


def test_cv_explicit_foldid_small_n():
    """An explicit foldid must not be rejected by the (ignored) default
    nfolds range check on small n."""
    rng = np.random.default_rng(4)
    X = rng.normal(size=(8, 3))
    y = X @ np.ones(3) + 0.1 * rng.normal(size=8)
    cv = cv_lasso_path(X, y, foldid=np.arange(8) % 2, nlambda=4)
    assert np.all(np.isfinite(cv.cvm))


def test_cv_group_lasso():
    from admm_tpu.models.cv import cv_group_lasso_path

    rng = np.random.default_rng(19)
    n, p, G = 240, 24, 8
    groups = np.arange(p) % G
    b = np.zeros(p)
    b[groups == 2] = 2.0
    X = rng.normal(size=(n, p))
    y = X @ b + 0.5 * rng.normal(size=n)
    cv = cv_group_lasso_path(X, y, groups, nfolds=4, nlambda=20)
    assert np.all(np.isfinite(cv.cvm))
    i = int(np.argmin(np.abs(cv.lambdas - cv.lambda_min)))
    coef = np.asarray(cv.fit.coef[i])
    assert np.linalg.norm(coef[groups == 2]) > 0.5


def test_cv_onepass_matches_loop_gaussian():
    """The one-program fold sweep (fold-as-lane weights, vmapped) must
    reproduce the host-side fold loop's cvm/cvsd — ragged folds and -1
    (train-only) rows included (VERDICT r2 item 2)."""
    n = 150  # 4 ragged folds
    X, y, _ = _problem(n=n, p=15)
    foldid = np.arange(n) % 4
    foldid[140:] = -1
    one = cv_lasso_path(X, y, foldid=foldid, nlambda=8,
                        cv_mode="onepass")
    loop = cv_lasso_path(X, y, foldid=foldid, nlambda=8, cv_mode="loop")
    np.testing.assert_allclose(one.cvm, loop.cvm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(one.cvsd, loop.cvsd, rtol=1e-3,
                               atol=1e-5)
    assert one.lambda_min == loop.lambda_min
    np.testing.assert_allclose(np.asarray(one.fit.coef),
                               np.asarray(loop.fit.coef), atol=1e-6)


def test_cv_onepass_matches_loop_glm():
    """Same equivalence for the GLM fold sweep (binomial)."""
    from admm_tpu.models.cv import cv_logistic_path

    rng = np.random.default_rng(9)
    n, p = 160, 10
    b = np.concatenate([[1.5, -1.0], np.zeros(p - 2)])
    X = rng.normal(size=(n, p))
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(0.2 + X @ b)))
         ).astype(float)
    one = cv_logistic_path(X, y, nfolds=4, nlambda=6, seed=2,
                           cv_mode="onepass")
    loop = cv_logistic_path(X, y, nfolds=4, nlambda=6, seed=2,
                            cv_mode="loop")
    np.testing.assert_allclose(one.cvm, loop.cvm, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(one.cvsd, loop.cvsd, rtol=1e-2,
                               atol=1e-4)


def test_cv_weighted():
    """Weighted CV: unit weights reproduce the unweighted run exactly;
    real weights produce a weighted cvm (hand-checked formula) in both
    cv modes."""
    X, y, _ = _problem(n=120, p=12)
    foldid = np.arange(120) % 4
    base = cv_lasso_path(X, y, foldid=foldid, nlambda=6)
    unit = cv_lasso_path(X, y, foldid=foldid, nlambda=6,
                         weights=np.ones(120))
    np.testing.assert_allclose(base.cvm, unit.cvm, rtol=1e-5)
    np.testing.assert_allclose(base.cvsd, unit.cvsd, rtol=1e-4)

    rng = np.random.default_rng(0)
    w = rng.uniform(0.2, 3.0, 120)
    a = cv_lasso_path(X, y, foldid=foldid, nlambda=6, weights=w,
                      cv_mode="onepass")
    b = cv_lasso_path(X, y, foldid=foldid, nlambda=6, weights=w,
                      cv_mode="loop")
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a.cvsd, b.cvsd, rtol=1e-3, atol=1e-5)
    assert np.all(np.isfinite(a.cvm)) and a.lambda_1se >= a.lambda_min


def test_cv_dantzig_onepass_matches_loop():
    """The last family joins the one-pass protocol: the Dantzig CV's
    weight-zero fold lanes (over the new weighted engine) equal the
    host per-fold refit."""
    from admm_tpu.models.cv import cv_dantzig_path

    X, y, _ = _problem(n=120, p=12)
    a = cv_dantzig_path(X, y, nfolds=3, nlambda=6, seed=0,
                        cv_mode="onepass", eps_abs=1e-7, eps_rel=1e-7)
    b = cv_dantzig_path(X, y, nfolds=3, nlambda=6, seed=0,
                        cv_mode="loop", eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=2e-3)
    assert np.argmin(a.cvm) == np.argmin(b.cvm)


def test_dantzig_weights_equal_row_duplication():
    """Weighted Dantzig selector: integer weight k == repeating the
    row k times (the shared sqrt(w) row-scaling semantics)."""
    from admm_tpu.models.dantzig import dantzig_path

    rng = np.random.default_rng(0)
    n, p = 80, 10
    X = rng.normal(size=(n, p))
    y = X[:, 0] + 0.2 * rng.normal(size=n)
    w = rng.integers(1, 4, n).astype(float)
    lams = np.array([0.1, 0.04])
    rw = dantzig_path(X, y, lambdas=lams, weights=w,
                      eps_abs=1e-8, eps_rel=1e-8)
    idx = np.repeat(np.arange(n), w.astype(int))
    rd = dantzig_path(X[idx], y[idx], lambdas=lams,
                      eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_allclose(np.asarray(rw.coef),
                               np.asarray(rd.coef), atol=2e-6)


def test_cv_dantzig_and_fused():
    """CV coverage for the remaining families (Dantzig, generalized
    lasso): fold-loop protocol, sensible selection on seeded signals."""
    from admm_tpu.models.cv import cv_dantzig_path, cv_fused_lasso_path

    X, y, _ = _problem(n=150, p=15)
    cvd = cv_dantzig_path(X, y, nfolds=4, nlambda=8)
    assert np.all(np.isfinite(cvd.cvm)) and np.all(cvd.cvsd >= 0)
    assert cvd.lambda_1se >= cvd.lambda_min

    rng = np.random.default_rng(17)
    n, p = 150, 12
    Xf = rng.normal(size=(n, p))
    bstep = np.repeat([1.0, -0.5, 0.8], 4)
    yf = 0.5 + Xf @ bstep + 0.3 * rng.normal(size=n)
    cvf = cv_fused_lasso_path(Xf, yf, nfolds=4, nlambda=8)
    assert np.all(np.isfinite(cvf.cvm))
    i = int(np.argmin(np.abs(cvf.lambdas - cvf.lambda_min)))
    # At the selected lambda the fit recovers the step structure.
    coef = np.asarray(cvf.fit.coef[i])
    assert np.corrcoef(coef, bstep)[0, 1] > 0.9


def test_cv_penalty_factor_onepass_matches_loop():
    """penalty_factor must reach the fold solves, not just the full fit
    (onepass == loop with factors in play)."""
    X, y, _ = _problem(n=120, p=12)
    pf = np.ones(12)
    pf[0] = 0.3
    pf[5] = 2.0
    foldid = np.arange(120) % 4
    one = cv_lasso_path(X, y, foldid=foldid, nlambda=6,
                        penalty_factor=pf, cv_mode="onepass")
    loop = cv_lasso_path(X, y, foldid=foldid, nlambda=6,
                         penalty_factor=pf, cv_mode="loop")
    np.testing.assert_allclose(one.cvm, loop.cvm, rtol=1e-4, atol=1e-5)
    assert one.lambda_min == loop.lambda_min


def test_cv_limits_onepass_matches_loop():
    """Coefficient limits must reach the fold solves too (the nonneg
    lasso under CV: onepass == loop)."""
    X, y, _ = _problem(n=120, p=12)
    foldid = np.arange(120) % 4
    one = cv_lasso_path(X, y, foldid=foldid, nlambda=6,
                        lower_limits=0.0, cv_mode="onepass")
    loop = cv_lasso_path(X, y, foldid=foldid, nlambda=6,
                         lower_limits=0.0, cv_mode="loop")
    np.testing.assert_allclose(one.cvm, loop.cvm, rtol=1e-4, atol=1e-5)
    assert one.lambda_min == loop.lambda_min


def test_cv_fold_mesh_matches_single_device():
    """Sharding the fold axis over the 8-device mesh reproduces the
    single-device one-pass CV (folds are independent; only the all-done
    reduction crosses the mesh)."""
    from admm_tpu.parallel.mesh import make_mesh

    X, y, _ = _problem(n=160, p=12)
    base = cv_lasso_path(X, y, nfolds=8, nlambda=6, seed=3,
                         cv_mode="onepass")
    shd = cv_lasso_path(X, y, nfolds=8, nlambda=6, seed=3,
                        cv_mode="onepass", fold_mesh=make_mesh(8))
    np.testing.assert_allclose(shd.cvm, base.cvm, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(shd.cvsd, base.cvsd, rtol=1e-3,
                               atol=1e-6)
    assert shd.lambda_min == base.lambda_min


def test_cv_glm_fold_mesh_matches_single_device():
    from admm_tpu.models.cv import cv_glm_path
    from admm_tpu.models.glm import binomial
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    X = rng.normal(size=(160, 10))
    b = np.zeros(10); b[:3] = [1.5, -1.0, 0.7]
    y = (rng.uniform(size=160) < 1 / (1 + np.exp(-(X @ b)))).astype(float)
    base = cv_glm_path(X, y, binomial(), nfolds=8, nlambda=6, seed=2,
                       cv_mode="onepass")
    shd = cv_glm_path(X, y, binomial(), nfolds=8, nlambda=6, seed=2,
                      cv_mode="onepass", fold_mesh=make_mesh(8))
    np.testing.assert_allclose(shd.cvm, base.cvm, rtol=1e-4, atol=1e-6)
    assert shd.lambda_min == base.lambda_min


# ---------------------------------------------------------------------------
# glmnet type.measure alternatives
# ---------------------------------------------------------------------------

def _binom_problem(n=240, p=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p); b[:3] = [1.5, -1.2, 0.9]
    eta = X @ b
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
    return X, y


def test_type_measure_auc_matches_sklearn_fold_aucs():
    """cvm under type_measure='auc' must equal the fold-size-weighted
    mean of sklearn roc_auc_score over the held-out folds."""
    from sklearn.metrics import roc_auc_score
    from admm_tpu.models.cv import cv_glm_path, _make_glm_fold_eta
    from admm_tpu.models.glm import binomial

    X, y = _binom_problem()
    cv = cv_glm_path(X, y, binomial(), nfolds=5, nlambda=12, seed=1,
                     type_measure="auc")
    # Recompute own-fold etas through the same public machinery the CV
    # core used, then score with sklearn per fold.
    lams = np.asarray(cv.lambdas)
    foldid = cv.foldid
    masks = (foldid[None, :] != np.arange(5)[:, None]).astype(float)
    fold_eta = _make_glm_fold_eta(binomial(), 1.0, True, True, 10000,
                                  1e-5, 1e-5, -1.0, "auto")
    etas = np.asarray(fold_eta(X, y, lams, masks,
                               np.clip(foldid, 0, None)))
    want = np.zeros(lams.size)
    wsum = 0.0
    for f in range(5):
        va = foldid == f
        aucs = [roc_auc_score(y[va], etas[va, j])
                for j in range(lams.size)]
        want += va.sum() * np.asarray(aucs)
        wsum += va.sum()
    np.testing.assert_allclose(cv.cvm, want / wsum, atol=1e-10)
    # AUC is maximized, and is high on this separable-ish problem.
    assert cv.cvm.max() > 0.85
    i = int(np.argmax(cv.cvm))
    assert cv.lambda_min == float(lams[i])
    assert cv.lambda_1se >= cv.lambda_min


def test_type_measure_class_mse_mae_binomial():
    from admm_tpu.models.cv import cv_logistic_path

    X, y = _binom_problem()
    out = {}
    for tm in ("class", "mse", "mae"):
        cv = cv_logistic_path(X, y, nfolds=5, nlambda=12, seed=0,
                              type_measure=tm)
        out[tm] = cv
    # Misclassification at lambda_min beats the null rate; Brier-style
    # mse < 0.25 (the constant-1/2 score); mae in (0, 1).
    null_rate = min(y.mean(), 1 - y.mean())
    assert out["class"].cvm.min() < null_rate
    assert out["mse"].cvm.min() < 0.25
    assert 0.0 < out["mae"].cvm.min() < 0.5


def test_type_measure_gaussian_mae_and_reject():
    X, y, _ = _problem(n=200, p=25, seed=5)
    cv = cv_lasso_path(X, y, nfolds=5, nlambda=15, type_measure="mae")
    # MAE of a good fit with unit noise ~ E|N(0,1)| = 0.8 scale.
    assert 0.3 < cv.cvm.min() < 1.2
    with pytest.raises(ValueError):
        cv_lasso_path(X, y, nlambda=5, type_measure="auc")
    with pytest.raises(ValueError):
        cv_lasso_path(X, y, nlambda=5, type_measure="banana")


def test_type_measure_multinomial_class():
    from admm_tpu.models.cv import cv_multinomial_path

    rng = np.random.default_rng(2)
    n, p = 210, 15
    X = rng.normal(size=(n, p))
    eta = X[:, :2] @ np.array([[1.8, -1.5], [0.2, 1.9]]).T
    y = np.argmax(np.c_[eta, 0.3 * rng.normal(size=n)], axis=1)
    cv = cv_multinomial_path(X, y, nfolds=4, nlambda=10,
                             type_measure="class")
    assert cv.cvm.min() < 0.2
    cvm2 = cv_multinomial_path(X, y, nfolds=4, nlambda=10,
                               type_measure="mse")
    assert cvm2.cvm.min() < 2.0 / 3.0   # beats the uniform predictor
    with pytest.raises(ValueError):
        cv_multinomial_path(X, y, nlambda=5, type_measure="auc")


def test_cv_gaussian_offset_equals_response_shift():
    """cv.glmnet's gaussian offset: every fold fit AND the held-out
    scoring residual shift identically, so CV with offset= must equal
    CV on y - offset."""
    X, y, _ = _problem(n=120, p=15)
    rng = np.random.default_rng(4)
    off = rng.normal(size=y.shape[0])
    a = cv_lasso_path(X, y, offset=off, nfolds=3, nlambda=8, seed=0)
    b = cv_lasso_path(X, y - off, nfolds=3, nlambda=8, seed=0)
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=1e-6)
    np.testing.assert_allclose(a.cvsd, b.cvsd, rtol=1e-6)
    assert a.lambda_min == b.lambda_min


def test_cv_glm_offset_constant_invariance():
    """A CONSTANT offset c only shifts the intercept by -c, so the CV
    curve (deviance at eta including the offset) is unchanged."""
    from admm_tpu.models.cv import cv_glm_path
    from admm_tpu.models.glm import poisson

    rng = np.random.default_rng(8)
    n, p = 150, 10
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.5, -0.4], np.zeros(p - 2)])
    y = rng.poisson(np.exp(0.3 + X @ b)).astype(float)
    base = cv_glm_path(X, y, poisson(), nfolds=3, nlambda=6, seed=0,
                       eps_abs=1e-7, eps_rel=1e-7)
    offc = cv_glm_path(X, y, poisson(), nfolds=3, nlambda=6, seed=0,
                       offset=np.full(n, 0.6),
                       eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(offc.cvm, base.cvm, rtol=5e-4)
    # Grids agree to float tolerance (offset-aware null fit), so
    # compare the SELECTED INDEX, not the float.
    assert np.argmin(offc.cvm) == np.argmin(base.cvm)
    with pytest.raises(ValueError, match="loop"):
        cv_glm_path(X, y, poisson(), nfolds=3, nlambda=6,
                    offset=np.full(n, 0.6), cv_mode="loop")


def test_cv_multinomial_multitask_offset():
    """CV offsets for the matrix families: a column-constant
    multinomial offset only shifts the intercepts (same CV curve); the
    mgaussian offset is an exact response shift (CV on Y - off)."""
    from admm_tpu.models.cv import (cv_multinomial_path,
                                    cv_multitask_lasso_path)

    rng = np.random.default_rng(5)
    n, p, C = 150, 10, 3
    X = rng.normal(size=(n, p))
    eta = X[:, :2] @ rng.normal(size=(2, C))
    y = np.argmax(eta + 0.3 * rng.normal(size=(n, C)), axis=1)
    base = cv_multinomial_path(X, y, nfolds=3, nlambda=6, seed=0,
                               eps_abs=1e-7, eps_rel=1e-7)
    offc = cv_multinomial_path(X, y, nfolds=3, nlambda=6, seed=0,
                               offset=np.tile([0.4, -0.2, 0.1], (n, 1)),
                               eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(offc.cvm, base.cvm, rtol=2e-3)
    with pytest.raises(ValueError, match="nclass"):
        cv_multinomial_path(X, y, nlambda=4, offset=np.zeros((n, C + 1)))

    K = 2
    Y = X[:, :3] @ rng.normal(size=(3, K)) + 0.2 * rng.normal(size=(n, K))
    off = rng.normal(size=(n, K))
    a = cv_multitask_lasso_path(X, Y + off, nfolds=3, nlambda=6, seed=0,
                                offset=off)
    b = cv_multitask_lasso_path(X, Y, nfolds=3, nlambda=6, seed=0)
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=1e-4)
    assert np.argmin(a.cvm) == np.argmin(b.cvm)


def test_cv_matrix_families_onepass_matches_loop():
    """One-program CV for the matrix families: the vmapped weight-zero
    fold sweep equals the host per-fold refit (weights included)."""
    from admm_tpu.models.cv import (cv_multinomial_path,
                                    cv_multitask_lasso_path)

    rng = np.random.default_rng(6)
    n, p, C = 160, 12, 3
    X = rng.normal(size=(n, p))
    eta = X[:, :2] @ rng.normal(size=(2, C))
    y = np.argmax(eta + 0.3 * rng.normal(size=(n, C)), axis=1)
    w = rng.uniform(0.5, 2.0, n)
    for kw in ({}, {"weights": w}, {"grouped": True}):
        a = cv_multinomial_path(X, y, nfolds=3, nlambda=6, seed=0,
                                cv_mode="onepass",
                                eps_abs=1e-7, eps_rel=1e-7, **kw)
        b = cv_multinomial_path(X, y, nfolds=3, nlambda=6, seed=0,
                                cv_mode="loop",
                                eps_abs=1e-7, eps_rel=1e-7, **kw)
        np.testing.assert_allclose(a.cvm, b.cvm, rtol=2e-3,
                                   err_msg=str(kw))
        assert np.argmin(a.cvm) == np.argmin(b.cvm), kw

    K = 2
    Y = X[:, :3] @ rng.normal(size=(3, K)) + 0.2 * rng.normal(size=(n, K))
    off = rng.normal(size=(n, K))
    for kw in ({}, {"weights": w, "alpha": 0.6}, {"offset": off}):
        a = cv_multitask_lasso_path(X, Y, nfolds=3, nlambda=6, seed=0,
                                    cv_mode="onepass",
                                    eps_abs=1e-7, eps_rel=1e-7, **kw)
        b = cv_multitask_lasso_path(X, Y, nfolds=3, nlambda=6, seed=0,
                                    cv_mode="loop",
                                    eps_abs=1e-7, eps_rel=1e-7, **kw)
        np.testing.assert_allclose(a.cvm, b.cvm, rtol=2e-3,
                                   err_msg=str(kw))
        assert np.argmin(a.cvm) == np.argmin(b.cvm), kw
    with pytest.raises(ValueError, match="cv_mode"):
        cv_multitask_lasso_path(X, Y, nlambda=5, cv_mode="nope")


def test_cv_group_genlasso_onepass_matches_loop():
    """One-program CV for the group and generalized Lasso: the vmapped
    weight-zero fold sweep equals the host per-fold refit."""
    from admm_tpu.models.cv import cv_gen_lasso_path, cv_group_lasso_path
    from admm_tpu.models.genlasso import difference_matrix

    rng = np.random.default_rng(7)
    n, p = 150, 12
    X = rng.normal(size=(n, p))
    y = X[:, :4] @ np.array([1.0, 1.0, -0.8, -0.8]) \
        + 0.2 * rng.normal(size=n)
    groups = np.repeat(np.arange(p // 2), 2)
    ow = rng.uniform(0.5, 2.0, n)
    for kw in ({}, {"obs_weights": ow, "l1_ratio": 0.3}):
        a = cv_group_lasso_path(X, y, groups, nfolds=3, nlambda=6,
                                seed=0, cv_mode="onepass",
                                eps_abs=1e-7, eps_rel=1e-7, **kw)
        b = cv_group_lasso_path(X, y, groups, nfolds=3, nlambda=6,
                                seed=0, cv_mode="loop",
                                eps_abs=1e-7, eps_rel=1e-7, **kw)
        np.testing.assert_allclose(a.cvm, b.cvm, rtol=2e-3,
                                   err_msg=str(kw))
        assert np.argmin(a.cvm) == np.argmin(b.cvm), kw

    D = difference_matrix(p, 1)
    for kw in ({}, {"weights": ow}):
        a = cv_gen_lasso_path(X, y, D, nfolds=3, nlambda=6, seed=0,
                              cv_mode="onepass",
                              eps_abs=1e-7, eps_rel=1e-7, **kw)
        b = cv_gen_lasso_path(X, y, D, nfolds=3, nlambda=6, seed=0,
                              cv_mode="loop",
                              eps_abs=1e-7, eps_rel=1e-7, **kw)
        np.testing.assert_allclose(a.cvm, b.cvm, rtol=2e-3,
                                   err_msg=str(kw))
        assert np.argmin(a.cvm) == np.argmin(b.cvm), kw


def test_fold_mesh_reaches_new_onepass_sweeps():
    """fold_mesh shards the fold axis of the cox / matrix-family
    sweeps: results equal the unsharded one-pass run."""
    from admm_tpu.models.cox import cv_cox_path
    from admm_tpu.models.cv import cv_multitask_lasso_path
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    n, p = 160, 10
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    mesh = make_mesh(8)
    a = cv_cox_path(X, t, d, nfolds=8, nlambda=5, seed=0,
                    fold_mesh=mesh)
    b = cv_cox_path(X, t, d, nfolds=8, nlambda=5, seed=0)
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=1e-5)

    Y = X[:, :3] @ rng.normal(size=(3, 2)) + 0.2 * rng.normal(size=(n, 2))
    am = cv_multitask_lasso_path(X, Y, nfolds=8, nlambda=5, seed=0,
                                 fold_mesh=mesh)
    bm = cv_multitask_lasso_path(X, Y, nfolds=8, nlambda=5, seed=0)
    np.testing.assert_allclose(am.cvm, bm.cvm, rtol=1e-5)


def test_keep_matrix_and_cox():
    """glmnet's keep=TRUE for the matrix families and cox: the
    prevalidated predictors reproduce the CV losses exactly."""
    from admm_tpu.models.cox import cv_cox_path
    from admm_tpu.models.cv import (cv_multinomial_path,
                                    cv_multitask_lasso_path)

    rng = np.random.default_rng(10)
    n, p = 130, 10
    X = rng.normal(size=(n, p))
    Y = X[:, :3] @ rng.normal(size=(3, 2)) + 0.2 * rng.normal(size=(n, 2))
    cv = cv_multitask_lasso_path(X, Y, nfolds=3, nlambda=5, seed=0,
                                 keep=True)
    assert cv.fit_preval.shape == (n, 5, 2)
    np.testing.assert_allclose(
        ((cv.fit_preval - Y[:, None, :]) ** 2).sum(axis=2).mean(axis=0),
        cv.cvm, rtol=1e-10)

    y3 = np.argmax(X[:, :2] @ rng.normal(size=(2, 3))
                   + 0.3 * rng.normal(size=(n, 3)), axis=1)
    cvm_ = cv_multinomial_path(X, y3, nfolds=3, nlambda=5, seed=0,
                               keep=True)
    assert cvm_.fit_preval.shape == (n, 5, 3)
    ev = cvm_.fit_preval - cvm_.fit_preval.max(axis=2, keepdims=True)
    logp = ev - np.log(np.exp(ev).sum(axis=2, keepdims=True))
    dev = -2.0 * logp[np.arange(n), :, y3]
    np.testing.assert_allclose(dev.mean(axis=0), cvm_.cvm, rtol=1e-8)

    t = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    cvc = cv_cox_path(X, t, d, nfolds=3, nlambda=5, seed=0, keep=True)
    assert cvc.fit_preval.shape == (n, 5)
    assert np.all(np.isfinite(cvc.fit_preval))


def test_loop_cv_accepts_user_lambdas_and_keep_offset_scale():
    """Review fixes: (a) loop-mode CV with an explicit lambdas= grid
    must not crash on a duplicate keyword; (b) gaussian keep=True with
    offset= returns fit_preval on the ORIGINAL scale (reproduces cvm
    against the unshifted y)."""
    from admm_tpu.models.cox import cv_cox_path
    from admm_tpu.models.cv import (cv_multinomial_path,
                                    cv_multitask_lasso_path)

    rng = np.random.default_rng(17)
    n, p = 100, 8
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    lams = np.array([0.2, 0.08, 0.03])
    cv = cv_cox_path(X, t, d, nfolds=3, lambdas=lams, cv_mode="loop")
    assert cv.cvm.shape == (3,)
    y3 = rng.integers(0, 3, n)
    cvm_ = cv_multinomial_path(X, y3, nfolds=3, lambdas=lams,
                               cv_mode="loop")
    assert cvm_.cvm.shape == (3,)
    Y = X[:, :2] @ rng.normal(size=(2, 2)) + 0.2 * rng.normal(size=(n, 2))
    cvt = cv_multitask_lasso_path(X, Y, nfolds=3, lambdas=lams,
                                  cv_mode="loop")
    assert cvt.cvm.shape == (3,)

    off = rng.normal(size=n)
    y = X[:, 0] + off + 0.2 * rng.normal(size=n)
    cvk = cv_lasso_path(X, y, offset=off, keep=True, nfolds=3,
                        nlambda=5)
    # fit_preval is on the ORIGINAL scale: scoring against y itself
    # reproduces cvm.
    np.testing.assert_allclose(
        ((cvk.fit_preval - y[:, None]) ** 2).mean(axis=0), cvk.cvm,
        rtol=1e-6)


def test_fold_mesh_group_gen_relaxed():
    """fold_mesh shards the group / generalized / relaxed sweeps'
    fold axis: results equal the unsharded one-pass run."""
    from admm_tpu.models.cv import cv_gen_lasso_path, cv_group_lasso_path
    from admm_tpu.models.genlasso import difference_matrix
    from admm_tpu.models.relaxed import cv_relaxed_lasso_path
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n, p = 160, 10
    X = rng.normal(size=(n, p))
    y = X[:, 0] + 0.2 * rng.normal(size=n)
    mesh = make_mesh(8)
    a = cv_group_lasso_path(X, y, np.arange(p) % 5, nfolds=8,
                            nlambda=5, fold_mesh=mesh)
    b = cv_group_lasso_path(X, y, np.arange(p) % 5, nfolds=8, nlambda=5)
    np.testing.assert_allclose(a.cvm, b.cvm, rtol=1e-5)
    D = difference_matrix(p, 1)
    ag = cv_gen_lasso_path(X, y, D, nfolds=8, nlambda=5, fold_mesh=mesh)
    bg = cv_gen_lasso_path(X, y, D, nfolds=8, nlambda=5)
    np.testing.assert_allclose(ag.cvm, bg.cvm, rtol=1e-5)
    ar = cv_relaxed_lasso_path(X, y, nfolds=8, nlambda=5,
                               fold_mesh=mesh)
    br = cv_relaxed_lasso_path(X, y, nfolds=8, nlambda=5)
    np.testing.assert_allclose(ar["cvm"], br["cvm"], rtol=1e-5)
