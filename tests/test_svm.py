"""Linear SVM: sklearn (liblinear) oracle, objective optimality,
protocol agreement, weights, and one-pass CV."""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.svm import LinearSVC

from admm_tpu.models.svm import cv_svm_path, svm_fit, svm_path


def _problem(n=300, p=25, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    w = rng.normal(size=p)
    y = (X @ w + 0.5 * rng.normal(size=n) > 0).astype(int)
    return X, y


def _objective(X, y01, w, b, C, loss):
    ysign = np.where(y01 == 1, 1.0, -1.0)
    h = np.maximum(0.0, 1.0 - ysign * (X @ w + b))
    l = h.sum() if loss == "hinge" else (h * h).sum()
    return 0.5 * np.dot(w, w) + C * l


def _sk(X, y, loss, C, intercept=False):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sk = LinearSVC(loss=loss, C=C, fit_intercept=intercept,
                       tol=1e-12, max_iter=300000, dual=True)
        sk.fit(X, y)
    return sk


@pytest.mark.parametrize("C", [0.1, 1.0])
def test_squared_hinge_matches_liblinear(C):
    X, y = _problem()
    sk = _sk(X, y, "squared_hinge", C)
    r = svm_fit(X, y, C=C, intercept=False, dtype=jnp.float64,
                eps_abs=1e-9, eps_rel=1e-9)
    gap = np.abs(np.asarray(r.coef[0]) - sk.coef_.ravel()).max()
    assert gap < 1e-5, gap


@pytest.mark.parametrize("C", [0.1, 1.0])
def test_hinge_objective_at_least_liblinear(C):
    """liblinear's dual CD stalls on hinge at loose duality gaps; the
    pin is the primal objective — ours must be at least as good, and
    the coefficients must agree when liblinear did converge."""
    X, y = _problem(seed=1)
    sk = _sk(X, y, "hinge", C)
    r = svm_fit(X, y, C=C, loss="hinge", intercept=False,
                dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9,
                maxit=60000)
    w = np.asarray(r.coef[0])
    ours = _objective(X, y, w, 0.0, C, "hinge")
    theirs = _objective(X, y, sk.coef_.ravel(), 0.0, C, "hinge")
    assert ours <= theirs + 1e-7
    if np.abs(w - sk.coef_.ravel()).max() > 1e-3:
        assert ours < theirs - 1e-9  # disagreement must be their stall


def test_unpenalized_intercept_beats_penalized():
    """The true SVM objective leaves b unpenalized; liblinear folds b
    into the penalty (intercept_scaling) — on a shifted problem our
    fit must win under the unpenalized-b objective."""
    X, y = _problem(seed=2)
    X = X + 2.0  # force a substantial intercept
    C = 1.0
    sk = _sk(X, y, "squared_hinge", C, intercept=True)
    r = svm_fit(X, y, C=C, dtype=jnp.float64, eps_abs=1e-9,
                eps_rel=1e-9)
    ours = _objective(X, y, np.asarray(r.coef[0]),
                      float(r.intercept[0]), C, "squared_hinge")
    theirs = _objective(X, y, sk.coef_.ravel(),
                        float(sk.intercept_[0]), C, "squared_hinge")
    assert ours <= theirs + 1e-7


def test_batch_scan_agree():
    X, y = _problem(n=200, p=15, seed=3)
    Cs = np.geomspace(3.0, 0.01, 8)
    rb = svm_path(X, y, Cs=Cs, dtype=jnp.float64, eps_abs=1e-8,
                  eps_rel=1e-8)
    rs = svm_path(X, y, Cs=Cs, path_mode="scan", dtype=jnp.float64,
                  eps_abs=1e-8, eps_rel=1e-8)
    assert np.abs(np.asarray(rb.coef) - np.asarray(rs.coef)).max() < 1e-5
    assert np.abs(np.asarray(rb.intercept)
                  - np.asarray(rs.intercept)).max() < 1e-5


def test_weights_match_row_duplication():
    X, y = _problem(n=80, p=10, seed=4)
    w = np.ones(80)
    w[:7] = 3.0
    Xd = np.concatenate([X] + [X[:7]] * 2, axis=0)
    yd = np.concatenate([y] + [y[:7]] * 2)
    rw = svm_fit(X, y, C=0.5, weights=w, dtype=jnp.float64,
                 eps_abs=1e-9, eps_rel=1e-9, rho=0.3)
    rd = svm_fit(Xd, yd, C=0.5, dtype=jnp.float64, eps_abs=1e-9,
                 eps_rel=1e-9, rho=0.3)
    assert np.abs(np.asarray(rw.coef[0])
                  - np.asarray(rd.coef[0])).max() < 1e-6
    assert abs(float(rw.intercept[0]) - float(rd.intercept[0])) < 1e-6


def test_label_conventions():
    X, y = _problem(n=120, p=8, seed=5)
    ypm = np.where(y == 1, 1, -1)
    r01 = svm_fit(X, y, C=1.0, dtype=jnp.float64)
    rpm = svm_fit(X, ypm, C=1.0, dtype=jnp.float64)
    assert np.abs(np.asarray(r01.coef) - np.asarray(rpm.coef)).max() < 1e-6
    with pytest.raises(ValueError, match="two classes"):
        svm_fit(X, np.zeros_like(y))
    with pytest.raises(ValueError, match="loss"):
        svm_fit(X, y, loss="nope")


def test_trace_mode():
    X, y = _problem(n=100, p=8, seed=6)
    r = svm_path(X, y, Cs=[1.0, 0.1], trace_len=40)
    assert r.trace.shape == (2, 40, 5)


def test_cv_onepass_matches_manual_fold_loop():
    X, y = _problem(n=160, p=10, seed=7)
    Cs = np.geomspace(3.0, 0.03, 6)
    res = cv_svm_path(X, y, nfolds=4, Cs=Cs, seed=11,
                      dtype=jnp.float64, eps_abs=1e-8, eps_rel=1e-8)
    ysign = np.where(y == 1, 1.0, -1.0)
    cvraw = np.zeros((160, 6))
    for f in range(4):
        tr = res.foldid != f
        fit = svm_path(X[tr], y[tr], Cs=Cs, dtype=jnp.float64,
                       eps_abs=1e-8, eps_rel=1e-8)
        eta = X[~tr] @ np.asarray(fit.coef).T \
            + np.asarray(fit.intercept)[None, :]
        cvraw[~tr] = (ysign[~tr, None] * eta <= 0).astype(float)
    cvm = cvraw.mean(axis=0)
    assert res.cvm == pytest.approx(cvm, abs=1e-12)
    assert res.C_1se <= res.C_min + 1e-12


def test_separable_margin_sanity():
    """On linearly separable data with large C the SVM classifies the
    training set perfectly and the margin constraints hold."""
    rng = np.random.default_rng(8)
    X = np.concatenate([rng.normal(size=(50, 5)) + 3.0,
                        rng.normal(size=(50, 5)) - 3.0])
    y = np.array([1] * 50 + [0] * 50)
    r = svm_fit(X, y, C=10.0, dtype=jnp.float64, eps_abs=1e-8,
                eps_rel=1e-8)
    eta = X @ np.asarray(r.coef[0]) + float(r.intercept[0])
    ysign = np.where(y == 1, 1.0, -1.0)
    assert np.all(ysign * eta > 0.99)


def test_data_mesh_and_fold_mesh_match_single_device():
    from admm_tpu.parallel.mesh import make_mesh

    X, y = _problem(n=160, p=10, seed=9)
    mesh = make_mesh(8)
    Cs = np.geomspace(1.0, 0.05, 5)
    rep = svm_path(X, y, Cs=Cs)
    shd = svm_path(X, y, Cs=Cs, data_mesh=mesh)
    assert np.abs(np.asarray(rep.coef) - np.asarray(shd.coef)).max() < 1e-5

    cv0 = cv_svm_path(X, y, nfolds=8, Cs=Cs, seed=3)
    cv1 = cv_svm_path(X, y, nfolds=8, Cs=Cs, seed=3, fold_mesh=mesh)
    assert cv0.cvm == pytest.approx(cv1.cvm, abs=1e-10)


def test_predict_svm_results():
    """predict()/coef() work on SVM path and CV results: decision
    values, class labels mapped back to the original labels, C-grid
    interpolation, and the CV C_1se default."""
    from admm_tpu.predict import coef, predict

    X, y = _problem(n=150, p=8, seed=10)
    ylab = np.where(y == 1, 5, 2)          # arbitrary labels
    Cs = np.geomspace(2.0, 0.05, 6)
    fit = svm_path(X, ylab, Cs=Cs, dtype=jnp.float64)
    eta = predict(fit, X)
    assert eta.shape == (6, 150)
    lab = predict(fit, X, type="class", lam=float(Cs[2]))
    assert set(np.unique(lab)) <= {2, 5}
    # On-grid lam is exact.
    assert eta[2] == pytest.approx(predict(fit, X, lam=float(Cs[2])))
    # Off-grid interpolates between brackets.
    mid = predict(fit, X, lam=float(np.sqrt(Cs[2] * Cs[3])))
    lo = np.minimum(eta[2], eta[3]) - 1e-9
    hi = np.maximum(eta[2], eta[3]) + 1e-9
    assert np.all((mid >= lo) & (mid <= hi))
    cm = coef(fit, lam=float(Cs[1]))
    assert cm.shape == (9,)  # intercept + 8 slopes
    assert cm[0] == pytest.approx(float(fit.intercept[1]))
    with pytest.raises(ValueError, match="decision"):
        predict(fit, X, type="response")

    cv = cv_svm_path(X, ylab, nfolds=4, Cs=Cs, dtype=jnp.float64)
    eta_cv = predict(cv, X)                # C_1se default
    assert eta_cv.shape == (150,)
    eta_min = predict(cv, X, lam="C_min")
    assert eta_min == pytest.approx(
        predict(cv.fit, X, lam=cv.C_min))


def test_cv_excludes_negative_foldid_rows():
    """foldid = -1 rows train in every fold but are never scored (the
    cv.py convention) — review fix: they previously counted as
    misclassifications at every C."""
    X, y = _problem(n=120, p=8, seed=12)
    Cs = np.geomspace(1.0, 0.05, 4)
    foldid = np.tile(np.arange(3), 40)
    foldid[:20] = -1
    res = cv_svm_path(X, y, foldid=foldid, Cs=Cs, dtype=jnp.float64)
    # Manual loop over the scored rows only.
    ysign = np.where(y == 1, 1.0, -1.0)
    cvraw = []
    for f in range(3):
        tr = foldid != f
        va = foldid == f
        fit = svm_path(X[tr], y[tr], Cs=Cs, dtype=jnp.float64)
        eta = X[va] @ np.asarray(fit.coef).T \
            + np.asarray(fit.intercept)[None, :]
        cvraw.append((ysign[va, None] * eta <= 0).astype(float))
    cvm = np.concatenate(cvraw).mean(axis=0)
    assert res.cvm == pytest.approx(cvm, abs=1e-12)
    with pytest.raises(ValueError, match="at least one row"):
        cv_svm_path(X, y, foldid=np.zeros(120, int), Cs=Cs)
    with pytest.raises(ValueError, match="positive"):
        svm_path(X, y, Cs=[1.0, 0.0])
