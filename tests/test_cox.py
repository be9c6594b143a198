"""L1 Cox proportional hazards (admm_tpu.models.cox).

Oracle: an INDEPENDENT numpy proximal-gradient solver with explicit
loops over risk sets (different algorithm, different risk-set code
path), plus KKT and the partial-likelihood invariances."""
import numpy as np
import pytest

from admm_tpu.models.cox import cox_lasso_path


def _problem(n=120, p=6, seed=0, ties=True):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.array([0.8, -0.6, 0.4] + [0.0] * (p - 3))
    t = rng.exponential(np.exp(-(X @ b)))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    if ties:
        t = np.round(t, 1)
        t[t == 0] = 0.1
    return X, t, d, b


def _oracle(X, t, d, lam, iters=12000):
    """Proximal gradient on the Breslow partial likelihood with
    EXPLICIT risk-set loops (independent of the cumsum formulation)."""
    n, p = X.shape
    b = np.zeros(p)
    L = d.sum() / (2 * n) * np.linalg.eigvalsh(X.T @ X).max()
    step = 1.0 / L
    for _ in range(iters):
        ee = np.exp(X @ b)
        g_eta = np.zeros(n)
        for i in range(n):
            if d[i] == 1:
                R = t >= t[i]
                g_eta[R] += ee[R] / ee[R].sum()
                g_eta[i] -= 1.0
        v = b - step * (X.T @ g_eta / n)
        b_new = np.sign(v) * np.maximum(np.abs(v) - step * lam, 0.0)
        if np.abs(b_new - b).max() < 1e-11:
            return b_new
        b = b_new
    return b


@pytest.mark.parametrize("ties", [False, True])
def test_matches_independent_oracle(ties):
    X, t, d, _ = _problem(ties=ties)
    lam = 0.02
    r = cox_lasso_path(X, t, d, lambdas=np.array([lam]),
                       standardize=False, eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_allclose(np.asarray(r.coef)[0],
                               _oracle(X, t, d, lam), atol=5e-5)


def test_grid_top_nulls_and_invariances():
    X, t, d, _ = _problem(seed=3)
    r = cox_lasso_path(X, t, d, nlambda=8)
    c = np.asarray(r.coef)
    # Nulled at lambda_max to solver tolerance (the f32 grid top can
    # land one ulp inside the exact KKT boundary).
    assert np.abs(c[0]).max() < 1e-4
    assert np.abs(c[-1]).max() > 0.3       # signal at the bottom
    # Only the ORDER of times matters: a monotone transform changes
    # nothing (risk sets identical).
    r2 = cox_lasso_path(X, np.exp(t), d, nlambda=8)
    np.testing.assert_allclose(np.asarray(r2.coef), c, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2.lambdas),
                               np.asarray(r.lambdas), rtol=1e-6)


def test_batch_matches_scan_and_validation():
    X, t, d, _ = _problem(seed=4)
    b = cox_lasso_path(X, t, d, nlambda=6, path_mode="batch",
                       eps_abs=1e-7, eps_rel=1e-7)
    s = cox_lasso_path(X, t, d, nlambda=6, path_mode="scan",
                       eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(s.coef),
                               atol=2e-4)
    with pytest.raises(ValueError, match="event"):
        cox_lasso_path(X, t, d + 0.5)
    with pytest.raises(ValueError, match="no events"):
        cox_lasso_path(X, t, np.zeros_like(d))


def test_kkt_at_convergence():
    """KKT with the gradient computed by the INDEPENDENT loop code."""
    X, t, d, _ = _problem(seed=5)
    n = X.shape[0]
    lam = 0.03
    r = cox_lasso_path(X, t, d, lambdas=np.array([lam]),
                       standardize=False, eps_abs=1e-8, eps_rel=1e-8)
    b = np.asarray(r.coef)[0]
    ee = np.exp(X @ b)
    g_eta = np.zeros(n)
    for i in range(n):
        if d[i] == 1:
            R = t >= t[i]
            g_eta[R] += ee[R] / ee[R].sum()
            g_eta[i] -= 1.0
    g = X.T @ g_eta / n
    act = np.abs(b) > 1e-6
    np.testing.assert_allclose(g[act], -lam * np.sign(b[act]), atol=5e-5)
    assert np.all(np.abs(g[~act]) <= lam * (1 + 1e-3))


def test_cv_cox_vvh():
    """V&VH CV deviance: finite, and the minimizer is interior on a
    strong-signal problem (over- and under-penalized ends are worse)."""
    from admm_tpu.models.cox import cv_cox_path

    X, t, d, _ = _problem(n=240, p=10, seed=7)
    cv = cv_cox_path(X, t, d, nfolds=4, nlambda=12,
                     lambda_min_ratio=1e-3)
    assert np.all(np.isfinite(cv.cvm)) and np.all(cv.cvsd >= 0)
    assert cv.lambda_1se >= cv.lambda_min
    i = int(np.argmin(cv.cvm))
    assert cv.cvm[i] < cv.cvm[0]  # beats the null top


def test_cox_penalty_factor_limits_exclude():
    """glmnet's per-coefficient arguments for family='cox':
    column-rescaling oracle for penalty_factor, exclusion pinned equal
    to dropping the column, nonnegativity box, batch-mode support, and
    CV pass-through."""
    import admm_tpu

    rng = np.random.default_rng(5)
    n, p = 150, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.8, -0.8], np.zeros(p - 2)])
    t = rng.exponential(np.exp(-(X @ b)))
    d = (rng.uniform(size=n) < 0.7).astype(float)

    pf = np.array([2.0, 0.5, 1.0, 3.0, 1.0, 1.0, 0.5, 1.0])
    pfs = pf * (p / pf.sum())
    lams = np.geomspace(0.1, 0.005, 6)
    r1 = admm_tpu.cox_lasso_path(X, t, d, lambdas=lams,
                                 standardize=False, penalty_factor=pf,
                                 eps_abs=1e-7, eps_rel=1e-7)
    r2 = admm_tpu.cox_lasso_path(X / pfs, t, d, lambdas=lams,
                                 standardize=False,
                                 eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(r1.coef),
                               np.asarray(r2.coef) / pfs, atol=1e-5)

    r3 = admm_tpu.cox_lasso_path(X, t, d, lambdas=lams, exclude=[0],
                                 eps_abs=1e-7, eps_rel=1e-7)
    keep = list(range(1, p))
    r4 = admm_tpu.cox_lasso_path(X[:, keep], t, d, lambdas=lams,
                                 eps_abs=1e-7, eps_rel=1e-7)
    c3 = np.asarray(r3.coef)
    assert np.abs(c3[:, 0]).max() == 0.0
    np.testing.assert_allclose(c3[:, keep], np.asarray(r4.coef),
                               atol=1e-5)

    r5 = admm_tpu.cox_lasso_path(X, t, d, nlambda=6, lower_limits=0.0)
    assert np.asarray(r5.coef).min() >= 0.0
    r6 = admm_tpu.cox_lasso_path(X, t, d, nlambda=6, penalty_factor=pf,
                                 path_mode="batch")
    assert np.isfinite(np.asarray(r6.coef)).all()

    cv = admm_tpu.cv_cox_path(X, t, d, nfolds=4, nlambda=6, exclude=[0])
    assert np.abs(np.asarray(cv.fit.coef)[:, 0]).max() == 0.0
    assert np.isfinite(cv.cvm).all()


def test_cox_weights_and_offset():
    """glmnet's weights/offset for family='cox': integer case weights
    == row duplication (Breslow ties make the duplicated rows exact),
    a CONSTANT offset leaves the fit invariant (the partial
    likelihood's shift gauge), and CV subsets both per fold."""
    import admm_tpu

    rng = np.random.default_rng(6)
    n, p = 100, 5
    X = rng.normal(size=(n, p))
    t = np.round(rng.exponential(
        np.exp(-(X[:, :2] @ [0.8, -0.8]))), 2) + 0.05
    d = (rng.uniform(size=n) < 0.7).astype(float)
    lams = np.geomspace(0.1, 0.01, 5)

    r0 = admm_tpu.cox_lasso_path(X, t, d, lambdas=lams,
                                 eps_abs=1e-7, eps_rel=1e-7)
    r1 = admm_tpu.cox_lasso_path(X, t, d, lambdas=lams,
                                 offset=np.full(n, 3.7),
                                 eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(r0.coef),
                               np.asarray(r1.coef), atol=2e-6)

    w = rng.integers(1, 4, size=n).astype(float)
    idx = np.repeat(np.arange(n), w.astype(int))
    rw = admm_tpu.cox_lasso_path(X, t, d, lambdas=lams, weights=w,
                                 eps_abs=1e-8, eps_rel=1e-8)
    rd = admm_tpu.cox_lasso_path(X[idx], t[idx], d[idx], lambdas=lams,
                                 eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_allclose(np.asarray(rw.coef),
                               np.asarray(rd.coef), atol=2e-6)

    rb = admm_tpu.cox_lasso_path(X, t, d, nlambda=5, weights=w,
                                 offset=0.3 * X[:, 4],
                                 path_mode="batch")
    assert np.isfinite(np.asarray(rb.coef)).all()

    cv = admm_tpu.cv_cox_path(X, t, d, nfolds=4, nlambda=5, weights=w,
                              offset=0.2 * X[:, 4])
    assert np.isfinite(cv.cvm).all()
    with pytest.raises(ValueError, match="positive"):
        admm_tpu.cox_lasso_path(X, t, d, nlambda=4,
                                weights=np.zeros(n))


def test_cv_cox_type_measure_C():
    """glmnet's type.measure='C' for family='cox': per-fold held-out
    Harrell C-index, event-count fold weights, MAXIMISING selection."""
    from admm_tpu.glmnet import cv_glmnet
    from admm_tpu.models.cox import cv_cox_path

    rng = np.random.default_rng(31)
    n, p = 200, 10
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.8, -0.6], np.zeros(p - 2)])
    t = rng.exponential(np.exp(-(X @ b)))
    d = (rng.uniform(size=n) < 0.8).astype(float)
    cv = cv_cox_path(X, t, d, nfolds=4, nlambda=8, seed=0,
                     type_measure="C")
    assert np.all((cv.cvm >= 0.0) & (cv.cvm <= 1.0))
    # Signal is strong: the best model discriminates well...
    assert cv.cvm.max() > 0.65
    # ...and lambda_min MAXIMISES (the null top of the grid ties at .5).
    assert cv.cvm[np.flatnonzero(cv.lambdas == cv.lambda_min)[0]] \
        == cv.cvm.max()
    assert cv.lambda_1se >= cv.lambda_min
    # Front-door pass-through.
    cv2 = cv_glmnet(X, np.c_[t, d], "cox", nfolds=4, nlambda=8, seed=0,
                    type_measure="C")
    np.testing.assert_allclose(cv2.cvm, cv.cvm)
    with pytest.raises(ValueError, match="type_measure"):
        cv_cox_path(X, t, d, nlambda=5, type_measure="auc")


def test_survfit_cox_breslow_baseline():
    """survfit (glmnet's survfit.coxnet): the Breslow baseline
    cumulative hazard against an explicit risk-set loop, the
    Nelson-Aalen special case at beta=0, and CV-result defaults."""
    import admm_tpu
    from admm_tpu.models.cox import cv_cox_path, survfit_cox

    rng = np.random.default_rng(33)
    n, p = 120, 6
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.7, -0.5], np.zeros(p - 2)])
    t = rng.exponential(np.exp(-(X @ b)))
    t[10:14] = t[10]                       # ties
    d = (rng.uniform(size=n) < 0.7).astype(float)
    r = cox_lasso_path(X, t, d, nlambda=6)
    lam = float(r.lambdas[4])
    sf = survfit_cox(r, X, t, d, lam=lam)
    # Independent loop-based Breslow baseline at the same beta.
    beta = np.asarray(admm_tpu.predict(r, None, type="coefficients",
                                       lam=lam), np.float64)
    ee = np.exp(X @ beta)
    H_ref = []
    acc = 0.0
    for tk in sf.time:
        acc += d[t == tk].sum() / ee[t >= tk].sum()
        H_ref.append(acc)
    np.testing.assert_allclose(sf.cumhaz, H_ref, rtol=1e-10)
    # Survival curves: monotone nonincreasing in t, in (0, 1].
    assert np.all(np.diff(sf.surv, axis=0) <= 1e-12)
    assert sf.surv.shape == (sf.time.size, n)
    np.testing.assert_allclose(
        sf.surv, np.exp(-np.outer(sf.cumhaz, ee)), rtol=1e-12)
    # beta = 0 (top of grid) reduces to Nelson-Aalen.
    sf0 = survfit_cox(r, X, t, d, lam=float(r.lambdas[0]))
    na = []
    acc = 0.0
    for tk in sf0.time:
        acc += d[t == tk].sum() / float((t >= tk).sum())
        na.append(acc)
    np.testing.assert_allclose(sf0.cumhaz, na, rtol=1e-6)
    # CV result: defaults to lambda.1se.
    cv = cv_cox_path(X, t, d, nfolds=3, nlambda=6, seed=0)
    sfa = survfit_cox(cv, X, t, d)
    sfb = survfit_cox(cv.fit, X, t, d, lam=cv.lambda_1se)
    np.testing.assert_allclose(sfa.surv, sfb.surv)
    with pytest.raises(ValueError, match="lam"):
        survfit_cox(r, X, t, d)


def test_cv_cox_onepass_matches_loop():
    """The one-program fold sweep (weight-zero lanes dropping out of
    the Breslow risk sets) equals the host per-fold refit, weights and
    offset included."""
    from admm_tpu.models.cox import cv_cox_path

    rng = np.random.default_rng(41)
    n, p = 150, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.7, -0.5], np.zeros(p - 2)])
    t = rng.exponential(np.exp(-(X @ b)))
    t[20:23] = t[20]
    d = (rng.uniform(size=n) < 0.75).astype(float)
    w = rng.uniform(0.5, 2.0, n)
    off = 0.3 * rng.normal(size=n)
    a = cv_cox_path(X, t, d, nfolds=3, nlambda=6, seed=0,
                    cv_mode="onepass", weights=w, offset=off,
                    eps_abs=1e-7, eps_rel=1e-7)
    b_ = cv_cox_path(X, t, d, nfolds=3, nlambda=6, seed=0,
                     cv_mode="loop", weights=w, offset=off,
                     eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(a.cvm, b_.cvm, rtol=5e-4)
    np.testing.assert_allclose(a.cvsd, b_.cvsd, rtol=5e-3, atol=1e-6)
    assert np.argmin(a.cvm) == np.argmin(b_.cvm)
    # The C-index measure rides the same sweep.
    c1 = cv_cox_path(X, t, d, nfolds=3, nlambda=6, seed=0,
                     type_measure="C", cv_mode="onepass")
    c2 = cv_cox_path(X, t, d, nfolds=3, nlambda=6, seed=0,
                     type_measure="C", cv_mode="loop")
    np.testing.assert_allclose(c1.cvm, c2.cvm, atol=2e-3)
    with pytest.raises(ValueError, match="cv_mode"):
        cv_cox_path(X, t, d, nlambda=5, cv_mode="nope")


def test_stratified_cox():
    """glmnet's stratifySurv: segmented risk sets. Pinned by (a) one
    stratum == unstratified exactly, (b) KKT of the stratified partial
    likelihood via an independent per-stratum risk-set loop, (c) row
    permutation invariance, (d) CV onepass==loop, (e) per-stratum
    survfit baselines."""
    from admm_tpu.models.cox import (cv_cox_path, cox_lasso_path,
                                     survfit_cox)

    rng = np.random.default_rng(55)
    n, p = 200, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.8, -0.6], np.zeros(p - 2)])
    strata = rng.integers(0, 3, n)
    # Stratum-dependent baselines (scale shifts) + shared beta.
    t = rng.exponential(np.exp(-(X @ b))) * (1.0 + strata)
    d = (rng.uniform(size=n) < 0.75).astype(float)

    # (a) one stratum == unstratified.
    r0 = cox_lasso_path(X, t, d, nlambda=5, eps_abs=1e-7, eps_rel=1e-7)
    r1 = cox_lasso_path(X, t, d, nlambda=5, strata=np.zeros(n),
                        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(r1.coef), np.asarray(r0.coef),
                               atol=1e-6)

    # (b) KKT at convergence against an explicit per-stratum loop.
    lam = 0.03
    r = cox_lasso_path(X, t, d, lambdas=np.array([lam]), strata=strata,
                       standardize=False, eps_abs=1e-8, eps_rel=1e-8)
    coef = np.asarray(r.coef, np.float64)[0]
    eta = X @ coef
    g = np.zeros(n)
    for sv in np.unique(strata):
        m = strata == sv
        tm, dm, em = t[m], d[m], np.exp(eta[m])
        gs = np.zeros(m.sum())
        for i in range(m.sum()):
            G = sum(dm[k] / em[tm >= tm[k]].sum()
                    for k in range(m.sum()) if dm[k] > 0
                    and tm[k] <= tm[i])
            gs[i] = em[i] * G - dm[i]
        g[m] = gs
    grad = X.T @ g / n
    act = np.abs(coef) > 1e-6
    np.testing.assert_allclose(grad[act], -lam * np.sign(coef[act]),
                               atol=5e-4)
    assert np.all(np.abs(grad[~act]) <= lam * (1 + 1e-3))

    # (c) permutation invariance.
    perm = rng.permutation(n)
    rp = cox_lasso_path(X[perm], t[perm], d[perm], strata=strata[perm],
                        lambdas=np.array([lam]), standardize=False,
                        eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_allclose(np.asarray(rp.coef), np.asarray(r.coef),
                               atol=1e-5)

    # (d) CV: onepass == loop with strata.
    a = cv_cox_path(X, t, d, nfolds=3, nlambda=5, seed=0, strata=strata,
                    cv_mode="onepass", eps_abs=1e-7, eps_rel=1e-7)
    b_ = cv_cox_path(X, t, d, nfolds=3, nlambda=5, seed=0, strata=strata,
                     cv_mode="loop", eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(a.cvm, b_.cvm, rtol=5e-4)

    # (e) survfit: per-stratum baselines, monotone curves.
    sf = survfit_cox(r, X, t, d, strata=strata)
    assert set(sf.keys()) == set(np.unique(strata))
    for sv, f in sf.items():
        assert np.all(np.diff(f.surv, axis=0) <= 1e-12)
        assert f.surv.shape[1] == int((strata == sv).sum())


def test_startstop_cox():
    """glmnet's Surv(start, stop, event) counting-process model:
    interval risk sets via static gathers. Pinned by (a) start=0 ==
    right-censored exactly, (b) KKT against an explicit interval
    risk-set loop, (c) left truncation actually changes the fit,
    (d) CV onepass == loop, (e) survfit baseline vs a loop,
    (f) (n, 3) Surv front door."""
    from admm_tpu.glmnet import cv_glmnet, glmnet
    from admm_tpu.models.cox import (cv_cox_path, cox_lasso_path,
                                     survfit_cox)

    rng = np.random.default_rng(77)
    n, p = 150, 6
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.7, -0.5], np.zeros(p - 2)])
    stop = rng.exponential(np.exp(-(X @ b))) + 0.05
    d = (rng.uniform(size=n) < 0.75).astype(float)
    start = stop * rng.uniform(0.0, 0.8, n)

    # (a) start = 0 reduces exactly.
    r0 = cox_lasso_path(X, stop, d, nlambda=5, eps_abs=1e-7,
                        eps_rel=1e-7)
    rz = cox_lasso_path(X, stop, d, start=np.zeros(n), nlambda=5,
                        eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_array_equal(np.asarray(rz.coef),
                                  np.asarray(r0.coef))

    # (b) KKT at convergence vs explicit interval loops.
    lam = 0.03
    r = cox_lasso_path(X, stop, d, start=start,
                       lambdas=np.array([lam]), standardize=False,
                       eps_abs=1e-8, eps_rel=1e-8)
    coef = np.asarray(r.coef, np.float64)[0]
    ee = np.exp(X @ coef)
    g = np.zeros(n)
    for i in range(n):
        G = sum(1.0 / ee[(start < stop[k]) & (stop >= stop[k])].sum()
                for k in range(n)
                if d[k] > 0 and start[i] < stop[k] <= stop[i])
        g[i] = ee[i] * G - d[i]
    grad = X.T @ g / n
    act = np.abs(coef) > 1e-6
    np.testing.assert_allclose(grad[act], -lam * np.sign(coef[act]),
                               atol=5e-4)
    assert np.all(np.abs(grad[~act]) <= lam * (1 + 1e-3))

    # (c) ignoring the truncation gives a DIFFERENT fit.
    r_naive = cox_lasso_path(X, stop, d, lambdas=np.array([lam]),
                             standardize=False, eps_abs=1e-8,
                             eps_rel=1e-8)
    assert np.abs(coef - np.asarray(r_naive.coef)[0]).max() > 1e-3

    # (d) CV onepass == loop.
    a = cv_cox_path(X, stop, d, start=start, nfolds=3, nlambda=5,
                    seed=0, cv_mode="onepass", eps_abs=1e-7,
                    eps_rel=1e-7)
    b_ = cv_cox_path(X, stop, d, start=start, nfolds=3, nlambda=5,
                     seed=0, cv_mode="loop", eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(a.cvm, b_.cvm, rtol=5e-4)
    with pytest.raises(ValueError, match="start-stop"):
        cv_cox_path(X, stop, d, start=start, nlambda=4,
                    type_measure="C")

    # (e) survfit: baseline hazard vs an explicit loop.
    sf = survfit_cox(r, X, stop, d, start=start)
    acc, H_ref = 0.0, []
    for tk in sf.time:
        S = ee[(start < tk) & (stop >= tk)].sum()
        acc += d[stop == tk].sum() / S
        H_ref.append(acc)
    np.testing.assert_allclose(sf.cumhaz, H_ref, rtol=1e-10)

    # (f) (n, 3) Surv-style y through the front doors.
    y3 = np.c_[start, stop, d]
    rf = glmnet(X, y3, "cox", lambdas=np.array([lam]),
                standardize=False, eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_array_equal(np.asarray(rf.coef),
                                  np.asarray(r.coef))
    cvf = cv_glmnet(X, y3, "cox", nfolds=3, nlambda=5, seed=0)
    np.testing.assert_allclose(cvf.cvm, a.cvm, rtol=1e-5)

    # Validation.
    with pytest.raises(ValueError, match="nonempty"):
        cox_lasso_path(X, stop, d, start=stop, nlambda=4)

    # STRATIFIED start-stop (both at once): one stratum reduces to the
    # plain start-stop fit exactly, and the combined KKT holds against
    # explicit per-stratum interval risk-set loops.
    r1s = cox_lasso_path(X, stop, d, start=start, strata=np.zeros(n),
                         lambdas=np.array([lam]), standardize=False,
                         eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_allclose(np.asarray(r1s.coef), np.asarray(r.coef),
                               atol=1e-6)
    strata2 = rng.integers(0, 2, n)
    rc = cox_lasso_path(X, stop, d, start=start, strata=strata2,
                        lambdas=np.array([lam]), standardize=False,
                        eps_abs=1e-8, eps_rel=1e-8)
    cc = np.asarray(rc.coef, np.float64)[0]
    eec = np.exp(X @ cc)
    gg = np.zeros(n)
    for i in range(n):
        G = 0.0
        for k in range(n):
            if (d[k] > 0 and strata2[k] == strata2[i]
                    and start[i] < stop[k] <= stop[i]):
                m = (strata2 == strata2[k]) & (start < stop[k]) \
                    & (stop >= stop[k])
                G += 1.0 / eec[m].sum()
        gg[i] = eec[i] * G - d[i]
    gradc = X.T @ gg / n
    actc = np.abs(cc) > 1e-6
    np.testing.assert_allclose(gradc[actc], -lam * np.sign(cc[actc]),
                               atol=5e-4)
    assert np.all(np.abs(gradc[~actc]) <= lam * (1 + 1e-3))


def test_assess_cox_strata_start_and_survfit_plot():
    """assess() accepts strata/start (stratified / interval Breslow
    deviance; C dropped under left truncation) and plot_survfit
    renders both result shapes."""
    import matplotlib
    matplotlib.use("Agg")
    import admm_tpu
    from admm_tpu.models.cox import _breslow_pl, survfit_cox

    rng = np.random.default_rng(91)
    n, p = 100, 5
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.7).astype(float)
    strata = rng.integers(0, 2, n)
    r = cox_lasso_path(X, t, d, strata=strata, nlambda=4)
    a = admm_tpu.assess(r, X, np.c_[t, d], strata=strata)
    np.testing.assert_allclose(
        a["deviance"],
        -2.0 * _breslow_pl(X, t, d, np.asarray(r.coef),
                           strata=strata))
    start = t * rng.uniform(0, 0.5, n)
    rs = cox_lasso_path(X, t, d, start=start, nlambda=4)
    asur = admm_tpu.assess(rs, X, np.c_[start, t, d])
    assert "C" not in asur and np.all(np.isfinite(asur["deviance"]))

    from admm_tpu.plotting import plot_survfit
    sf = survfit_cox(r, X, t, d, strata=strata, lam=float(r.lambdas[-1]))
    plot_survfit(sf)
    sfu = survfit_cox(rs, X, t, d, start=start,
                      lam=float(rs.lambdas[-1]))
    plot_survfit(sfu)


def test_startstop_weights_equal_row_duplication():
    """The strongest weighted-risk-set invariant: integer case weight k
    under START-STOP risk sets equals repeating the row k times (ties
    included) — exercises the weighted interval sums, the entry-time
    subtractions and the tie groups together."""
    rng = np.random.default_rng(3)
    n, p = 60, 5
    X = rng.normal(size=(n, p))
    stop = rng.exponential(np.exp(-X[:, 0])) + 0.05
    stop[10:13] = stop[10]
    d = (rng.uniform(size=n) < 0.7).astype(float)
    start = stop * rng.uniform(0, 0.7, n)
    w = rng.integers(1, 4, n).astype(float)
    lams = np.array([0.05, 0.02])
    rw = cox_lasso_path(X, stop, d, start=start, weights=w,
                        lambdas=lams, standardize=False,
                        eps_abs=1e-8, eps_rel=1e-8)
    idx = np.repeat(np.arange(n), w.astype(int))
    rd = cox_lasso_path(X[idx], stop[idx], d[idx], start=start[idx],
                        lambdas=lams, standardize=False,
                        eps_abs=1e-8, eps_rel=1e-8)
    np.testing.assert_allclose(np.asarray(rw.coef),
                               np.asarray(rd.coef), atol=2e-6)


def test_stratified_startstop_cv_scoring_per_stratum():
    """Review fix: the combined strata+start CV must score with
    PER-STRATUM interval risk sets (the strata recursion runs before
    the start branch in _breslow_pl)."""
    from admm_tpu.models.cox import _breslow_pl

    rng = np.random.default_rng(61)
    n, p = 80, 5
    X = rng.normal(size=(n, p))
    stop = rng.exponential(np.exp(-X[:, 0])) + 0.05
    d = (rng.uniform(size=n) < 0.8).astype(float)
    start = stop * rng.uniform(0, 0.6, n)
    strata = rng.integers(0, 2, n)
    beta = np.zeros((1, p)); beta[0, 0] = 0.5
    both = _breslow_pl(X, stop, d, beta, None, None, strata, start)
    by_hand = sum(
        _breslow_pl(X[strata == sv], stop[strata == sv],
                    d[strata == sv], beta, None, None, None,
                    start[strata == sv])
        for sv in (0, 1))
    np.testing.assert_allclose(both, by_hand, rtol=1e-12)
    pooled = _breslow_pl(X, stop, d, beta, None, None, None, start)
    assert abs(float(both[0] - pooled[0])) > 1e-6   # truly per-stratum


def test_cv_cox_weighted_C():
    """Review fix: type_measure='C' folds score the WEIGHTED Harrell
    C (glmnet's Cindex(pred, y, weights)) — integer weights equal row
    duplication."""
    from admm_tpu.models.cox import cv_cox_path

    rng = np.random.default_rng(62)
    n, p = 120, 6
    X = rng.normal(size=(n, p))
    t = rng.exponential(np.exp(-X[:, 0]))
    d = (rng.uniform(size=n) < 0.8).astype(float)
    w = rng.integers(1, 3, n).astype(float)
    lams = np.array([0.15, 0.05, 0.02])
    foldid = np.arange(n) % 3
    a = cv_cox_path(X, t, d, foldid=foldid, lambdas=lams, weights=w,
                    type_measure="C", eps_abs=1e-7, eps_rel=1e-7)
    idx = np.repeat(np.arange(n), w.astype(int))
    b = cv_cox_path(X[idx], t[idx], d[idx], foldid=foldid[idx],
                    lambdas=lams, type_measure="C",
                    eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(a.cvm, b.cvm, atol=2e-3)
