"""Multi-task (multi-response) Lasso (admm_tpu.models.multitask).

Extension beyond the reference (single-response only); oracle: sklearn
MultiTaskLasso solves the identical objective by coordinate descent."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.models.multitask import multitask_lasso_path


def _problem(n=200, p=20, K=4, seed=0):
    rng = np.random.default_rng(seed)
    B = np.zeros((p, K))
    B[:5] = rng.uniform(0.5, 2.0, (5, K)) * rng.choice([-1, 1], (5, K))
    X = rng.normal(size=(n, p))
    Y = 1.0 + X @ B + 0.3 * rng.normal(size=(n, K))
    return X, Y, B


def test_matches_sklearn_multitask_lasso():
    from sklearn.linear_model import MultiTaskLasso

    X, Y, _ = _problem()
    lam = 0.1
    r = multitask_lasso_path(X, Y, lambdas=np.array([lam]),
                             standardize=False, intercept=True,
                             eps_abs=1e-7, eps_rel=1e-7)
    sk = MultiTaskLasso(alpha=lam, fit_intercept=True, tol=1e-12,
                        max_iter=100000).fit(X, Y)
    np.testing.assert_allclose(np.asarray(r.coef)[0], sk.coef_.T,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(r.beta0)[0], sk.intercept_,
                               atol=2e-4)


def test_matches_sklearn_wide_regime():
    from sklearn.linear_model import MultiTaskLasso

    rng = np.random.default_rng(3)
    n, p, K = 60, 120, 3
    B = np.zeros((p, K))
    B[:4] = rng.uniform(1.0, 2.0, (4, K))
    X = rng.normal(size=(n, p))
    Y = X @ B + 0.2 * rng.normal(size=(n, K))
    lam = 0.15
    r = multitask_lasso_path(X, Y, lambdas=np.array([lam]),
                             standardize=False, intercept=False,
                             eps_abs=1e-7, eps_rel=1e-7)
    sk = MultiTaskLasso(alpha=lam, fit_intercept=False, tol=1e-12,
                        max_iter=100000).fit(X, Y)
    np.testing.assert_allclose(np.asarray(r.coef)[0], sk.coef_.T,
                               atol=5e-4)


def test_shared_support_and_grid_top():
    """Rows die jointly (the defining property) and the auto grid top
    nulls the whole matrix."""
    X, Y, B = _problem()
    r = multitask_lasso_path(X, Y, nlambda=8)
    c = np.asarray(r.coef)
    assert np.allclose(c[0], 0.0)  # all-zero at lambda_max
    # At the smallest lambda: a row is zero for ALL tasks or none.
    last = c[-1]
    rownz = np.abs(last).max(axis=1) > 1e-6
    for j in range(last.shape[0]):
        if rownz[j]:
            assert np.all(np.abs(last[j]) > 0)
    assert rownz[:5].all()


def test_batch_matches_scan():
    X, Y, _ = _problem(n=150, p=12, K=3, seed=5)
    b = multitask_lasso_path(X, Y, nlambda=6, path_mode="batch",
                             eps_abs=1e-6, eps_rel=1e-6)
    s = multitask_lasso_path(X, Y, nlambda=6, path_mode="scan",
                             eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(b.coef), np.asarray(s.coef),
                               atol=2e-4)


def test_validates_inputs():
    X, Y, _ = _problem()
    with pytest.raises(ValueError, match="single response"):
        multitask_lasso_path(X, Y[:, 0])
    with pytest.raises(ValueError, match="nrow"):
        multitask_lasso_path(X[:50], Y)


def test_cv_multitask():
    from admm_tpu.models.cv import cv_multitask_lasso_path

    X, Y, _ = _problem(n=160, p=12, K=3, seed=7)
    cv = cv_multitask_lasso_path(X, Y, nfolds=4, nlambda=6, maxit=2000)
    assert np.all(np.isfinite(cv.cvm)) and np.all(cv.cvsd >= 0)
    assert cv.lambda_1se >= cv.lambda_min
    assert cv.cvm[np.argmin(np.abs(cv.lambdas - cv.lambda_min))] \
        < cv.cvm[0]


def test_multitask_trace_and_data_mesh():
    from admm_tpu.parallel.mesh import make_mesh

    X, Y, _ = _problem(n=120, p=10, K=2, seed=8)
    r = multitask_lasso_path(X, Y, nlambda=4, trace_len=64)
    assert r.trace.shape == (4, 64, 5)
    nrec = int((~np.isnan(np.asarray(r.trace)[0, :, 0])).sum())
    assert nrec == min(int(r.niter[0]), 64)
    rep = multitask_lasso_path(X, Y, nlambda=4)
    shd = multitask_lasso_path(X, Y, nlambda=4,
                               data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef),
                               np.asarray(rep.coef), atol=2e-4)


def test_multitask_penalty_factor_and_exclude():
    """glmnet's penalty.factor / exclude for family='mgaussian':
    column-rescaling oracle (uniform group penalty on X diag(1/pf)
    equals pf-weighted penalty with B = Bs/pf), zero-factor rows always
    in, excluded rows exactly zero and equal to dropping the columns."""
    import admm_tpu

    rng = np.random.default_rng(11)
    n, p, K = 150, 10, 3
    X = rng.normal(size=(n, p))
    B = np.zeros((p, K))
    B[:4] = rng.uniform(0.5, 1.5, (4, K))
    Y = X @ B + 0.3 * rng.normal(size=(n, K))

    pf = np.array([2.0, 0.5, 1.0, 3.0, 1.0, 1.0, 0.5, 1.0, 1.0, 2.0])
    pfs = pf * (p / pf.sum())
    lams = np.geomspace(0.5, 0.02, 6)
    r1 = admm_tpu.multitask_lasso_path(X, Y, lambdas=lams,
                                       standardize=False,
                                       penalty_factor=pf,
                                       eps_abs=1e-7, eps_rel=1e-7)
    r2 = admm_tpu.multitask_lasso_path(X / pfs, Y, lambdas=lams,
                                       standardize=False,
                                       eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(
        np.asarray(r1.coef), np.asarray(r2.coef) / pfs[:, None],
        atol=3e-5)

    pf0 = np.ones(p)
    pf0[0] = 0.0
    r0 = admm_tpu.multitask_lasso_path(X, Y, nlambda=8,
                                       penalty_factor=pf0)
    assert np.all(np.abs(np.asarray(r0.coef)[:, 0]).max(axis=1) > 1e-4)

    re = admm_tpu.multitask_lasso_path(X, Y, lambdas=lams,
                                       exclude=[1, 2],
                                       eps_abs=1e-7, eps_rel=1e-7)
    ce = np.asarray(re.coef)
    assert np.abs(ce[:, [1, 2]]).max() == 0.0
    keepc = [j for j in range(p) if j not in (1, 2)]
    rd = admm_tpu.multitask_lasso_path(X[:, keepc], Y, lambdas=lams,
                                       eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(ce[:, keepc], np.asarray(rd.coef),
                               atol=3e-4)
    with pytest.raises(ValueError):
        admm_tpu.multitask_lasso_path(X, Y, nlambda=4, exclude=[p])


def test_multitask_standardize_response():
    """glmnet's standardize.response=TRUE: with it ON, rescaling one
    task's response by a constant rescales that task's coefficients by
    the same constant and leaves the OTHER tasks' solution paths
    unchanged (the shared penalty sees unit-sd responses either way);
    with it OFF a rescaled task dominates the row norms and shifts
    every task's path."""
    import admm_tpu

    rng = np.random.default_rng(13)
    n, p, K = 150, 10, 3
    X = rng.normal(size=(n, p))
    B = np.zeros((p, K))
    B[:4] = rng.uniform(0.5, 1.5, (4, K))
    Y = X @ B + 0.3 * rng.normal(size=(n, K))
    scale = np.array([1.0, 50.0, 1.0])

    a = admm_tpu.multitask_lasso_path(X, Y, nlambda=8,
                                      standardize_response=True)
    bb = admm_tpu.multitask_lasso_path(X, Y * scale, nlambda=8,
                                       standardize_response=True)
    np.testing.assert_allclose(np.asarray(a.lambdas),
                               np.asarray(bb.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bb.coef),
                               np.asarray(a.coef) * scale, rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bb.beta0),
                               np.asarray(a.beta0) * scale, rtol=1e-3,
                               atol=1e-5)
    # OFF (the default): the rescaled task changes the shared path.
    c = admm_tpu.multitask_lasso_path(X, Y * scale, nlambda=8)
    assert not np.allclose(np.asarray(c.coef),
                           np.asarray(a.coef) * scale, rtol=1e-3)


def test_multitask_offset_is_exact_response_shift():
    import admm_tpu

    rng = np.random.default_rng(14)
    n, p, K = 150, 8, 3
    X = rng.normal(size=(n, p))
    Y = X @ rng.normal(size=(p, K)) + 0.2 * rng.normal(size=(n, K))
    O = rng.normal(size=(n, K))
    lams = np.geomspace(0.5, 0.05, 5)
    a = admm_tpu.multitask_lasso_path(X, Y, lambdas=lams, offset=O)
    b = admm_tpu.multitask_lasso_path(X, Y - O, lambdas=lams)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.beta0), np.asarray(b.beta0),
                               atol=1e-6)
    with pytest.raises(ValueError, match="offset"):
        admm_tpu.multitask_lasso_path(X, Y, nlambda=4,
                                      offset=np.zeros(n))


def test_matches_sklearn_multitask_elasticnet():
    """glmnet's mgaussian elastic net (alpha < 1): the compound row
    prox against sklearn MultiTaskElasticNet's identical objective
    (alpha_sklearn = lam, l1_ratio = alpha), both regimes."""
    from sklearn.linear_model import MultiTaskElasticNet

    X, Y, _ = _problem()
    lam, al = 0.15, 0.6
    r = multitask_lasso_path(X, Y, lambdas=np.array([lam]), alpha=al,
                             standardize=False, intercept=True,
                             eps_abs=1e-7, eps_rel=1e-7)
    sk = MultiTaskElasticNet(alpha=lam, l1_ratio=al, fit_intercept=True,
                             tol=1e-12, max_iter=100000).fit(X, Y)
    np.testing.assert_allclose(np.asarray(r.coef)[0], sk.coef_.T,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(r.beta0)[0], sk.intercept_,
                               atol=3e-4)
    # Wide regime.
    rng = np.random.default_rng(7)
    n, p, K = 60, 120, 3
    Xw = rng.normal(size=(n, p))
    Bw = np.zeros((p, K)); Bw[:6] = rng.uniform(0.5, 1.5, (6, K))
    Yw = Xw @ Bw + 0.2 * rng.normal(size=(n, K))
    rw = multitask_lasso_path(Xw, Yw, lambdas=np.array([lam]), alpha=al,
                              standardize=False, intercept=False,
                              eps_abs=1e-7, eps_rel=1e-7, maxit=60000)
    skw = MultiTaskElasticNet(alpha=lam, l1_ratio=al,
                              fit_intercept=False, tol=1e-12,
                              max_iter=200000).fit(Xw, Yw)
    np.testing.assert_allclose(np.asarray(rw.coef)[0], skw.coef_.T,
                               atol=5e-4)
    # alpha-aware auto grid top: the first point nulls the model, the
    # second does not.
    auto = multitask_lasso_path(X, Y, nlambda=4, alpha=al)
    c = np.asarray(auto.coef)
    assert np.all(c[0] == 0.0) and np.any(c[1] != 0.0)
    with pytest.raises(ValueError, match="alpha"):
        multitask_lasso_path(X, Y, nlambda=4, alpha=0.0)


# ---------------------------------------------------------------------------
# Nuclear (trace-norm / reduced-rank) penalty
# ---------------------------------------------------------------------------

def _low_rank_problem(n=200, p=20, K=6, r=2, seed=0, sd=0.3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    B = (rng.normal(size=(p, r)) @ rng.normal(size=(r, K))) / np.sqrt(r)
    Y = X @ B + sd * rng.normal(size=(n, K))
    return X, Y, B


def test_nuclear_k1_reduces_to_single_group_lasso():
    """A (p, 1) matrix's only singular value is ||b||_2, so the K=1
    nuclear path IS the all-features-one-group lasso (unit group
    weight)."""
    from admm_tpu.models.grouplasso import group_lasso_path
    from admm_tpu.models.multitask import multitask_nuclear_path

    rng = np.random.default_rng(1)
    n, p = 150, 12
    X = rng.normal(size=(n, p))
    y = X[:, :3] @ np.array([1.5, -1.0, 0.8]) + 0.3 * rng.normal(size=n)
    lams = np.geomspace(0.4, 0.02, 5)
    nu = multitask_nuclear_path(X, y[:, None], lambdas=lams,
                                dtype=jnp.float64, eps_abs=1e-9,
                                eps_rel=1e-9)
    gl = group_lasso_path(X, y, np.zeros(p, int), weights=np.ones(1),
                          lambdas=lams, dtype=jnp.float64,
                          eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(nu.coef[:, :, 0])
                  - np.asarray(gl.coef)).max() < 1e-6


def test_nuclear_kkt_certificate():
    """Spectral-norm subgradient conditions of the trace norm at the
    optimum: s_max(X'R/n) <= lam, and U' (X'R/n) V = lam I on the
    solution's singular subspace."""
    from admm_tpu.models.multitask import multitask_nuclear_path

    X, Y, B0 = _low_rank_problem(seed=2)
    n = X.shape[0]
    lam = 0.1
    res = multitask_nuclear_path(X, Y, lambdas=[lam], standardize=False,
                                 intercept=False, dtype=jnp.float64,
                                 eps_abs=1e-10, eps_rel=1e-10,
                                 maxit=100000)
    B = np.asarray(res.coef[0])
    G = X.T @ (Y - X @ B) / n
    s = np.linalg.svd(G, compute_uv=False)
    assert s[0] <= lam * (1 + 1e-6)
    U, sb, Vt = np.linalg.svd(B, full_matrices=False)
    act = sb > 1e-8
    r = int(act.sum())
    assert r >= 1
    core = U[:, act].T @ G @ Vt[act].T
    assert np.abs(core - lam * np.eye(r)).max() < 1e-7


def test_nuclear_rank_path_and_protocols():
    """Rank is monotone nonincreasing in lambda, the grid top (the
    exact spectral-norm threshold) is null, scan == batch, and a
    planted rank-2 coefficient matrix is recovered at moderate
    lambda."""
    from admm_tpu.models.multitask import multitask_nuclear_path

    X, Y, B0 = _low_rank_problem(seed=3)
    res = multitask_nuclear_path(X, Y, nlambda=6, dtype=jnp.float64,
                                 eps_abs=1e-8, eps_rel=1e-8)
    ranks = [np.linalg.matrix_rank(np.asarray(c), tol=1e-6)
             for c in res.coef]
    assert ranks[0] == 0
    assert all(ranks[i] <= ranks[i + 1] for i in range(len(ranks) - 1))
    rs = multitask_nuclear_path(X, Y, nlambda=6, dtype=jnp.float64,
                                eps_abs=1e-8, eps_rel=1e-8,
                                path_mode="scan")
    assert np.abs(np.asarray(res.coef) - np.asarray(rs.coef)).max() < 1e-5
    # Recovery: best path point approximates the plant.
    errs = [np.abs(np.asarray(c) - B0).max() for c in res.coef]
    assert min(errs) < 0.15
    with pytest.raises(ValueError, match="penalty"):
        multitask_nuclear_path(X, Y, penalty_factor=np.ones(X.shape[1]))
    from admm_tpu.models.multitask import multitask_lasso_path

    with pytest.raises(ValueError, match="penalty"):
        multitask_lasso_path(X, Y, penalty="nope")


def test_nuclear_cv_onepass_matches_loop():
    from admm_tpu.models.cv import cv_multitask_lasso_path

    X, Y, _ = _low_rank_problem(n=120, p=8, K=3, seed=4)
    kw = dict(nfolds=4, nlambda=4, seed=3, penalty="nuclear",
              eps_abs=1e-7, eps_rel=1e-7)
    one = cv_multitask_lasso_path(X, Y, cv_mode="onepass", **kw)
    loop = cv_multitask_lasso_path(X, Y, cv_mode="loop", **kw)
    assert one.cvm == pytest.approx(loop.cvm, rel=1e-4, abs=1e-6)
    assert one.lambda_min == loop.lambda_min


def test_parallel_nuclear_matches_serial():
    """Consensus reduced-rank path (SVT master prox on the flattened
    consensus engine) agrees with the serial solver on the 8-device
    mesh."""
    from admm_tpu.models.multitask import multitask_nuclear_path
    from admm_tpu.parallel.consensus import parallel_multitask_lasso_path

    X, Y, _ = _low_rank_problem(n=160, p=10, K=3, seed=5)
    lams = np.array([0.2, 0.05])
    par = parallel_multitask_lasso_path(X, Y, lambdas=lams, nworkers=8,
                                        penalty="nuclear",
                                        eps_abs=1e-7, eps_rel=1e-7)
    ser = multitask_nuclear_path(X, Y, lambdas=lams, eps_abs=1e-7,
                                 eps_rel=1e-7)
    gap = np.abs(np.asarray(par.coef) - np.asarray(ser.coef)).max()
    assert gap < 2e-3, gap
