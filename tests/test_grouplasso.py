"""Group Lasso (extension): KKT optimality, group sparsity, objective.

No in-image oracle package solves group lasso, so correctness is pinned
by the KKT conditions (necessary AND sufficient for this convex
problem) plus an independent proximal-gradient (FISTA-free, plain ISTA)
solve for objective comparison.
"""
import numpy as np
import pytest

from admm_tpu.models.grouplasso import group_lasso_path


def _problem(n=300, p=24, G=8, seed=7):
    rng = np.random.default_rng(seed)
    groups = np.repeat(np.arange(G), p // G)
    b = np.zeros(p)
    for g in (1, 4):  # two active groups
        b[groups == g] = rng.normal(size=(groups == g).sum()) * 2.0
    X = rng.normal(size=(n, p))
    y = X @ b + 0.5 * rng.normal(size=n)
    return X, y, groups, b


def _objective(X, y, groups, w, lam, b):
    n = len(y)
    gnorms = np.array([np.linalg.norm(b[groups == g])
                       for g in range(groups.max() + 1)])
    return (0.5 / n * np.sum((y - X @ b) ** 2)
            + lam * np.sum(w * gnorms))


def _ista(X, y, groups, w, lam, iters=20000):
    """Independent prox-gradient oracle."""
    n, p = X.shape
    L = np.linalg.norm(X, 2) ** 2 / n
    b = np.zeros(p)
    for _ in range(iters):
        g = X.T @ (X @ b - y) / n
        v = b - g / L
        for gi in range(groups.max() + 1):
            m = groups == gi
            nv = np.linalg.norm(v[m])
            v[m] *= max(0.0, 1.0 - lam * w[gi] / (L * max(nv, 1e-30)))
        b = v
    return b


def test_group_kkt_and_objective_tall():
    X, y, groups, _ = _problem()
    G = groups.max() + 1
    w = np.sqrt(np.bincount(groups))
    lam = 0.15
    res = group_lasso_path(X, y, groups, lambdas=np.array([lam]),
                           standardize=False, intercept=False,
                           eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(res.coef[0], np.float64)
    n = len(y)
    grad = X.T @ (y - X @ b) / n
    for g in range(G):
        m = groups == g
        bg = b[m]
        if np.linalg.norm(bg) > 1e-5:   # active: gradient aligns with bg
            np.testing.assert_allclose(
                grad[m], lam * w[g] * bg / np.linalg.norm(bg), atol=2e-4)
        else:                            # inactive: within the ball
            assert np.linalg.norm(grad[m]) <= lam * w[g] + 2e-4
    # objective no worse than the independent prox-gradient oracle
    b_or = _ista(X, y, groups, w, lam)
    assert (_objective(X, y, groups, w, lam, b)
            <= _objective(X, y, groups, w, lam, b_or) * 1.001)


def test_group_sparsity_structure():
    """Groups die together: within any group, coefficients are all zero
    or all (generically) nonzero."""
    X, y, groups, b_true = _problem()
    res = group_lasso_path(X, y, groups, nlambda=12, standardize=False,
                           intercept=False)
    coef = np.asarray(res.coef)
    for i in range(coef.shape[0]):
        for g in range(groups.max() + 1):
            cg = coef[i][groups == g]
            assert (np.all(np.abs(cg) < 1e-6)
                    or np.all(np.abs(cg) > 0)), (i, g)
    # the truly active groups are selected at moderate lambda
    mid = coef[6]
    active = {g for g in range(groups.max() + 1)
              if np.linalg.norm(mid[groups == g]) > 1e-3}
    assert {1, 4} <= active


def test_group_lasso_wide_regime():
    X, y, groups, _ = _problem(n=40, p=80, G=10, seed=3)
    w = np.sqrt(np.bincount(groups))
    lam = 0.1
    res = group_lasso_path(X, y, groups, lambdas=np.array([lam]),
                           standardize=False, intercept=False,
                           eps_abs=1e-7, eps_rel=1e-7)
    b = np.asarray(res.coef[0], np.float64)
    b_or = _ista(X, y, groups, w, lam)
    assert (_objective(X, y, groups, w, lam, b)
            <= _objective(X, y, groups, w, lam, b_or) * 1.005)


def test_group_lasso_first_lambda_zero():
    X, y, groups, _ = _problem()
    res = group_lasso_path(X, y, groups, nlambda=8, standardize=False,
                           intercept=False)
    np.testing.assert_allclose(np.asarray(res.coef[0]), 0.0, atol=1e-5)


def test_group_validation():
    X, y, groups, _ = _problem()
    with pytest.raises(ValueError, match="one entry per column"):
        group_lasso_path(X, y, groups[:-1])
    # arbitrary group labels are relabelled
    res = group_lasso_path(X, y, groups * 10 + 3, nlambda=4)
    assert np.isfinite(np.asarray(res.coef)).all()


def test_zero_weight_group_unpenalized():
    """w_g = 0 leaves the group unpenalized (glmnet convention) and the
    auto grid finite (previously lambda0 = max ||X_g'y||/0 = inf)."""
    X, y, groups, _ = _problem()
    w = np.sqrt(np.bincount(groups)).astype(float)
    w[0] = 0.0
    res = group_lasso_path(X, y, groups, weights=w, nlambda=6,
                           standardize=False, intercept=False)
    assert np.all(np.isfinite(np.asarray(res.lambdas)))
    assert np.all(np.isfinite(np.asarray(res.coef)))
    # the unpenalized group stays active even at the largest lambda
    first = np.asarray(res.coef[0])
    assert np.linalg.norm(first[groups == 0]) > 1e-6
    with pytest.raises(ValueError, match="nonnegative"):
        group_lasso_path(X, y, groups, weights=-w, nlambda=4)


def test_cv_group_lasso_honors_solver_options():
    from admm_tpu.models.cv import cv_group_lasso_path

    X, y, groups, _ = _problem(n=120, p=24)
    cv = cv_group_lasso_path(X, y, groups, nfolds=3, nlambda=5, maxit=1)
    assert np.asarray(cv.fit.niter).max() <= 1  # option actually reached


# ---------------------------------------------------------------------------
# Sparse-group lasso (extension: l1_ratio mixes a coordinate l1 term,
# Simon et al. 2013)
# ---------------------------------------------------------------------------

def test_sgl_limits_reduce_to_group_and_plain_lasso():
    from admm_tpu.models.lasso import lasso_path

    rng = np.random.default_rng(41)
    n, p = 200, 12
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [1.5, -1.0, 0.8, 0.5]
    y = X @ b + 0.3 * rng.normal(size=n)
    groups = np.arange(p) % 4
    lams = np.array([0.2, 0.05])
    g0 = group_lasso_path(X, y, groups, lambdas=lams, l1_ratio=0.0,
                          eps_abs=1e-7, eps_rel=1e-7)
    gref = group_lasso_path(X, y, groups, lambdas=lams,
                            eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(g0.coef), np.asarray(gref.coef),
                               atol=1e-7)
    g1 = group_lasso_path(X, y, groups, lambdas=lams, l1_ratio=1.0,
                          eps_abs=1e-7, eps_rel=1e-7)
    las = lasso_path(X, y, lambdas=lams, eps_abs=1e-7, eps_rel=1e-7)
    np.testing.assert_allclose(np.asarray(g1.coef), np.asarray(las.coef),
                               atol=2e-4)


def test_sgl_matches_proximal_gradient_oracle():
    """Intermediate l1_ratio pinned against an independent ISTA
    (proximal-gradient) solve of the same objective."""
    rng = np.random.default_rng(42)
    n, p = 120, 12
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[[0, 1, 4]] = [1.5, -0.8, 1.0]
    y = X @ b + 0.2 * rng.normal(size=n)
    groups = np.arange(p) % 3
    G = 3
    w = np.sqrt(np.bincount(groups, minlength=G)).astype(float)
    lam, a = 0.1, 0.5

    res = group_lasso_path(X, y, groups, lambdas=np.array([lam]),
                           l1_ratio=a, standardize=False,
                           intercept=False, eps_abs=1e-8, eps_rel=1e-8)

    # ISTA on min 1/(2n)||y-Xb||^2 + lam[a||b||_1 + (1-a) sum w_g||b_g||]
    L = np.linalg.eigvalsh(X.T @ X / n).max()
    t = 1.0 / L
    bk = np.zeros(p)
    for _ in range(20000):
        g = X.T @ (X @ bk - y) / n
        v = bk - t * g
        v = np.sign(v) * np.maximum(np.abs(v) - t * lam * a, 0.0)
        for gi in range(G):
            m = groups == gi
            nrm = np.linalg.norm(v[m])
            shrink = max(0.0, 1.0 - t * lam * (1 - a) * w[gi]
                         / max(nrm, 1e-30))
            v[m] *= shrink
        bk = v
    np.testing.assert_allclose(np.asarray(res.coef)[0], bk, atol=5e-5)


def test_sgl_within_group_sparsity():
    """The defining SGL feature: zeros INSIDE surviving groups."""
    rng = np.random.default_rng(43)
    n, p = 300, 12
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[0] = 2.0          # group 0: only member 0 active
    b[3] = 1.5          # group 1: only member 3 active
    y = X @ b + 0.2 * rng.normal(size=n)
    groups = np.repeat([0, 1, 2, 3], 3)
    res = group_lasso_path(X, y, groups, lambdas=np.array([0.12]),
                           l1_ratio=0.7, eps_abs=1e-7, eps_rel=1e-7)
    c = np.asarray(res.coef)[0]
    assert abs(c[0]) > 1.0 and abs(c[3]) > 0.7
    # Inactive members of the ACTIVE groups are exactly zero.
    assert c[1] == 0.0 and c[2] == 0.0
    assert c[4] == 0.0 and c[5] == 0.0


def test_sgl_consensus_matches_serial():
    from admm_tpu.parallel.consensus import parallel_group_lasso_path
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(44)
    n, p = 240, 12
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[[0, 4]] = [1.5, -1.0]
    y = X @ b + 0.3 * rng.normal(size=n)
    groups = np.arange(p) % 4
    lams = np.array([0.15, 0.05])
    par = parallel_group_lasso_path(X, y, groups, nworkers=8,
                                    mesh=make_mesh(8), lambdas=lams,
                                    l1_ratio=0.5, eps_abs=1e-6,
                                    eps_rel=1e-6)
    ser = group_lasso_path(X, y, groups, lambdas=lams, l1_ratio=0.5,
                           eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef), np.asarray(ser.coef),
                               atol=2e-3)
