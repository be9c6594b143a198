"""Graphical lasso (sparse inverse covariance): sklearn oracle, KKT
certificates, protocol agreement, weights, and one-pass CV."""
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.covariance import graphical_lasso as sk_glasso
from sklearn.datasets import make_sparse_spd_matrix

from admm_tpu.models.glasso import (cv_glasso_path, empirical_covariance,
                                    glasso_path)


def _problem(p=15, n=400, seed=0):
    rng = np.random.default_rng(seed)
    prec = make_sparse_spd_matrix(p, alpha=0.9, random_state=seed)
    cov = np.linalg.inv(prec)
    X = rng.multivariate_normal(np.zeros(p), cov, size=n)
    S = np.asarray(empirical_covariance(X, dtype=jnp.float64))
    return X, S


def _glasso_objective(Theta, S, lam):
    _, logdet = np.linalg.slogdet(Theta)
    off = Theta - np.diag(np.diag(Theta))
    return np.trace(S @ Theta) - logdet + lam * np.abs(off).sum()


def test_glasso_matches_sklearn():
    _, S = _problem()
    for alpha in (0.2, 0.05, 0.01):
        _, skp = sk_glasso(S, alpha=alpha, tol=1e-10, max_iter=2000)
        res = glasso_path(cov=S, lambdas=[alpha], eps_abs=1e-8,
                          eps_rel=1e-8, dtype=jnp.float64)
        ours = np.asarray(res.precision[0])
        gap = np.abs(ours - skp).max()
        if gap >= 5e-4:
            # sklearn's coordinate descent stalls on this problem
            # (ConvergenceWarning, dual gap ~2e-4 at alpha=0.2); when
            # the iterates disagree beyond its floor, the tie-break is
            # the primal objective — ours must be at least as good.
            assert (_glasso_objective(ours, S, alpha)
                    <= _glasso_objective(skp, S, alpha) + 1e-9), (alpha,
                                                                  gap)


def test_empty_graph_at_lambda_max():
    _, S = _problem()
    lam0 = np.abs(S - np.diag(np.diag(S))).max()
    res = glasso_path(cov=S, lambdas=[lam0 * 1.0001])
    P = np.asarray(res.precision[0])
    off = P - np.diag(np.diag(P))
    assert np.all(off == 0.0)
    # Diagonal solution is exactly 1/S_ii when the diagonal is
    # unpenalized.
    assert np.abs(np.diag(P) - 1.0 / np.diag(S)).max() < 1e-4
    # The auto grid tops exactly there: first path point is empty too.
    auto = glasso_path(cov=S, nlambda=5)
    P0 = np.asarray(auto.precision[0])
    assert np.all(P0 - np.diag(np.diag(P0)) == 0.0)


def test_batch_scan_agree():
    _, S = _problem()
    rb = glasso_path(cov=S, nlambda=8)
    rs = glasso_path(cov=S, nlambda=8, path_mode="scan")
    gap = np.abs(np.asarray(rb.precision) - np.asarray(rs.precision)).max()
    assert gap < 5e-3, gap
    assert np.asarray(rb.lambdas) == pytest.approx(np.asarray(rs.lambdas))


def test_newton_eigh_xupdates_agree():
    """The Newton-Schulz logdet prox must reproduce the eigh form —
    as a raw prox across the rho ladder's whole range in BOTH dtypes,
    and through the full f32 path (the shipping configuration)."""
    from admm_tpu.models.glasso import (_logdet_prox_eigh,
                                        _logdet_prox_newton)

    rng = np.random.default_rng(3)
    p = 40
    B = rng.normal(size=(p, p))
    G = jnp.asarray(0.5 * (B + B.T))
    for rho in (0.05, 1.0, 64.0):
        for dt, tol in ((jnp.float32, 5e-5), (jnp.float64, 1e-11)):
            Gd = jnp.asarray(G, dt)
            a = np.asarray(_logdet_prox_newton(Gd, rho))
            b = np.asarray(_logdet_prox_eigh(Gd, rho))
            rel = np.linalg.norm(a - b) / np.linalg.norm(b)
            assert rel < tol, (rho, dt, rel)
            # the prox output must satisfy rho*Theta - Theta^{-1} = G
            kkt = rho * a - np.linalg.inv(np.asarray(a, np.float64))
            assert np.abs(kkt - np.asarray(Gd, np.float64)).max() < (
                1e-3 if dt == jnp.float32 else 1e-9)

    _, S = _problem()
    rn = glasso_path(cov=S.astype(np.float32), nlambda=8)
    re = glasso_path(cov=S.astype(np.float32), nlambda=8,
                     xupdate="eigh")
    gap = np.abs(np.asarray(rn.precision) - np.asarray(re.precision))
    assert gap.max() < 5e-3, gap.max()
    # solver effort is the same algorithm: iteration totals track
    assert abs(int(rn.niter.sum()) - int(re.niter.sum())) <= int(
        0.1 * int(re.niter.sum())) + 8


def test_kkt_certificate():
    """At the optimum: S - Theta^{-1} + lam * G = 0 with G in the
    subdifferential of the masked l1 norm — |S_ij - W_ij| <= lam on
    zero off-diagonals, = -lam*sign on the nonzeros, = 0 on the
    (unpenalized) diagonal."""
    _, S = _problem()
    lam = 0.05
    res = glasso_path(cov=S, lambdas=[lam], eps_abs=1e-9, eps_rel=1e-9,
                      dtype=jnp.float64)
    Z = np.asarray(res.precision[0])
    W = np.linalg.inv(Z)
    R = S - W  # should equal -lam * subgradient on off-diagonals
    p = S.shape[0]
    off = ~np.eye(p, dtype=bool)
    nz = (Z != 0) & off
    zero = (Z == 0) & off
    tol = 5e-5
    assert np.abs(R[nz] + lam * np.sign(Z[nz])).max() < tol
    if zero.any():
        assert np.abs(R[zero]).max() <= lam + tol
    assert np.abs(np.diag(R)).max() < tol


def test_penalize_diagonal_kkt():
    _, S = _problem()
    lam = 0.05
    res = glasso_path(cov=S, lambdas=[lam], penalize_diagonal=True,
                      eps_abs=1e-9, eps_rel=1e-9, dtype=jnp.float64)
    Z = np.asarray(res.precision[0])
    W = np.linalg.inv(Z)
    # Diagonal of a PD precision is positive, so its subgradient is +1:
    # S_ii - W_ii + lam = 0.
    assert np.abs(np.diag(S) - np.diag(W) + lam).max() < 5e-5
    # And the penalized diagonal shrinks the precision vs unpenalized.
    res0 = glasso_path(cov=S, lambdas=[lam], eps_abs=1e-9, eps_rel=1e-9,
                       dtype=jnp.float64)
    assert np.diag(Z).sum() < np.diag(np.asarray(res0.precision[0])).sum()


def test_weights_match_row_duplication():
    X, _ = _problem(p=8, n=60)
    w = np.ones(X.shape[0])
    w[:5] = 3.0
    Xdup = np.concatenate([X] + [X[:5]] * 2, axis=0)
    rw = glasso_path(X, weights=w, nlambda=4, dtype=jnp.float64,
                     eps_abs=1e-8, eps_rel=1e-8)
    rd = glasso_path(Xdup, nlambda=4, dtype=jnp.float64,
                     eps_abs=1e-8, eps_rel=1e-8)
    # Identical weighted covariance => identical path (same grid too).
    assert np.asarray(rw.cov) == pytest.approx(np.asarray(rd.cov),
                                               abs=1e-12)
    assert np.abs(np.asarray(rw.precision)
                  - np.asarray(rd.precision)).max() < 1e-6


def test_trace_mode():
    _, S = _problem(p=8)
    res = glasso_path(cov=S, nlambda=3, trace_len=50)
    assert res.trace.shape == (3, 50, 5)
    tr = np.asarray(res.trace)
    # Recorded rows match niter; residuals decrease to tolerance.
    for i, ni in enumerate(np.asarray(res.niter)):
        rows = tr[i, ~np.isnan(tr[i, :, 0])]
        assert rows.shape[0] == min(int(ni), 50)
        assert rows[-1, 1] <= rows[-1, 0]  # r_pri <= eps_pri at exit


def test_validation_errors():
    X, S = _problem(p=6, n=30)
    with pytest.raises(ValueError, match="exactly one"):
        glasso_path(X, cov=S)
    with pytest.raises(ValueError, match="exactly one"):
        glasso_path()
    with pytest.raises(ValueError, match="square"):
        glasso_path(cov=np.ones((3, 4)))
    with pytest.raises(ValueError, match="weights"):
        glasso_path(cov=S, weights=np.ones(30))
    with pytest.raises(ValueError, match="path_mode"):
        glasso_path(cov=S, path_mode="nope")


def test_cv_onepass_matches_manual_fold_loop():
    X, _ = _problem(p=10, n=120, seed=3)
    res = cv_glasso_path(X, nfolds=4, nlambda=6, seed=7,
                         dtype=jnp.float64, eps_abs=1e-8, eps_rel=1e-8)
    lams = res.lambdas
    n = X.shape[0]
    cvraw = np.zeros((n, lams.size))
    for f in range(4):
        tr = res.foldid != f
        va = ~tr
        mu = X[tr].mean(axis=0)
        Xc_tr = X[tr] - mu
        S_tr = Xc_tr.T @ Xc_tr / tr.sum()
        fit = glasso_path(cov=S_tr, lambdas=lams, dtype=jnp.float64,
                          eps_abs=1e-8, eps_rel=1e-8)
        prec = np.asarray(fit.precision)
        Xc_va = X[va] - mu
        quad = np.einsum("np,lpq,nq->nl", Xc_va, prec, Xc_va)
        _, logdet = np.linalg.slogdet(prec)
        cvraw[va] = quad - logdet[None, :]
    cvm = cvraw.mean(axis=0)
    assert res.cvm == pytest.approx(cvm, rel=1e-5, abs=1e-6)
    assert res.lambda_1se >= res.lambda_min
    # The CV curve is finite and the selected model is nontrivial.
    assert np.all(np.isfinite(res.cvm))


def test_cv_recovers_support_signal():
    """On a well-separated sparse problem the CV-selected precision
    keeps the true edges (a sanity check that scoring points the right
    way: larger lambda must eventually score worse once true edges are
    killed)."""
    X, _ = _problem(p=12, n=800, seed=5)
    res = cv_glasso_path(X, nfolds=5, nlambda=10, seed=1)
    # cvm at the empty-graph end exceeds the minimum.
    assert res.cvm[0] > res.cvm.min()


def test_data_mesh_and_fold_mesh_match_single_device():
    """Row-sharded covariance build (data_mesh) and fold-sharded CV
    (fold_mesh) agree with the single-device programs on the 8-virtual-
    device mesh."""
    from admm_tpu.parallel.mesh import make_mesh

    X, _ = _problem(p=8, n=160, seed=9)
    mesh = make_mesh(8)
    rep = glasso_path(X, nlambda=5)
    shd = glasso_path(X, nlambda=5, data_mesh=mesh)
    # f32 tolerance, not equality: the sharded covariance build reduces
    # in a different order.
    assert np.abs(np.asarray(rep.precision)
                  - np.asarray(shd.precision)).max() < 1e-4

    # The fold axis shards over the mesh: nfolds must be divisible by
    # the device count (as in tests/test_cv.py).
    cv0 = cv_glasso_path(X, nfolds=8, nlambda=5, seed=2)
    cv1 = cv_glasso_path(X, nfolds=8, nlambda=5, seed=2,
                         fold_mesh=mesh)
    assert cv0.cvm == pytest.approx(cv1.cvm, rel=1e-5, abs=1e-7)
    assert cv0.lambda_min == cv1.lambda_min


def test_cv_excludes_negative_foldid_and_diagonal_guard():
    """Review fixes: foldid = -1 rows are excluded from scoring (not
    wrapped to the last fold's logdet), degenerate foldid raises, and
    a diagonal covariance gets a finite fallback grid instead of NaN."""
    X, _ = _problem(p=6, n=90, seed=11)
    foldid = np.tile(np.arange(3), 30)
    foldid[:12] = -1
    res = cv_glasso_path(X, foldid=foldid, nlambda=4, dtype=jnp.float64,
                         eps_abs=1e-8, eps_rel=1e-8)
    lams = res.lambdas
    cvraw = []
    for f in range(3):
        tr = foldid != f
        va = foldid == f
        mu = X[tr].mean(axis=0)
        S_tr = (X[tr] - mu).T @ (X[tr] - mu) / tr.sum()
        fit = glasso_path(cov=S_tr, lambdas=lams, dtype=jnp.float64,
                          eps_abs=1e-8, eps_rel=1e-8)
        prec = np.asarray(fit.precision)
        Xc = X[va] - mu
        quad = np.einsum("np,lpq,nq->nl", Xc, prec, Xc)
        _, logdet = np.linalg.slogdet(prec)
        cvraw.append(quad - logdet[None, :])
    cvm = np.concatenate(cvraw).mean(axis=0)
    assert res.cvm == pytest.approx(cvm, rel=1e-5, abs=1e-6)
    with pytest.raises(ValueError, match="at least one row"):
        cv_glasso_path(X, foldid=np.zeros(90, int))
    # Diagonal covariance: finite grid, diagonal solution.
    r = glasso_path(cov=np.diag([2.0, 1.0, 0.5]), nlambda=3)
    assert np.all(np.isfinite(np.asarray(r.lambdas)))
    assert np.all(np.isfinite(np.asarray(r.precision)))


def test_partial_correlations():
    from admm_tpu.models.glasso import partial_correlations

    _, S = _problem(p=8)
    res = glasso_path(cov=S, nlambda=3, dtype=jnp.float64)
    P = np.asarray(partial_correlations(res.precision))
    assert P.shape == (3, 8, 8)
    assert np.abs(np.diagonal(P, axis1=1, axis2=2) - 1.0).max() < 1e-12
    assert np.abs(P - np.transpose(P, (0, 2, 1))).max() < 1e-10
    assert np.abs(P).max() <= 1.0 + 1e-8
    # Zero precision entries give zero partial correlations.
    T = np.asarray(res.precision[0])
    assert np.all(P[0][T == 0] == 0)
