"""Robust PCA (principal component pursuit): exact-recovery oracle,
objective optimality, structural properties, the masked / partial-SVT
variants, the lambda path and the entry-holdout CV."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.models.rpca import (cv_rpca, rpca, rpca_path, svt,
                                  svt_partial)


def _planted(m=60, n=50, r=3, frac=0.08, seed=0, amp=10.0):
    rng = np.random.default_rng(seed)
    L0 = rng.normal(size=(m, r)) @ rng.normal(size=(r, n)) / np.sqrt(r)
    S0 = np.zeros((m, n))
    idx = rng.uniform(size=(m, n)) < frac
    S0[idx] = amp * rng.choice([-1.0, 1.0], size=idx.sum())
    return L0, S0, L0 + S0


def test_exact_recovery():
    """Candes et al.: incoherent low-rank + sparse separates EXACTLY at
    the universal lambda — recovery error is the oracle."""
    L0, S0, M = _planted()
    res = rpca(M, dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    L = np.asarray(res.low_rank)
    S = np.asarray(res.sparse)
    assert np.abs(L - L0).max() / np.abs(L0).max() < 1e-5
    assert np.abs(S - S0).max() / np.abs(S0).max() < 1e-5
    # Structural: recovered rank and support match the plant.
    svals = np.linalg.svd(L, compute_uv=False)
    assert (svals > 1e-6 * svals[0]).sum() == 3
    assert set(zip(*np.nonzero(np.asarray(S)))) == set(
        zip(*np.nonzero(S0)))


def test_objective_beats_truth_or_matches():
    """The solver's objective must be <= the planted pair's (the plant
    is feasible, so any optimum is at least as good)."""
    L0, S0, M = _planted(seed=1)
    lam = 1.0 / np.sqrt(60)
    res = rpca(M, lam=lam, dtype=jnp.float64, eps_abs=1e-9,
               eps_rel=1e-9)

    def obj(L, S):
        return (np.linalg.svd(L, compute_uv=False).sum()
                + lam * np.abs(S).sum())

    L, S = np.asarray(res.low_rank), np.asarray(res.sparse)
    # Project to exact feasibility before comparing objectives.
    gap = M - L - S
    assert np.abs(gap).max() < 1e-7
    assert obj(L, S) <= obj(L0, S0) + 1e-6


def test_svt_is_nuclear_prox():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(8, 6))
    tau = 0.7
    Z = np.asarray(svt(jnp.asarray(A), tau))
    # Prox optimality: A - Z in tau * subdifferential of ||Z||_*
    U, s, Vt = np.linalg.svd(Z, full_matrices=False)
    pos = s > 1e-12
    G = (A - Z) / tau
    # On the row/col space: G == U V' restricted to positive svals.
    assert np.abs(U[:, pos].T @ G @ Vt[pos].T
                  - np.eye(pos.sum())).max() < 1e-10
    # Spectral norm bound <= 1.
    assert np.linalg.svd(G, compute_uv=False)[0] <= 1.0 + 1e-10


def test_zero_sparse_when_clean():
    """A clean low-rank M separates into (M, 0)."""
    rng = np.random.default_rng(3)
    L0 = rng.normal(size=(40, 4)) @ rng.normal(size=(4, 30))
    res = rpca(L0, dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(res.sparse)).max() < 1e-6
    assert np.abs(np.asarray(res.low_rank) - L0).max() < 1e-5


def test_trace_and_validation():
    _, _, M = _planted(m=20, n=15, seed=4)
    res = rpca(M, trace_len=30, maxit=200)
    assert res.trace.shape == (30, 5)
    with pytest.raises(ValueError, match="2-D"):
        rpca(np.ones(5))


def test_partial_svt_matches_exact_svt():
    """The subspace-iteration SVT equals the exact SVT whenever the
    basis upper-bounds the post-threshold rank (here: planted rank 3,
    generous threshold)."""
    rng = np.random.default_rng(6)
    A = (rng.normal(size=(40, 4)) @ rng.normal(size=(4, 30))
         + 1e-3 * rng.normal(size=(40, 30)))
    tau = 0.5
    exact = np.asarray(svt(jnp.asarray(A), tau))
    V0 = np.linalg.qr(rng.normal(size=(30, 10)))[0]
    part, Vn = svt_partial(jnp.asarray(A), tau, jnp.asarray(V0),
                           power_iters=4)
    assert np.abs(np.asarray(part) - exact).max() < 1e-6
    assert Vn.shape == (30, 10)


def test_partial_rank_solver_matches_exact():
    """rpca(rank=r) recovers the same planted decomposition as the
    exact-SVD solver."""
    L0, S0, M = _planted(seed=7)
    res = rpca(M, rank=3, dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(res.low_rank) - L0).max() \
        / np.abs(L0).max() < 1e-5
    assert np.abs(np.asarray(res.sparse) - S0).max() \
        / np.abs(S0).max() < 1e-5


def test_masked_rpca_recovers_offmask():
    """PCP with missing entries (paper sec. 1.6): fit on 75% of the
    entries, the low-rank part extends EXACTLY to the unobserved 25%
    (sparse is zero off-mask by construction)."""
    L0, S0, M = _planted(m=80, n=60, r=2, frac=0.05, seed=8)
    rng = np.random.default_rng(9)
    obs = rng.uniform(size=M.shape) < 0.75
    res = rpca(M, observed=obs, dtype=jnp.float64, eps_abs=1e-9,
               eps_rel=1e-9, maxit=20000)
    L = np.asarray(res.low_rank)
    assert np.abs(L - L0).max() / np.abs(L0).max() < 1e-4
    assert np.abs(np.asarray(res.sparse)[~obs]).max() == 0.0
    # Full-mask masked solve == the plain solver (same program).
    r_full = rpca(M, observed=np.ones_like(obs), dtype=jnp.float64,
                  eps_abs=1e-9, eps_rel=1e-9)
    r_plain = rpca(M, dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(r_full.low_rank)
                  - np.asarray(r_plain.low_rank)).max() < 1e-7


def test_rpca_path_warm_scan_matches_single_solves():
    """The warm-started lambda scan equals independent single solves,
    and sparsity decreases along increasing lambda."""
    L0, S0, M = _planted(seed=10)
    path = rpca_path(M, nlambda=4, dtype=jnp.float64, eps_abs=1e-9,
                     eps_rel=1e-9)
    assert np.all(np.diff(np.asarray(path.lambdas)) < 0)
    nnz = np.asarray(path.nnz)
    assert nnz[0] <= nnz[-1]          # larger lam -> sparser S
    for i in (0, 2):
        single = rpca(M, lam=float(path.lambdas[i]), dtype=jnp.float64,
                      eps_abs=1e-9, eps_rel=1e-9)
        assert np.abs(np.asarray(path.low_rank[i])
                      - np.asarray(single.low_rank)).max() < 1e-6
    # Rank accessor matches numpy's.
    for i in range(4):
        np_rank = np.linalg.matrix_rank(np.asarray(path.low_rank[i]))
        assert int(path.rank[i]) == np_rank


def test_cv_rpca_selects_near_universal_lambda():
    """On planted data the CV curve is finite and the selected lambda
    sits within the grid; held-out low-rank error at lambda_min beats
    the grid's worst point."""
    L0, S0, M = _planted(m=70, n=60, r=2, frac=0.06, seed=11)
    cv = cv_rpca(M, nlambda=5, nfolds=4, seed=3, dtype=jnp.float64,
                 eps_abs=1e-8, eps_rel=1e-7)
    assert np.all(np.isfinite(cv.cvm)) and np.all(np.isfinite(cv.cvsd))
    assert cv.lambda_min in set(np.asarray(cv.lambdas).tolist())
    assert cv.lambda_1se >= cv.lambda_min
    assert cv.cvm.min() < cv.cvm.max()
    # foldid covers exactly the observed entries.
    assert (cv.foldid >= 0).all()
    assert cv.fit.low_rank.shape == (5, 70, 60)
    with pytest.raises(ValueError, match="score"):
        cv_rpca(M, score="nope")
    # mse scoring runs too.
    cv2 = cv_rpca(M, nlambda=3, nfolds=3, score="mse",
                  dtype=jnp.float64, eps_abs=1e-7, eps_rel=1e-6)
    assert np.all(np.isfinite(cv2.cvm))


def test_matrix_completion_trace():
    from admm_tpu.models.rpca import matrix_complete

    rng = np.random.default_rng(12)
    L0 = rng.normal(size=(30, 3)) @ rng.normal(size=(3, 25))
    mask = rng.uniform(size=(30, 25)) < 0.6
    L, niter, buf = matrix_complete(np.where(mask, L0, 0.0), mask,
                                    trace_len=20, maxit=100)
    assert buf.shape == (20, 5)
    assert np.isfinite(np.asarray(buf)[0]).all()


def test_matrix_completion_exact():
    """Nuclear-norm completion recovers a planted incoherent low-rank
    matrix exactly at sufficient sampling (Candes & Recht)."""
    from admm_tpu.models.rpca import matrix_complete

    rng = np.random.default_rng(5)
    m, n, r = 60, 50, 2
    L0 = rng.normal(size=(m, r)) @ rng.normal(size=(r, n))
    mask = rng.uniform(size=(m, n)) < 0.5
    M = np.where(mask, L0, 0.0)
    L, niter = matrix_complete(M, mask, dtype=jnp.float64,
                               eps_abs=1e-10, eps_rel=1e-9)
    L = np.asarray(L)
    assert np.abs(L - L0).max() / np.abs(L0).max() < 1e-5
    # Observed entries are honored exactly at convergence.
    assert np.abs((L - L0)[mask]).max() < 1e-6
    with pytest.raises(ValueError, match="shape"):
        matrix_complete(M, mask[:, :10])


def test_rank_saturated_flag():
    """The partial-SVT exactness certificate: an adequate rank hint
    reports False; a rank hint whose whole basis survives thresholding
    (forced by running at a huge lambda where L ~ M is near full rank)
    reports True.  Exact solves carry None."""
    L0, S0, M = _planted(seed=13)
    ok = rpca(M, rank=3, dtype=jnp.float64, eps_abs=1e-8, eps_rel=1e-8)
    assert ok.rank_saturated is not None and not bool(ok.rank_saturated)
    # lam >> lam*: S empties and the optimal L approaches the
    # (full-rank) data matrix — a rank-1 basis must saturate.
    bad = rpca(M, rank=1, lam=5.0, dtype=jnp.float64, maxit=2000)
    assert bool(bad.rank_saturated)
    exact = rpca(M, dtype=jnp.float64, maxit=500)
    assert exact.rank_saturated is None
