"""Robust PCA (principal component pursuit): exact-recovery oracle,
objective optimality, and structural properties."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.models.rpca import rpca, svt


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
