"""SLOPE (sorted-l1): isotonic/prox oracles, independent ISTA solver
agreement, lasso reduction, both regimes, and the null threshold."""
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.isotonic import isotonic_regression

from admm_tpu.models.lasso import lasso_path
from admm_tpu.models.slope import (bh_sequence, isotonic_nonincreasing,
                                   isotonic_nonincreasing_pava,
                                   prox_sorted_l1, slope_path)


def _prox_np(v, lam):
    """Independent numpy sorted-l1 prox (sklearn isotonic PAVA)."""
    s = np.sign(v)
    a = np.abs(v)
    o = np.argsort(-a)
    w = np.maximum(isotonic_regression(a[o] - lam, increasing=False), 0)
    out = np.zeros_like(v)
    out[o] = w
    return s * out


def test_isotonic_matches_sklearn_pava():
    rng = np.random.default_rng(0)
    for size in (1, 2, 7, 37, 128):
        z = rng.normal(size=size) * rng.choice([0.1, 1, 10])
        ours = np.asarray(isotonic_nonincreasing(jnp.asarray(z)))
        skl = isotonic_regression(z, increasing=False)
        assert np.abs(ours - skl).max() < 1e-9


def test_isotonic_pava_matches_sklearn():
    """The O(p)-memory parallel-pass PAVA against sklearn, including
    the adversarial shapes: ties, sorted, reverse-sorted (one giant
    pool), constant, and the cascade pattern that forces many merge
    passes."""
    rng = np.random.default_rng(3)
    cases = [rng.normal(size=s) for s in (1, 2, 7, 64, 513)]
    cases += [np.sort(rng.normal(size=50)),            # fully violating
              -np.sort(rng.normal(size=50)),           # already feasible
              np.ones(20),                             # constant
              np.repeat(rng.normal(size=8), 5),        # ties
              np.array([1.0, 2.0, 1.5, 1.8, 1.6, 1.7, 1.65])]  # cascade
    for z in cases:
        ours = np.asarray(isotonic_nonincreasing_pava(jnp.asarray(z)))
        skl = isotonic_regression(z, increasing=False)
        assert np.abs(ours - skl).max() < 1e-9


def test_prox_methods_agree():
    """dense minimax and parallel PAVA give the same prox; 'auto'
    dispatches on p without changing values."""
    rng = np.random.default_rng(4)
    v = rng.normal(size=300) * 2
    lam = np.sort(rng.uniform(0.05, 1.0, size=300))[::-1]
    vj, lj = jnp.asarray(v), jnp.asarray(lam)
    d = np.asarray(prox_sorted_l1(vj, lj, method="dense"))
    p_ = np.asarray(prox_sorted_l1(vj, lj, method="pava"))
    a = np.asarray(prox_sorted_l1(vj, lj))
    assert np.abs(d - p_).max() < 1e-9
    assert np.abs(d - _prox_np(v, lam)).max() < 1e-9
    assert np.abs(a - d).max() == 0.0


def test_prox_matches_independent_pava_prox():
    rng = np.random.default_rng(1)
    for _ in range(5):
        v = rng.normal(size=25) * 3
        lam = np.sort(rng.uniform(0.1, 1.0, size=25))[::-1]
        ours = np.asarray(prox_sorted_l1(jnp.asarray(v),
                                         jnp.asarray(lam)))
        assert np.abs(ours - _prox_np(v, lam)).max() < 1e-9
    # Constant sequence == plain soft threshold.
    v = rng.normal(size=20)
    px = np.asarray(prox_sorted_l1(jnp.asarray(v),
                                   0.3 * jnp.ones(20)))
    st = np.sign(v) * np.maximum(np.abs(v) - 0.3, 0)
    assert np.abs(px - st).max() < 1e-12


def _problem(n=200, p=30, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:5] = [2, -1.5, 1, 0.5, -0.5]
    y = X @ b + 0.5 * rng.normal(size=n)
    return X, y


def test_constant_sequence_reduces_to_lasso():
    X, y = _problem()
    lams = [0.3, 0.1, 0.03]
    rs = slope_path(X, y, lam_seq=np.ones(30), lambdas=lams,
                    dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    rl = lasso_path(X, y, lambdas=lams, dtype=jnp.float64,
                    eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(rs.coef) - np.asarray(rl.coef)).max() < 1e-6
    assert np.abs(np.asarray(rs.beta0) - np.asarray(rl.beta0)).max() < 1e-6


def test_matches_independent_ista_solver():
    """Full-solver oracle: an independent numpy proximal-gradient
    SLOPE (sklearn-PAVA prox) at fixed scale t."""
    X, y = _problem()
    p = X.shape[1]
    lamseq = bh_sequence(p, 0.1)
    t = 0.05

    L = np.linalg.eigvalsh(X.T @ X / X.shape[0]).max()
    b = np.zeros(p)
    for _ in range(20000):
        g = X.T @ (X @ b - y) / X.shape[0]
        b = _prox_np(b - g / L, t * lamseq / L)

    rs = slope_path(X, y, lam_seq=lamseq, lambdas=[t],
                    standardize=False, intercept=False,
                    dtype=jnp.float64, eps_abs=1e-10, eps_rel=1e-10)
    assert np.abs(np.asarray(rs.coef[0]) - b).max() < 1e-7


def test_auto_grid_and_regimes():
    X, y = _problem()
    res = slope_path(X, y, nlambda=6, dtype=jnp.float64)
    nnz = [(np.asarray(c) != 0).sum() for c in res.coef]
    assert nnz[0] == 0          # exact null threshold at the grid top
    assert nnz[-1] > nnz[0]     # support grows down the path
    # batch == scan, both regimes.
    rb = slope_path(X, y, nlambda=5, dtype=jnp.float64)
    rsc = slope_path(X, y, nlambda=5, path_mode="scan",
                     dtype=jnp.float64)
    assert np.abs(np.asarray(rb.coef) - np.asarray(rsc.coef)).max() < 1e-4
    rng = np.random.default_rng(3)
    Xw = rng.normal(size=(40, 80))
    yw = Xw[:, :3] @ np.array([2.0, -1.0, 1.0]) + 0.1 * rng.normal(
        size=40)
    rw = slope_path(Xw, yw, nlambda=5, dtype=jnp.float64)
    rws = slope_path(Xw, yw, nlambda=5, path_mode="scan",
                     dtype=jnp.float64)
    assert np.abs(np.asarray(rw.coef) - np.asarray(rws.coef)).max() < 1e-3
    assert (np.asarray(rw.coef[0]) == 0).all()


def test_weights_match_row_duplication():
    X, y = _problem(n=80, p=10, seed=4)
    w = np.ones(80)
    w[:6] = 2.0
    Xd = np.concatenate([X, X[:6]], axis=0)
    yd = np.concatenate([y, y[:6]])
    lamseq = bh_sequence(10, 0.1)
    rw = slope_path(X, y, lam_seq=lamseq, lambdas=[0.2, 0.05],
                    weights=w, dtype=jnp.float64, eps_abs=1e-9,
                    eps_rel=1e-9)
    rd = slope_path(Xd, yd, lam_seq=lamseq, lambdas=[0.2, 0.05],
                    dtype=jnp.float64, eps_abs=1e-9, eps_rel=1e-9)
    assert np.abs(np.asarray(rw.coef) - np.asarray(rd.coef)).max() < 1e-6


def test_validation():
    X, y = _problem(n=40, p=6)
    with pytest.raises(ValueError, match="nonincreasing"):
        slope_path(X, y, lam_seq=[1, 2, 3, 4, 5, 6])
    with pytest.raises(ValueError, match="one entry"):
        slope_path(X, y, lam_seq=np.ones(5))
    with pytest.raises(ValueError, match="positive"):
        slope_path(X, y, lam_seq=np.zeros(6))
    with pytest.raises(ValueError, match="path_mode"):
        slope_path(X, y, path_mode="nope")


def test_cv_slope_onepass_matches_loop():
    from admm_tpu.models.cv import cv_slope_path

    X, y = _problem(n=120, p=12, seed=6)
    kw = dict(nfolds=4, nlambda=6, seed=5, eps_abs=1e-7, eps_rel=1e-7)
    one = cv_slope_path(X, y, cv_mode="onepass", **kw)
    loop = cv_slope_path(X, y, cv_mode="loop", **kw)
    assert one.cvm == pytest.approx(loop.cvm, rel=1e-4, abs=1e-7)
    assert one.lambda_min == loop.lambda_min
    # Weighted CV runs (one-pass only, as for the gaussian driver).
    w = np.ones(120); w[:10] = 2.0
    cw = cv_slope_path(X, y, weights=w, **kw)
    assert np.all(np.isfinite(cw.cvm))


def test_parallel_slope_matches_serial():
    """Consensus SLOPE (master sorted-l1 prox on the generic consensus
    engine) agrees with the serial solver on the 8-device mesh."""
    from admm_tpu.parallel.consensus import parallel_slope_path

    X, y = _problem(n=160, p=12, seed=8)
    lamseq = bh_sequence(12, 0.1)
    ts = np.array([0.2, 0.08])
    par = parallel_slope_path(X, y, lam_seq=lamseq, lambdas=ts,
                              nworkers=8, eps_abs=1e-7, eps_rel=1e-7)
    ser = slope_path(X, y, lam_seq=lamseq, lambdas=ts, eps_abs=1e-7,
                     eps_rel=1e-7)
    gap = np.abs(np.asarray(par.coef) - np.asarray(ser.coef)).max()
    assert gap < 2e-3, gap
    # Auto grid: the consensus driver's slope-aware lambda0 nulls the
    # top of the path.
    auto = parallel_slope_path(X, y, lam_seq=lamseq, nworkers=4,
                               nlambda=4)
    assert np.abs(np.asarray(auto.coef[0])).max() < 1e-4
