"""Pallas kernel tests (interpret mode on the CPU backend)."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.data.standardize import standardize
from admm_tpu.linalg import dot, gram, ridge_inverse, spectral_radius_sym
from admm_tpu.models.lasso import _solve_path_tall, _solve_path_tall_batch
from admm_tpu.ops.tall_path import (supports, supports_scan,
                                    tall_path_batch_pallas,
                                    tall_path_scan_pallas)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n, p, k = 200, 40, 10
    X = rng.normal(size=(n, p))
    b = rng.uniform(size=p) * (rng.uniform(size=p) < 0.4)
    y = 1.0 + X @ b + 0.3 * rng.normal(size=n)
    Xs, ys, _ = standardize(jnp.asarray(X, jnp.float32),
                            jnp.asarray(y, jnp.float32),
                            standardize_x=True, intercept=True)
    lam0 = float(jnp.max(jnp.abs(dot(Xs.T, ys))))
    ilams = jnp.asarray(np.geomspace(lam0, lam0 * 1e-3, k), jnp.float32)
    return Xs, ys, ilams, p, k


def _pallas_solve(Xs, ys, ilams, p, alpha=1.0):
    XtX = gram(Xs)
    Xty = dot(Xs.T, ys)
    sprad = spectral_radius_sym(XtX)
    rho = jnp.cbrt(sprad) * ilams[0] ** (2.0 / 3.0)
    Minv = ridge_inverse(XtX, rho)
    return tall_path_batch_pallas(Minv, Xty, ilams, rho, 1e-5, 1e-5,
                                  alpha, 2000, true_p=p, interpret=True)


def test_supports_budget():
    assert supports(1000, 100)
    # Past the one-shot ceiling the kernel gates OFF — a tiled
    # column-block variant was built and MEASURED SLOWER than the XLA
    # fallback at p = 2.5k/4k (batch mode is compute-bound there;
    # benchmarks/tall_ceiling*.json, DESIGN.md "the tall-kernel
    # ceiling"), so the gate is a measured crossover, not a guess.
    assert not supports(4000, 100)


def test_kernel_matches_xla_batch_solver(problem):
    Xs, ys, ilams, p, k = problem
    coefs_x, niter_x, _ = _solve_path_tall_batch(Xs, ys, ilams, -1.0, 2000,
                                              1e-5, 1e-5, 1.0)
    coefs_p, niter_p = _pallas_solve(Xs, ys, ilams, p)
    np.testing.assert_allclose(np.asarray(coefs_p), np.asarray(coefs_x),
                               atol=1e-5)
    # Matvec accumulation order differs between the kernel (row-vector
    # form) and the vmapped XLA solver; near the convergence boundary a
    # lane can shift by one iteration.
    assert np.max(np.abs(np.asarray(niter_p) - np.asarray(niter_x))) <= 1


def test_kernel_enet_alpha(problem):
    Xs, ys, ilams, p, k = problem
    coefs_x, niter_x, _ = _solve_path_tall_batch(Xs, ys, ilams, -1.0, 2000,
                                              1e-5, 1e-5, 0.6)
    coefs_p, niter_p = _pallas_solve(Xs, ys, ilams, p, alpha=0.6)
    np.testing.assert_allclose(np.asarray(coefs_p), np.asarray(coefs_x),
                               atol=1e-5)
    assert np.max(np.abs(np.asarray(niter_p) - np.asarray(niter_x))) <= 1


def _pallas_scan_solve(Xs, ys, ilams, p, alpha=1.0):
    XtX = gram(Xs)
    Xty = dot(Xs.T, ys)
    sprad = spectral_radius_sym(XtX)
    rho = jnp.cbrt(sprad) * ilams[0] ** (2.0 / 3.0)
    Minv = ridge_inverse(XtX, rho)
    return tall_path_scan_pallas(Minv, Xty, ilams, rho, 1e-5, 1e-5,
                                 alpha, 2000, true_p=p, interpret=True)


def test_scan_kernel_matches_xla_scan_solver(problem):
    """The warm-started sequential kernel must reproduce the XLA
    scan-over-while_loop solver exactly (same math, same warm starts)."""
    Xs, ys, ilams, p, k = problem
    coefs_x, niter_x, _ = _solve_path_tall(Xs, ys, ilams, -1.0, 2000,
                                        1e-5, 1e-5, 1.0)
    coefs_p, niter_p = _pallas_scan_solve(Xs, ys, ilams, p)
    np.testing.assert_allclose(np.asarray(coefs_p), np.asarray(coefs_x),
                               atol=1e-5)
    # The kernel's row-vector matvec accumulates in a different order
    # than XLA's column matvec; a one-iteration shift at one lambda
    # perturbs the warm start of the next, so per-lambda counts can
    # drift by a few while the solutions agree.  Pin the totals.
    assert (abs(int(niter_p.sum()) - int(niter_x.sum()))
            <= max(3, int(0.1 * int(niter_x.sum()))))


def test_scan_kernel_enet(problem):
    Xs, ys, ilams, p, k = problem
    coefs_x, niter_x, _ = _solve_path_tall(Xs, ys, ilams, -1.0, 2000,
                                        1e-5, 1e-5, 0.6)
    coefs_p, niter_p = _pallas_scan_solve(Xs, ys, ilams, p, alpha=0.6)
    np.testing.assert_allclose(np.asarray(coefs_p), np.asarray(coefs_x),
                               atol=1e-5)
    assert (abs(int(niter_p.sum()) - int(niter_x.sum()))
            <= max(3, int(0.1 * int(niter_x.sum()))))


def test_supports_scan_budget():
    assert supports_scan(1000, 100)
    assert not supports_scan(4000, 100)   # measured crossover (see above)
    assert not supports_scan(1000, 2000)  # K cap


def test_kernel_padding_lanes_inert(problem):
    """k=10 pads to 8-multiples internally; results must be unaffected
    and padded lanes never pollute real ones."""
    Xs, ys, ilams, p, k = problem
    c1, n1 = _pallas_solve(Xs, ys, ilams[:7], p)  # pads 7 -> 8
    c2, n2 = _pallas_solve(Xs, ys, ilams, p)      # pads 10 -> 16
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2[:7]),
                               atol=1e-7)


@pytest.fixture(scope="module")
def wide_problem():
    rng = np.random.default_rng(11)
    n, p, k = 60, 150, 9
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:12] = rng.normal(size=12)
    y = X @ b + 0.2 * rng.normal(size=n)
    Xs, ys, _ = standardize(jnp.asarray(X, jnp.float32),
                            jnp.asarray(y, jnp.float32),
                            standardize_x=True, intercept=True)
    lam0 = float(jnp.max(jnp.abs(dot(Xs.T, ys))))
    ilams = jnp.asarray(np.geomspace(lam0 * 1.1, lam0 * 1e-2, k),
                        jnp.float32)  # first lam above lambda0: early exit
    return Xs, ys, ilams, n, p


def _pallas_wide_solve(Xs, ys, ilams, n, p, alpha=1.0):
    from admm_tpu.models.lasso import _wide_setup
    from admm_tpu.ops.wide_path import wide_path_batch_pallas

    lambda0, sprad, rho = _wide_setup(Xs, ys, ilams, -1.0, alpha, False)
    return wide_path_batch_pallas(Xs, ys, ilams, rho, sprad, lambda0,
                                  1e-5, 1e-5, alpha, 2000, true_n=n,
                                  true_p=p, interpret=True)


def test_wide_kernel_matches_xla_batch(wide_problem):
    from admm_tpu.models.lasso import _solve_path_wide_batch

    Xs, ys, ilams, n, p = wide_problem
    coefs_x, niter_x, _ = _solve_path_wide_batch(Xs, ys, ilams, -1.0, 2000,
                                              1e-5, 1e-5, 1.0, False)
    coefs_p, niter_p = _pallas_wide_solve(Xs, ys, ilams, n, p)
    np.testing.assert_allclose(np.asarray(coefs_p), np.asarray(coefs_x),
                               atol=1e-5)
    assert np.max(np.abs(np.asarray(niter_p) - np.asarray(niter_x))) <= 1
    # first lambda is above lambda0: early exit must give exact zero
    assert np.abs(np.asarray(coefs_p)[0]).max() == 0.0


def test_wide_kernel_enet(wide_problem):
    from admm_tpu.models.lasso import _solve_path_wide_batch

    Xs, ys, ilams, n, p = wide_problem
    coefs_x, niter_x, _ = _solve_path_wide_batch(Xs, ys, ilams, -1.0, 2000,
                                              1e-5, 1e-5, 0.6, False)
    coefs_p, niter_p = _pallas_wide_solve(Xs, ys, ilams, n, p, alpha=0.6)
    np.testing.assert_allclose(np.asarray(coefs_p), np.asarray(coefs_x),
                               atol=1e-5)
    assert np.max(np.abs(np.asarray(niter_p) - np.asarray(niter_x))) <= 1


def test_wide_supports_budget():
    from admm_tpu.ops.wide_path import supports_wide

    assert supports_wide(1000, 2000, 104)
    assert not supports_wide(4000, 8000, 104)


def test_lad_kernel_matches_xla_solver():
    """Interpret-mode LAD kernel vs the XLA FADMM solver: same terminal
    dual/aux state drives the same recovered coefficients."""
    import jax
    from admm_tpu.core.engine import make_fadmm_solver, make_state
    from admm_tpu.linalg import chol_inverse, gram
    from admm_tpu.models.lad import _lad_ops
    from admm_tpu.ops.lad_kernel import lad_solve_pallas, supports_lad

    assert supports_lad(1000, 512)
    assert not supports_lad(8000, 2048)  # 256 MB hat matrix

    rng = np.random.default_rng(8)
    n, p = 300, 20
    X = rng.normal(size=(n, p))
    y = X @ rng.normal(size=p) + rng.standard_t(2, size=n)
    Xs = jnp.asarray(X, jnp.float32)
    ys = jnp.asarray(y, jnp.float32)
    Ginv = chol_inverse(gram(Xs), jitter=1e-6)
    from admm_tpu.core.prox import l2norm
    ynorm = l2norm(ys)

    ops = _lad_ops(Xs, ys, Ginv, ynorm, n, p)
    solve = make_fadmm_solver(ops, adapt_rho=False)
    zeros = jnp.zeros((n,), jnp.float32)
    st = solve(make_state(zeros, zeros, zeros, 1.0, 0.0,
                          dtype=jnp.float32), 2000, 1e-5, 1e-5)

    from admm_tpu.linalg import dot as _d
    H = _d(Xs, _d(Ginv, Xs.T))
    adj_y, adj_z, niter = lad_solve_pallas(H, ys, 1.0, 1e-5, 1e-5,
                                           float(ynorm), 2000, true_n=n,
                                           interpret=True)
    # The terminal duals saturate at +-1 and are path-dependent near L1
    # kinks; the invariant is the recovered coefficient vector and its
    # objective, not the raw dual state.
    from admm_tpu.linalg import dot as pdot

    def coef_of(ay, az):
        return np.asarray(pdot(Ginv, pdot(Xs.T, ys - ay / 1.0 + az)))

    c_kernel = coef_of(jnp.asarray(adj_y), jnp.asarray(adj_z))
    c_xla = coef_of(st.adj_y, st.adj_z)
    obj = lambda c: np.abs(np.asarray(ys) - X @ c).sum()
    np.testing.assert_allclose(c_kernel, c_xla, atol=5e-3)
    assert obj(c_kernel) <= obj(c_xla) * 1.001


def test_bp_batch_kernel_matches_xla_solver():
    """The batched multi-RHS BP kernel (the lane-batched fix for round
    1's gated-off single-RHS kernel) must match the XLA batched solver
    per lane and recover the true signals."""
    import jax
    from admm_tpu.models.bp import _bp_fit_batch, bp_fit_batch
    from admm_tpu.ops.bp_kernel import (bp_batch_solve_pallas,
                                        supports_bp_batch)
    from admm_tpu.linalg import chol_inverse, dot as pdot, tgram

    # Gate facts: multi-lane reference size fits; single lane never
    # uses the kernel; the big 1000x10000 A does not fit VMEM.
    assert supports_bp_batch(1000, 2000, 100)
    assert not supports_bp_batch(1000, 2000, 1)
    assert not supports_bp_batch(1000, 10000, 200)

    rng = np.random.default_rng(12)
    n, p, k, m = 60, 160, 6, 5
    X0 = np.zeros((m, p))
    for i in range(m):
        X0[i, rng.choice(p, k, replace=False)] = rng.normal(size=k)
    A = jnp.asarray(rng.normal(size=(n, p)) / np.sqrt(n), jnp.float32)
    B = jnp.asarray(X0, jnp.float32) @ A.T

    # XLA batched solver (the fallback path).
    ref = _bp_fit_batch(A, B, 1.0, 3000, 1e-6, 1e-6)

    Winv = chol_inverse(tgram(A), jitter=1e-6)
    AAAB = pdot(B, pdot(Winv, A))
    z, niter = bp_batch_solve_pallas(A, Winv, AAAB, 1.0, 1e-6, 1e-6,
                                     3000, true_p=p, interpret=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.coef),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), X0, atol=1e-3)
    # Accumulation-order drift bound as elsewhere.
    for a, b in zip(np.asarray(niter), np.asarray(ref.niter)):
        assert abs(int(a) - int(b)) <= max(3, int(0.05 * int(b)))


def test_glm_kernel_matches_xla_batch_solver():
    """The fixed-majorizer GLM kernel must reproduce the XLA batched
    engine's solutions and (±1) iteration counts for both bounded
    families."""
    import jax.numpy as jnp

    from admm_tpu.models.glm import (_glm_auto_rho, _glm_fixed_minv,
                                     binomial, glm_lasso_path, huber,
                                     prep_design)
    from admm_tpu.ops.glm_kernel import glm_batch_path_pallas

    rng = np.random.default_rng(51)
    n, p = 300, 16
    X = rng.normal(size=(n, p)).astype(np.float32)
    b = np.zeros(p)
    b[:4] = [1.5, -2.0, 1.0, 0.5]
    cases = {
        "binomial": (binomial(),
                     (rng.uniform(size=n) < 1 / (1 + np.exp(-(X @ b))))
                     .astype(np.float32)),
        "huber": (huber(1.345),
                  (X @ b + 0.3 * rng.normal(size=n)).astype(np.float32)),
    }
    for name, (fam, y) in cases.items():
        ref = glm_lasso_path(X, y, fam, nlambda=6, path_mode="batch",
                             hessian="fixed", eps_abs=1e-6,
                             eps_rel=1e-6, dtype=jnp.float32)
        Xa, pen_mask, mean_x, sd_x = prep_design(
            jnp.asarray(X), True, True)
        rho = _glm_auto_rho(fam, -1.0, jnp.float32)
        Minv = _glm_fixed_minv(Xa, fam, rho)
        lams = jnp.asarray(ref.lambdas, jnp.float32)
        z, niter = glm_batch_path_pallas(
            Xa, Minv, jnp.asarray(y), pen_mask, lams, rho, 1e-6, 1e-6,
            jnp.float32(1.0), 2000, family=fam.name, huber_m=fam.param,
            newton_steps=2, true_q=int(Xa.shape[1]),
            n_total=n, interpret=True)
        from admm_tpu.models.glm import recover_glm

        beta0, coef = recover_glm(z, mean_x, sd_x, True)
        np.testing.assert_allclose(np.asarray(coef),
                                   np.asarray(ref.coef), atol=2e-5,
                                   err_msg=name)
        assert np.abs(np.asarray(niter)
                      - np.asarray(ref.niter)).max() <= 1, name
