"""Consensus (parallel) Basis Pursuit and Elastic Net.

The reference never shipped these: ``admm_parbp`` is dispatched by the R
layer (reference: R/10_admm_bp.R:100-120) but its native side lives only
in src/TODO/ (never compiled), and no ``admm_parenet`` exists at all.
These tests pin the working TPU-native versions against the serial
solvers and independent oracles.
"""
import numpy as np
import pytest
from sklearn.linear_model import ElasticNet

import admm_tpu
from admm_tpu.models.bp import bp_fit
from admm_tpu.models.lasso import enet_path
from admm_tpu.parallel.consensus import (parallel_bp_fit,
                                         parallel_enet_path)
from admm_tpu.parallel.mesh import make_mesh


def _bp_problem(n=60, p=150, k=12, seed=123):
    rng = np.random.default_rng(seed)
    x0 = np.zeros(p)
    x0[rng.choice(p, k, replace=False)] = rng.normal(size=k)
    A = rng.normal(size=(n, p)) / np.sqrt(n)
    return A, A @ x0, x0


def _enet_problem(n=400, p=30, seed=123):
    rng = np.random.default_rng(seed)
    b = rng.uniform(size=p) * (rng.uniform(size=p) < 0.5)
    X = rng.normal(size=(n, p))
    y = 2.0 + X @ b + 0.5 * rng.normal(size=n)
    return X, y


# ---------------------------------------------------------------------------
# Consensus Basis Pursuit
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nworkers,ndev", [(2, 1), (4, 4)])
def test_parallel_bp_recovers_sparse_signal(nworkers, ndev):
    A, b, x0 = _bp_problem()
    res = parallel_bp_fit(A, b, nworkers=nworkers, mesh=make_mesh(ndev),
                          eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(res.coef), x0, atol=2e-3)


def test_parallel_bp_matches_serial():
    A, b, _ = _bp_problem()
    ser = bp_fit(A, b, eps_abs=1e-6, eps_rel=1e-6)
    par = parallel_bp_fit(A, b, nworkers=4, mesh=make_mesh(4),
                          eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef), np.asarray(ser.coef),
                               atol=2e-3)


def test_parallel_bp_sharded_equals_batched():
    """Device decomposition must not change the math."""
    A, b, _ = _bp_problem()
    one = parallel_bp_fit(A, b, nworkers=4, mesh=make_mesh(1))
    many = parallel_bp_fit(A, b, nworkers=4, mesh=make_mesh(4))
    np.testing.assert_allclose(np.asarray(one.coef), np.asarray(many.coef),
                               atol=1e-5)
    assert int(one.niter) == int(many.niter)


def test_parallel_bp_padding_inert():
    """n not divisible by W exercises the zero-row padding; padded rows
    must not perturb the solution."""
    A, b, x0 = _bp_problem(n=59)
    res = parallel_bp_fit(A, b, nworkers=4, mesh=make_mesh(4),
                          eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(res.coef), x0, atol=2e-3)


def test_parallel_bp_via_builder():
    A, b, _ = _bp_problem()
    opts = dict(eps_abs=1e-6, eps_rel=1e-6)
    fit = admm_tpu.admm_bp(A, b).parallel(nthread=4).opts(**opts).fit()
    ser = admm_tpu.admm_bp(A, b).opts(**opts).fit()
    np.testing.assert_allclose(fit.beta.toarray(), ser.beta.toarray(),
                               atol=3e-3)


def test_parallel_bp_requires_wide():
    A = np.random.default_rng(0).normal(size=(10, 5))
    with pytest.raises(ValueError):
        parallel_bp_fit(A, np.zeros(10), nworkers=2, mesh=make_mesh(1))


# ---------------------------------------------------------------------------
# Consensus Elastic Net
# ---------------------------------------------------------------------------

def test_parallel_enet_matches_sklearn():
    X, y = _enet_problem()
    lam, alpha = 0.1, 0.6
    par = parallel_enet_path(X, y, alpha=alpha, nworkers=4,
                             mesh=make_mesh(4), lambdas=np.array([lam]),
                             standardize=False, intercept=False,
                             eps_abs=1e-6, eps_rel=1e-6)
    sk = ElasticNet(alpha=lam, l1_ratio=alpha, fit_intercept=False,
                    tol=1e-12, max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(par.coef[0]), sk.coef_,
                               atol=3e-3)


def test_parallel_enet_alpha1_equals_parallel_lasso():
    from admm_tpu.parallel.consensus import parallel_lasso_path

    X, y = _enet_problem()
    lam = np.array([0.2, 0.05])
    a = parallel_enet_path(X, y, alpha=1.0, nworkers=4, mesh=make_mesh(4),
                           lambdas=lam, standardize=False, intercept=False)
    b = parallel_lasso_path(X, y, nworkers=4, mesh=make_mesh(4),
                            lambdas=lam, standardize=False, intercept=False)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-6)


def test_parallel_enet_full_path_matches_serial():
    X, y = _enet_problem()
    par = parallel_enet_path(X, y, alpha=0.6, nworkers=8,
                             mesh=make_mesh(8), nlambda=10)
    ser = enet_path(X, y, alpha=0.6, nlambda=10)
    np.testing.assert_allclose(np.asarray(par.lambdas),
                               np.asarray(ser.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(par.coef[-1]),
                               np.asarray(ser.coef[-1]), atol=5e-3)


def test_parallel_enet_via_builder():
    X, y = _enet_problem()
    fit = (admm_tpu.admm_enet(X, y).penalty(nlambda=8, alpha=0.6)
           .parallel(nthread=4).fit())
    assert fit.beta.shape == (X.shape[1] + 1, 8)
    assert np.all(np.isfinite(fit.beta.toarray()))


def test_parallel_group_lasso_matches_serial():
    """Consensus group-Lasso (master block-prox swap) == serial solver."""
    from admm_tpu.models.grouplasso import group_lasso_path
    from admm_tpu.parallel.consensus import parallel_group_lasso_path

    rng = np.random.default_rng(17)
    n, p, G = 400, 24, 8
    groups = np.arange(p) % G
    b = np.zeros(p)
    b[groups == 2] = 1.5
    b[groups == 5] = -1.0
    X = rng.normal(size=(n, p))
    y = X @ b + 0.3 * rng.normal(size=n)
    lams = np.array([0.3, 0.1, 0.03])
    par = parallel_group_lasso_path(X, y, groups, nworkers=4,
                                    mesh=make_mesh(4), lambdas=lams,
                                    standardize=False, intercept=False,
                                    eps_abs=1e-6, eps_rel=1e-6)
    ser = group_lasso_path(X, y, groups, lambdas=lams, standardize=False,
                           intercept=False, eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef), np.asarray(ser.coef),
                               atol=3e-3)
    # auto grid agrees too (group lambda0 rule shared)
    par2 = parallel_group_lasso_path(X, y, groups, nworkers=4,
                                     mesh=make_mesh(4), nlambda=6)
    ser2 = group_lasso_path(X, y, groups, nlambda=6)
    np.testing.assert_allclose(np.asarray(par2.lambdas),
                               np.asarray(ser2.lambdas), rtol=1e-5)


def test_consensus_logistic_matches_serial():
    """Distributed sparse logistic regression (extension): the consensus
    path over 8 workers must converge to the serial logistic solution
    (same objective, glmnet semantics)."""
    from admm_tpu.models.logistic import logistic_lasso_path
    from admm_tpu.parallel.consensus import parallel_logistic_lasso_path
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n, p = 480, 24
    b = np.zeros(p)
    b[:5] = rng.uniform(1, 2, 5) * rng.choice([-1, 1], 5)
    X = rng.normal(size=(n, p))
    y = (rng.uniform(size=n)
         < 1 / (1 + np.exp(-(0.4 + X @ b)))).astype(float)
    lams = np.array([0.05, 0.02, 0.008])
    par = parallel_logistic_lasso_path(X, y, nworkers=8,
                                       mesh=make_mesh(8), lambdas=lams,
                                       eps_abs=1e-6, eps_rel=1e-6)
    ser = logistic_lasso_path(X, y, lambdas=lams, eps_abs=1e-6,
                              eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef),
                               np.asarray(ser.coef), atol=2e-3)
    np.testing.assert_allclose(np.asarray(par.beta0),
                               np.asarray(ser.beta0), atol=2e-3)


def test_consensus_huber_and_poisson_match_serial():
    """The consensus worker is GLM-family-generic (VERDICT r2 missing
    #1): the huber and poisson consensus paths over the 8-device mesh
    must converge to their serial solvers' solutions."""
    from admm_tpu.models.glm import (huber_lasso_path,
                                     poisson_lasso_path)
    from admm_tpu.parallel.consensus import (parallel_huber_lasso_path,
                                             parallel_poisson_lasso_path)
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    n, p = 480, 24
    b = np.zeros(p)
    b[:4] = [1.2, -0.8, 0.6, -0.5]
    X = rng.normal(size=(n, p))

    # Huber: contaminated gaussian response.
    yh = 0.7 + X @ b + 0.3 * rng.normal(size=n)
    yh[rng.choice(n, 20, replace=False)] += rng.choice([-1, 1], 20) * 25.0
    lams = np.array([0.08, 0.03, 0.012])
    par = parallel_huber_lasso_path(X, yh, nworkers=8, mesh=make_mesh(8),
                                    lambdas=lams, eps_abs=1e-6,
                                    eps_rel=1e-6)
    ser = huber_lasso_path(X, yh, lambdas=lams, eps_abs=1e-6,
                           eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef), np.asarray(ser.coef),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(par.beta0),
                               np.asarray(ser.beta0), atol=2e-3)

    # Poisson: counts from a log-linear model (small coefficients keep
    # the rate bounded).
    bp_ = b * 0.25
    yp = rng.poisson(np.exp(0.5 + X @ bp_)).astype(float)
    lamsp = np.array([0.05, 0.02, 0.008])
    parp = parallel_poisson_lasso_path(X, yp, nworkers=8,
                                       mesh=make_mesh(8), lambdas=lamsp,
                                       eps_abs=1e-6, eps_rel=1e-6)
    serp = poisson_lasso_path(X, yp, lambdas=lamsp, eps_abs=1e-6,
                              eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(parp.coef),
                               np.asarray(serp.coef), atol=2e-3)
    np.testing.assert_allclose(np.asarray(parp.beta0),
                               np.asarray(serp.beta0), atol=2e-3)


def test_parallel_glm_auto_grid_matches_serial():
    """The consensus GLM driver shares the serial lambda_max rule, so
    auto grids must agree exactly (family hooks + prep_design shared)."""
    from admm_tpu.models.glm import huber, glm_lasso_path
    from admm_tpu.parallel.consensus import parallel_glm_lasso_path
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(12)
    n, p = 240, 16
    X = rng.normal(size=(n, p))
    y = X @ np.concatenate([[1.0, -1.0], np.zeros(p - 2)])
    y = y + 0.4 * rng.normal(size=n)
    par = parallel_glm_lasso_path(X, y, huber(1.345), nworkers=8,
                                  mesh=make_mesh(8), nlambda=5, maxit=200)
    ser = glm_lasso_path(X, y, huber(1.345), nlambda=5, maxit=200)
    np.testing.assert_allclose(np.asarray(par.lambdas),
                               np.asarray(ser.lambdas), rtol=1e-5)


def test_consensus_multinomial_matches_serial():
    """Matrix-variable consensus (flattened (q, C) blocks): the
    distributed multinomial path must converge to the serial solver,
    ungrouped and grouped."""
    from admm_tpu.models.multinomial import multinomial_lasso_path
    from admm_tpu.parallel.consensus import (
        parallel_multinomial_lasso_path)
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(21)
    n, p, C = 480, 12, 3
    B = np.zeros((p, C))
    B[:4] = rng.uniform(0.8, 1.8, (4, C)) * rng.choice([-1, 1], (4, C))
    X = rng.normal(size=(n, p))
    eta = X @ B
    pr = np.exp(eta - eta.max(axis=1, keepdims=True))
    pr /= pr.sum(axis=1, keepdims=True)
    y = np.array([rng.choice(C, p=pi) for pi in pr])
    lams = np.array([0.04, 0.015])
    for grouped in (False, True):
        par = parallel_multinomial_lasso_path(
            X, y, nworkers=8, mesh=make_mesh(8), lambdas=lams,
            grouped=grouped, eps_abs=1e-6, eps_rel=1e-6)
        ser = multinomial_lasso_path(X, y, lambdas=lams,
                                     grouped=grouped, eps_abs=1e-6,
                                     eps_rel=1e-6)
        np.testing.assert_allclose(np.asarray(par.coef),
                                   np.asarray(ser.coef), atol=3e-3,
                                   err_msg=f"grouped={grouped}")
        np.testing.assert_allclose(np.asarray(par.beta0),
                                   np.asarray(ser.beta0), atol=3e-3,
                                   err_msg=f"grouped={grouped}")


def test_consensus_multitask_matches_serial():
    from admm_tpu.models.multitask import multitask_lasso_path
    from admm_tpu.parallel.consensus import (
        parallel_multitask_lasso_path)
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(22)
    n, p, K = 320, 16, 3
    B = np.zeros((p, K))
    B[:4] = rng.uniform(0.5, 1.5, (4, K))
    X = rng.normal(size=(n, p))
    Y = 0.5 + X @ B + 0.3 * rng.normal(size=(n, K))
    lams = np.array([0.2, 0.06])
    par = parallel_multitask_lasso_path(X, Y, nworkers=8,
                                        mesh=make_mesh(8), lambdas=lams,
                                        eps_abs=1e-6, eps_rel=1e-6)
    ser = multitask_lasso_path(X, Y, lambdas=lams, eps_abs=1e-6,
                               eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef),
                               np.asarray(ser.coef), atol=2e-3)
    np.testing.assert_allclose(np.asarray(par.beta0),
                               np.asarray(ser.beta0), atol=2e-3)
    # Auto grids agree (shared row-norm rule).
    par2 = parallel_multitask_lasso_path(X, Y, nworkers=8,
                                         mesh=make_mesh(8), nlambda=5,
                                         maxit=200)
    ser2 = multitask_lasso_path(X, Y, nlambda=5, maxit=200)
    np.testing.assert_allclose(np.asarray(par2.lambdas),
                               np.asarray(ser2.lambdas), rtol=1e-5)


def test_consensus_multitask_elasticnet_matches_serial():
    """alpha < 1 (glmnet's mgaussian elastic net) through the consensus
    master prox equals the serial driver."""
    from admm_tpu.models.multitask import multitask_lasso_path
    from admm_tpu.parallel.consensus import (
        parallel_multitask_lasso_path)
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(23)
    n, p, K = 320, 12, 2
    B = np.zeros((p, K))
    B[:3] = rng.uniform(0.5, 1.5, (3, K))
    X = rng.normal(size=(n, p))
    Y = X @ B + 0.3 * rng.normal(size=(n, K))
    lams = np.array([0.15, 0.05])
    par = parallel_multitask_lasso_path(X, Y, nworkers=8,
                                        mesh=make_mesh(8), lambdas=lams,
                                        alpha=0.5,
                                        eps_abs=1e-6, eps_rel=1e-6)
    ser = multitask_lasso_path(X, Y, lambdas=lams, alpha=0.5,
                               eps_abs=1e-6, eps_rel=1e-6)
    np.testing.assert_allclose(np.asarray(par.coef),
                               np.asarray(ser.coef), atol=2e-3)
    np.testing.assert_allclose(np.asarray(par.beta0),
                               np.asarray(ser.beta0), atol=2e-3)


def test_parallel_constrained_lasso_matches_serial():
    """Consensus constrained lasso (per-worker KKT-constrained ridge
    solves, plain soft-threshold master) agrees with the serial
    block-eliminated engine on the 8-device mesh, and the consensus
    iterate honors the constraint."""
    from admm_tpu.models.conlasso import constrained_lasso_path
    from admm_tpu.parallel.consensus import (
        parallel_constrained_lasso_path, parallel_zerosum_lasso_path)

    rng = np.random.default_rng(17)
    n, p = 240, 12
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:4] = [1.5, -1.0, 0.8, -1.3]
    y = X @ b + 0.3 * rng.normal(size=n)
    C = np.ones((1, p))
    lams = np.array([0.15, 0.05, 0.01])
    par = parallel_constrained_lasso_path(X, y, C, lambdas=lams,
                                          nworkers=8, eps_abs=1e-7,
                                          eps_rel=1e-7)
    ser = constrained_lasso_path(X, y, C, lambdas=lams, eps_abs=1e-7,
                                 eps_rel=1e-7)
    gap = np.abs(np.asarray(par.coef) - np.asarray(ser.coef)).max()
    assert gap < 2e-3, gap
    # Zero-sum constraint on the consensus iterate (to tolerance).
    assert np.abs(np.asarray(par.coef).sum(axis=1)).max() < 1e-4
    # The zero-sum shorthand is the same path.
    zs = parallel_zerosum_lasso_path(X, y, lambdas=lams, nworkers=4,
                                     eps_abs=1e-7, eps_rel=1e-7)
    assert np.abs(np.asarray(zs.coef)
                  - np.asarray(par.coef)).max() < 2e-3
    # Nonzero right-hand side and the auto grid both run.
    d = np.array([2.0])
    pd = parallel_constrained_lasso_path(X, y, C, d, nlambda=4,
                                         nworkers=4)
    assert np.abs(np.asarray(pd.coef).sum(axis=1) - 2.0).max() < 1e-3
    with pytest.raises(ValueError, match="fewer constraints"):
        parallel_constrained_lasso_path(X, y, np.ones((p, p)),
                                        lambdas=lams)
