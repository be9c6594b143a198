"""Operator parallelism for the SERIAL path: row-sharded data linalg.

The reference gets implicit operator parallelism from BLAS threads
(reference: src/Makevars:3-4).  The TPU equivalent is ``lasso_path(...,
data_mesh=...)``: the data matrix is row-sharded over the mesh and XLA's
SPMD partitioner turns the standardization moments, the Gram X'X, X'y
and the wide path's per-iteration matvecs into per-shard work plus
collectives — no algorithm change.  These tests pin (a) numerical
agreement with replicated execution and (b) that the compiled program
really does distribute (collectives present).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_tpu.models.lasso import lasso_path
from admm_tpu.parallel.mesh import make_mesh


def _tall_problem(n=200_000, p=64, seed=11):
    rng = np.random.default_rng(seed)
    b = np.zeros(p)
    b[:10] = rng.uniform(1, 2, 10)
    X = rng.normal(size=(n, p)).astype(np.float32)
    y = (X @ b + 0.5 * rng.normal(size=n)).astype(np.float32)
    return X, y


@pytest.mark.parametrize("mode", ["batch", "scan"])
def test_sharded_tall_path_matches_replicated(mode):
    """n = 200k rows sharded over 8 devices: the Gram, X'y and the
    standardization reductions run distributed; solutions match the
    replicated run up to f32 reduction order."""
    X, y = _tall_problem()
    mesh = make_mesh(8)
    rep = lasso_path(X, y, nlambda=5, path_mode=mode)
    shd = lasso_path(X, y, nlambda=5, path_mode=mode, data_mesh=mesh)
    np.testing.assert_allclose(np.asarray(shd.coef), np.asarray(rep.coef),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(shd.beta0),
                               np.asarray(rep.beta0), atol=1e-4)
    # Reduction order may shift an iteration count by a couple.
    assert np.abs(np.asarray(shd.niter).astype(int)
                  - np.asarray(rep.niter).astype(int)).max() <= 3


def test_sharded_wide_path_matches_replicated():
    """Wide regime: the per-ITERATION X v / X'r matvecs distribute."""
    rng = np.random.default_rng(3)
    X = rng.normal(size=(256, 512)).astype(np.float32)
    y = (X[:, :8] @ np.ones(8) + 0.1 * rng.normal(size=256)).astype(
        np.float32)
    mesh = make_mesh(8)
    rep = lasso_path(X, y, nlambda=8, path_mode="batch")
    shd = lasso_path(X, y, nlambda=8, path_mode="batch", data_mesh=mesh)
    np.testing.assert_allclose(np.asarray(shd.coef), np.asarray(rep.coef),
                               atol=1e-4)


def test_sharded_path_compiles_collectives():
    """The sharded program must actually be distributed: the compiled
    HLO contains all-reduces (partial Gram / moment sums over the mesh),
    and the solve still returns the replicated answer."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from admm_tpu.models.lasso import _path_user

    X, y = _tall_problem(n=4096)
    mesh = make_mesh(8)
    axes = tuple(mesh.axis_names)
    Xg = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P(axes, None)))
    yg = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P(axes)))
    lams = jnp.asarray(np.geomspace(1.0, 0.01, 5), jnp.float32)
    lowered = _path_user.lower(Xg, yg, lams, -1.0, 100, 1e-5, 1e-5, 1.0,
                               standardize_x=True, intercept=True,
                               enet_scale=False, path_mode="batch",
                               shard_data=True)
    hlo = lowered.compile().as_text()
    assert hlo.count(" all-reduce") >= 1, "sharded path has no collectives"


def test_sharded_lad_matches_replicated():
    """LAD with row-sharded data: the X'X build, the per-iteration
    range-space projection and the final LS recovery distribute
    (VERDICT r2 missing #2 — the reference's BLAS threads accelerate
    every model, not just the Lasso)."""
    from admm_tpu.models.lad import lad_fit

    rng = np.random.default_rng(5)
    n, p = 4096, 24
    b = rng.uniform(size=p)
    X = rng.normal(scale=2.0, size=(n, p))
    y = X @ b + rng.normal(size=n)
    rep = lad_fit(X, y)
    shd = lad_fit(X, y, data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef), np.asarray(rep.coef),
                               atol=2e-4)
    assert abs(float(shd.beta0) - float(rep.beta0)) < 2e-4


def test_sharded_bp_matches_replicated():
    """BP with COLUMN-sharded A (p is the long axis): AA' becomes
    per-shard partial products + all-reduce; the projection matvecs
    distribute with the (p,) iterate sharded."""
    from admm_tpu.models.bp import bp_fit

    rng = np.random.default_rng(6)
    n, p = 64, 512
    x0 = np.zeros(p)
    x0[rng.choice(p, 10, replace=False)] = rng.normal(size=10)
    A = rng.normal(size=(n, p)) / np.sqrt(n)
    bvec = A @ x0
    rep = bp_fit(A, bvec)
    shd = bp_fit(A, bvec, data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef), np.asarray(rep.coef),
                               atol=5e-4)


def test_sharded_dantzig_matches_replicated():
    from admm_tpu.models.dantzig import dantzig_path

    rng = np.random.default_rng(7)
    n, p = 2048, 24
    b = np.zeros(p)
    b[:5] = rng.uniform(1, 2, 5)
    X = rng.normal(size=(n, p))
    y = X @ b + 0.3 * rng.normal(size=n)
    lams = np.array([0.3, 0.1])
    rep = dantzig_path(X, y, lambdas=lams)
    shd = dantzig_path(X, y, lambdas=lams, data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef), np.asarray(rep.coef),
                               atol=2e-4)


def test_sharded_glm_matches_replicated():
    """GLM with row-sharded data: the per-Newton-step grad/Hessian
    reductions (or the fixed-majorizer Gram) distribute."""
    from admm_tpu.models.logistic import logistic_lasso_path

    rng = np.random.default_rng(8)
    n, p = 2048, 16
    b = np.concatenate([[1.5, -1.0], np.zeros(p - 2)])
    X = rng.normal(size=(n, p))
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-(0.2 + X @ b)))
         ).astype(float)
    lams = np.array([0.03, 0.01])
    rep = logistic_lasso_path(X, y, lambdas=lams)
    shd = logistic_lasso_path(X, y, lambdas=lams,
                              data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef), np.asarray(rep.coef),
                               atol=2e-4)


@pytest.mark.parametrize("model", ["lad", "bp", "dantzig"])
def test_sharded_models_compile_collectives(model):
    """The sharded programs must actually be distributed: the compiled
    HLO contains all-reduces."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    axes = tuple(mesh.axis_names)
    rng = np.random.default_rng(9)
    if model == "lad":
        from admm_tpu.models.lad import _lad_fit

        X = jnp.asarray(rng.normal(size=(1024, 16)), jnp.float32)
        y = jnp.asarray(rng.normal(size=1024), jnp.float32)
        Xg = jax.device_put(X, NamedSharding(mesh, P(axes, None)))
        yg = jax.device_put(y, NamedSharding(mesh, P(axes)))
        lowered = _lad_fit.lower(Xg, yg, 5.0, 50, 1e-4, 1e-4,
                                 intercept=True, pallas_ok=False)
    elif model == "bp":
        from admm_tpu.models.bp import _bp_fit

        A = jnp.asarray(rng.normal(size=(32, 256)), jnp.float32)
        bv = jnp.asarray(rng.normal(size=32), jnp.float32)
        Ag = jax.device_put(A, NamedSharding(mesh, P(None, axes)))
        lowered = _bp_fit.lower(Ag, bv, 5.0, 50, 1e-4, 1e-4)
    else:
        from admm_tpu.models.dantzig import _dpath_user

        X = jnp.asarray(rng.normal(size=(1024, 16)), jnp.float32)
        y = jnp.asarray(rng.normal(size=1024), jnp.float32)
        Xg = jax.device_put(X, NamedSharding(mesh, P(axes, None)))
        yg = jax.device_put(y, NamedSharding(mesh, P(axes)))
        lams = jnp.asarray([0.3, 0.1], jnp.float32)
        lowered = _dpath_user.lower(Xg, yg, lams, -1.0, 50, 1e-5, 1e-5,
                                    standardize_x=True, intercept=True,
                                    path_mode="batch")
    hlo = lowered.compile().as_text()
    assert hlo.count(" all-reduce") >= 1, f"{model}: no collectives"


def test_group_and_genlasso_data_mesh_agreement():
    """data_mesh operator parallelism for the group and generalized
    Lasso: sharded == replicated (the remaining serial drivers)."""
    import numpy as np

    from admm_tpu.models.genlasso import difference_matrix, gen_lasso_path
    from admm_tpu.models.grouplasso import group_lasso_path
    from admm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    n, p = 320, 12
    X = rng.normal(size=(n, p))
    y = X[:, 0] - 0.5 * X[:, 4] + 0.2 * rng.normal(size=n)
    mesh = make_mesh(8)
    a = group_lasso_path(X, y, np.arange(p) % 4, nlambda=5,
                         data_mesh=mesh)
    b = group_lasso_path(X, y, np.arange(p) % 4, nlambda=5)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-5)
    D = difference_matrix(p, 1)
    ag = gen_lasso_path(X, y, D, nlambda=5, data_mesh=mesh)
    bg = gen_lasso_path(X, y, D, nlambda=5)
    np.testing.assert_allclose(np.asarray(ag.coef),
                               np.asarray(bg.coef), atol=1e-5)


def test_sharded_sqrt_lasso_matches_replicated():
    """sqrt_lasso_path(data_mesh=...): the concomitant alternation's
    data reductions (moments, Gram, X'y, the sigma residual norm)
    distribute over the row-sharded mesh; results match replicated
    execution."""
    from admm_tpu.models.sqrtlasso import sqrt_lasso_path

    rng = np.random.default_rng(11)
    X = rng.normal(size=(256, 12)).astype(np.float32)
    b = np.zeros(12, np.float32)
    b[:3] = [2.0, -1.0, 0.5]
    y = X @ b + 0.5 * rng.normal(size=256).astype(np.float32)
    rep = sqrt_lasso_path(X, y, nlambda=5)
    shd = sqrt_lasso_path(X, y, nlambda=5, data_mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shd.coef),
                               np.asarray(rep.coef), atol=2e-4)
    # Reduction order shifts the inner counters by a few (the sigma
    # alternation compounds the usual +-1); totals stay close.
    assert abs(int(np.asarray(shd.niter).sum())
               - int(np.asarray(rep.niter).sum())) <= 10
