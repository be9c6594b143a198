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
