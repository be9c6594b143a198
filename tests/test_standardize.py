"""Tests for the glmnet-compatible standardization / recovery."""
import numpy as np
import jax.numpy as jnp
import pytest

from admm_tpu.data.standardize import recover, standardize


@pytest.fixture
def data(rng):
    X = rng.normal(2.0, 3.0, (50, 7))
    y = 1.5 + X @ rng.uniform(size=7) + rng.normal(size=50)
    return jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)


def test_flag0_identity(data):
    X, y = data
    Xs, ys, st = standardize(X, y, standardize_x=False, intercept=False)
    np.testing.assert_array_equal(np.asarray(Xs), np.asarray(X))
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(y))


def test_flag3_moments(data):
    X, y = data
    Xs, ys, st = standardize(X, y, standardize_x=True, intercept=True)
    np.testing.assert_allclose(np.asarray(Xs).mean(0), 0.0, atol=1e-5)
    # glmnet sd uses 1/n denominator
    np.testing.assert_allclose(np.asarray(Xs).std(0), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ys).mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys).std(), 1.0, atol=1e-4)


def test_flag1_scales_only(data):
    X, y = data
    Xs, ys, st = standardize(X, y, standardize_x=True, intercept=False)
    # columns scaled by sd but NOT centered (reference: src/DataStd.h:114-119)
    assert abs(float(jnp.mean(Xs[:, 0]))) > 0.1
    np.testing.assert_allclose(np.asarray(Xs).std(0), 1.0, atol=1e-4)


def test_flag2_centers_x_without_scaling(data):
    X, y = data
    Xs, ys, st = standardize(X, y, standardize_x=False, intercept=True)
    np.testing.assert_allclose(np.asarray(Xs).mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Xs).std(0),
                               np.asarray(X).std(0), rtol=1e-5)


@pytest.mark.parametrize("std,icpt", [(False, False), (True, False),
                                      (False, True), (True, True)])
def test_recover_roundtrip_linear_model(data, std, icpt):
    """Fitting OLS on transformed data + recover == OLS on original data."""
    X, y = data
    Xs, ys, st = standardize(X, y, standardize_x=std, intercept=icpt)
    coef_t, *_ = np.linalg.lstsq(np.asarray(Xs), np.asarray(ys),
                                 rcond=None)
    beta0, coef = recover(st, jnp.asarray(coef_t), standardize_x=std,
                          intercept=icpt)
    Xn, yn = np.asarray(X, np.float64), np.asarray(y, np.float64)
    if icpt:
        A = np.concatenate([np.ones((Xn.shape[0], 1)), Xn], axis=1)
        ref, *_ = np.linalg.lstsq(A, yn, rcond=None)
        np.testing.assert_allclose(float(beta0), ref[0], atol=1e-3)
        np.testing.assert_allclose(np.asarray(coef), ref[1:], atol=1e-3)
    else:
        ref, *_ = np.linalg.lstsq(Xn, yn, rcond=None)
        np.testing.assert_allclose(np.asarray(coef), ref, atol=1e-3)


def test_recover_batched_path(data):
    """recover() must broadcast over a whole (nlambda, p) path."""
    X, y = data
    Xs, ys, st = standardize(X, y, standardize_x=True, intercept=True)
    path = jnp.stack([jnp.ones(7), 2 * jnp.ones(7)]).astype(jnp.float32)
    beta0, coef = recover(st, path, standardize_x=True, intercept=True)
    assert beta0.shape == (2,)
    assert coef.shape == (2, 7)
    b0_single, c_single = recover(st, path[1], standardize_x=True,
                                  intercept=True)
    np.testing.assert_allclose(np.asarray(coef[1]), np.asarray(c_single),
                               atol=1e-6)
    np.testing.assert_allclose(float(beta0[1]), float(b0_single),
                               atol=1e-5)
