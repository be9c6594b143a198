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


def test_constant_column_does_not_nan():
    """A zero-variance column must be left unscaled, not divided by 0
    (parity with the host kernel's guard in admm_tpu/_native.py)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 4))
    X[:, 2] = 7.0  # constant column
    y = rng.normal(size=50)
    Xs, ys, stats = standardize(jnp.asarray(X), jnp.asarray(y),
                                standardize_x=True, intercept=True)
    assert np.all(np.isfinite(np.asarray(Xs)))
    assert float(stats.scale_x[2]) == 1.0
    # End-to-end: the fit stays finite and zeroes the useless column.
    from admm_tpu.models.lasso import lasso_path
    res = lasso_path(X, y, nlambda=5)
    assert np.all(np.isfinite(np.asarray(res.coef)))
    assert np.abs(np.asarray(res.coef)[:, 2]).max() < 1e-3


def test_constant_column_with_large_values():
    """A constant column of LARGE value centers to eps-scale rounding
    noise, not exact zero: the sd guard must be relative to the mean or
    recovery fabricates huge coefficients (observed: -1e4 on a column
    of constant 3.0 among mean-5000 features in f32)."""
    from admm_tpu.models.lasso import lasso_path

    rng = np.random.default_rng(2)
    n, p = 1000, 30
    X = rng.normal(loc=5000.0, scale=2.0, size=(n, p))
    X[:, 7] = 3.0
    b = np.zeros(p)
    b[:5] = rng.uniform(1, 2, 5)
    y = X @ b + rng.normal(size=n)
    res = lasso_path(X, y, nlambda=8)
    coef7 = np.asarray(res.coef)[:, 7]
    assert np.abs(coef7).max() < 1e-3, coef7


def test_large_mean_f32_stable_sd():
    """E[x^2]-E[x]^2 cancels catastrophically in f32; the centered
    two-pass form must survive mean/sd ratios of ~1e4."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    X = rng.normal(loc=10000.0, scale=1.0, size=(2000, 3))
    y = rng.normal(size=2000)
    Xs, _, stats = standardize(jnp.asarray(X, jnp.float32),
                               jnp.asarray(y, jnp.float32),
                               standardize_x=True, intercept=True)
    sd = np.asarray(stats.scale_x)
    assert np.all(np.isfinite(sd))
    np.testing.assert_allclose(sd, X.std(axis=0), rtol=0.05)
    assert np.all(np.isfinite(np.asarray(Xs)))


def test_make_x_one_hot_and_imputation():
    """glmnet's makeX: full indicator set per factor level, train-mean
    imputation applied to both matrices, test levels unioned."""
    import numpy as np

    from admm_tpu import make_x

    train = {"age": [30.0, 40.0, np.nan, 50.0],
             "city": ["a", "b", None, "a"]}
    test = {"age": [np.nan, 20.0], "city": ["c", "b"]}
    X, names = make_x(train, na_impute=True)
    assert names == ["age", "city:a", "city:b"]
    np.testing.assert_allclose(X[:, 0], [30, 40, 40, 50])   # mean=40
    np.testing.assert_allclose(X[:, 1], [1, 0, 2/3, 1])     # level freq
    Xt, Xte, names2 = make_x(train, test, na_impute=True)
    assert names2 == ["age", "city:a", "city:b", "city:c"]  # union
    np.testing.assert_allclose(Xte[:, 0], [40, 20])         # TRAIN mean
    np.testing.assert_allclose(Xte[:, 3], [1, 0])
    # Default (no imputation): NaNs propagate.
    Xn, _ = make_x(train)
    assert np.isnan(Xn[2, 0]) and np.isnan(Xn[2, 1])
    # 2D numeric passthrough.
    A = np.array([[1.0, np.nan], [2.0, 3.0]])
    Xa, na = make_x(A, na_impute=True)
    np.testing.assert_allclose(Xa, [[1.0, 3.0], [2.0, 3.0]])
    assert na == ["V0", "V1"]
    with pytest.raises(ValueError, match="same columns"):
        make_x(train, {"age": [1.0]})
