"""Tests for the native C++ host-runtime kernels (with fallback parity)."""
import numpy as np
import pytest
from scipy import sparse

from admm_tpu import _native


def test_native_builds_and_loads():
    lib = _native.get_lib()
    if lib is None:
        pytest.skip("no native toolchain available")
    assert lib.admm_native_version() == _native._EXPECTED_VERSION


def test_pack_beta_csc_matches_scipy():
    rng = np.random.default_rng(0)
    nlam, p = 12, 30
    coef = rng.normal(size=(nlam, p)) * (rng.uniform(size=(nlam, p)) < 0.3)
    beta0 = rng.normal(size=nlam)
    got = _native.pack_beta_csc(beta0, coef)
    dense = np.concatenate([beta0[:, None], coef], axis=1).T
    want = sparse.csc_matrix(dense)
    assert got.shape == (p + 1, nlam)
    np.testing.assert_allclose(got.toarray(), want.toarray(), atol=0)


def test_pack_beta_csc_single_lambda():
    got = _native.pack_beta_csc(np.array([1.5]),
                                np.array([[0.0, 2.0, 0.0]]))
    assert got.shape == (4, 1)
    np.testing.assert_allclose(got.toarray().ravel(), [1.5, 0, 2.0, 0])


@pytest.mark.parametrize("flag", [0, 1, 2, 3])
def test_standardize_host_matches_jax_standardize(flag):
    import jax.numpy as jnp
    from admm_tpu.data.standardize import standardize

    rng = np.random.default_rng(1)
    X = np.asfortranarray(rng.normal(2.0, 3.0, (50, 7)))
    y = np.ascontiguousarray(1.5 + X @ rng.uniform(size=7)
                             + rng.normal(size=50))
    Xj, yj, st = standardize(jnp.asarray(X), jnp.asarray(y),
                             standardize_x=bool(flag & 1),
                             intercept=bool(flag & 2))
    Xh, yh = X.copy(order="F"), y.copy()
    mean_x, scale_x, my, sy = _native.standardize_host(Xh, yh, flag)
    np.testing.assert_allclose(Xh, np.asarray(Xj), atol=1e-10)
    np.testing.assert_allclose(yh, np.asarray(yj), atol=1e-10)
    np.testing.assert_allclose(mean_x, np.asarray(st.mean_x), atol=1e-10)
    np.testing.assert_allclose(scale_x, np.asarray(st.scale_x), atol=1e-10)
    np.testing.assert_allclose(my, float(st.mean_y), atol=1e-10)
    np.testing.assert_allclose(sy, float(st.scale_y), atol=1e-10)


def test_host_standardize_large_mean_stable():
    """Host paths (native and NumPy fallback) use the two-pass variance
    with the relative guard, matching the device path for huge-mean
    columns (previously off by ~50x at mean 1e9)."""
    rng = np.random.default_rng(0)
    X = np.asfortranarray(rng.normal(loc=1e9, scale=1.0, size=(4000, 3)))
    y = rng.normal(size=4000)
    mean_x, scale_x, _, _ = _native.standardize_host(X.copy(order="F"),
                                                     y.copy(), 3)
    np.testing.assert_allclose(scale_x, [1.0, 1.0, 1.0], rtol=0.1)
    # constant column at a large value -> guard leaves it unscaled
    X2 = np.asfortranarray(np.ones((100, 2)) * 3e6)
    m2, s2, _, _ = _native.standardize_host(X2, np.arange(100.0), 3)
    np.testing.assert_array_equal(s2, [1.0, 1.0])
