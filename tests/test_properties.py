"""Property-based tests (hypothesis) for the numerical building blocks.

The golden tests pin seeded configurations; these pin the algebraic
invariants that must hold for EVERY input: prox-operator identities,
standardization round-trips, and KKT optimality across random problems.
"""
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

import jax.numpy as jnp

from admm_tpu.core.prox import box_clamp_neg, enet_prox, soft_threshold
from admm_tpu.data.standardize import recover, standardize

finite_f = st.floats(np.float32(-1e6), np.float32(1e6), allow_nan=False,
                     allow_infinity=False, width=32)
vec = hnp.arrays(np.float32, st.integers(1, 40), elements=finite_f)
pos = st.floats(np.float32(1e-6), np.float32(1e4), allow_nan=False,
                allow_infinity=False, width=32)


@settings(max_examples=60, deadline=None)
@given(vec, pos)
def test_soft_threshold_properties(v, pen):
    out = np.asarray(soft_threshold(jnp.asarray(v), pen))
    # shrinkage: |out| <= max(|v| - pen, 0), elementwise
    np.testing.assert_allclose(np.abs(out),
                               np.maximum(np.abs(v) - pen, 0.0),
                               rtol=1e-5, atol=1e-5)
    # sign preservation on the survivors
    nz = out != 0
    assert np.all(np.sign(out[nz]) == np.sign(v[nz]))
    # non-expansiveness: ||prox(u) - prox(v)|| <= ||u - v||
    u = v + 0.5
    out_u = np.asarray(soft_threshold(jnp.asarray(u), pen))
    assert (np.linalg.norm(out_u - out)
            <= np.linalg.norm(u - v) + 1e-3)


@settings(max_examples=60, deadline=None)
@given(vec, pos, st.floats(0.0, 1.0, width=32))
def test_enet_prox_is_scaled_soft_threshold(v, pen, alpha):
    out = np.asarray(enet_prox(jnp.asarray(v), pen, alpha))
    expect = np.asarray(soft_threshold(jnp.asarray(v), alpha * pen))
    expect = expect / (1.0 + pen * (1.0 - alpha))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(vec, pos)
def test_box_clamp_neg_bounds(v, lam):
    """z = -clip(v, -lam, lam): always within [-lam, lam] and equal to
    -v wherever |v| <= lam (reference: src/TODO/ADMMDantzig.h:164-181)."""
    out = np.asarray(box_clamp_neg(jnp.asarray(v), lam))
    assert np.all(np.abs(out) <= lam * (1 + 1e-6))
    inside = np.abs(v) <= lam
    np.testing.assert_allclose(out[inside], -v[inside], rtol=1e-6,
                               atol=1e-7)


@settings(max_examples=30, deadline=None)
@given(st.integers(3, 30), st.integers(1, 8),
       st.booleans(), st.booleans(), st.integers(0, 2**31 - 1))
def test_standardize_recover_roundtrip(n, p, std, icpt, seed):
    """recover() must undo standardize() exactly: a linear model fitted
    on the transformed data maps back to the same predictions."""
    rng = np.random.default_rng(seed)
    X = np.asarray(rng.normal(size=(n, p)) * rng.uniform(0.5, 3.0)
                   + rng.uniform(-5, 5), np.float64)
    beta = rng.normal(size=p)
    y = X @ beta + rng.normal(size=n)
    Xs, ys, stats = standardize(jnp.asarray(X), jnp.asarray(y),
                                standardize_x=std, intercept=icpt)
    # Exact least-squares coefficients on the transformed problem...
    coef_s, *_ = np.linalg.lstsq(np.asarray(Xs), np.asarray(ys),
                                 rcond=None)
    beta0, coef = recover(stats, jnp.asarray(coef_s), standardize_x=std,
                          intercept=icpt)
    # ...must predict y on the ORIGINAL scale exactly as the transformed
    # model predicts ys (up to the same linear map).
    pred = float(beta0) + X @ np.asarray(coef)
    pred_s = np.asarray(Xs) @ coef_s * float(stats.scale_y) \
        + float(stats.mean_y)
    np.testing.assert_allclose(pred, pred_s, rtol=1e-8, atol=1e-6)
