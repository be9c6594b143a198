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


def test_multitask_kkt_conditions():
    """KKT at convergence for the multi-task mixed norm: active rows
    satisfy G_j = -lam B_j/||B_j||, inactive rows ||G_j|| <= lam, with
    G = X'(XB - Y)/n."""
    from admm_tpu.models.multitask import multitask_lasso_path

    rng = np.random.default_rng(61)
    n, p, K = 200, 15, 3
    B = np.zeros((p, K))
    B[:4] = rng.uniform(0.5, 1.5, (4, K)) * rng.choice([-1, 1], (4, K))
    X = rng.normal(size=(n, p))
    Y = X @ B + 0.3 * rng.normal(size=(n, K))
    lam = 0.15
    r = multitask_lasso_path(X, Y, lambdas=np.array([lam]),
                             standardize=False, intercept=False,
                             eps_abs=1e-8, eps_rel=1e-8)
    Bh = np.asarray(r.coef)[0]
    G = X.T @ (X @ Bh - Y) / n
    rn = np.linalg.norm(Bh, axis=1)
    act = rn > 1e-6
    # Active rows: gradient anti-parallel to the row at magnitude lam.
    for j in np.flatnonzero(act):
        np.testing.assert_allclose(G[j], -lam * Bh[j] / rn[j],
                                   atol=5e-4)
    # Inactive rows: subgradient bound.
    assert np.all(np.linalg.norm(G[~act], axis=1) <= lam * (1 + 1e-3))


def test_multinomial_kkt_conditions():
    """KKT for the ungrouped softmax l1 path (no intercept, raw scale):
    active entries G_jc = -lam sign(B_jc); inactive |G_jc| <= lam."""
    from admm_tpu.models.multinomial import multinomial_lasso_path

    rng = np.random.default_rng(62)
    n, p, C = 300, 12, 3
    Bt = np.zeros((p, C))
    Bt[:4] = rng.uniform(1.0, 2.0, (4, C)) * rng.choice([-1, 1], (4, C))
    X = rng.normal(size=(n, p))
    eta = X @ Bt
    pr = np.exp(eta - eta.max(axis=1, keepdims=True))
    pr /= pr.sum(axis=1, keepdims=True)
    y = np.array([rng.choice(C, p=pi) for pi in pr])
    lam = 0.02
    r = multinomial_lasso_path(X, y, lambdas=np.array([lam]),
                               standardize=False, intercept=False,
                               eps_abs=1e-8, eps_rel=1e-8)
    Bh = np.asarray(r.coef)[0]
    eh = X @ Bh
    ph = np.exp(eh - eh.max(axis=1, keepdims=True))
    ph /= ph.sum(axis=1, keepdims=True)
    Yoh = np.eye(C)[y]
    G = X.T @ (ph - Yoh) / n
    act = np.abs(Bh) > 1e-6
    np.testing.assert_allclose(G[act], -lam * np.sign(Bh[act]),
                               atol=5e-4)
    assert np.all(np.abs(G[~act]) <= lam * (1 + 1e-3))


def test_quantile_kkt_subgradient():
    """KKT for quantile regression: the subgradient of the check loss
    lies in [tau - 1, tau] per residual, so X' v = 0 for some selection
    v_i in that interval (v_i = tau - 1{r_i < 0} off the kink).  Checked
    via the directional-derivative test: perturbing each coefficient by
    ±h cannot decrease the pinball objective."""
    from admm_tpu.models.lad import quantile_fit

    rng = np.random.default_rng(63)
    n, p, tau = 300, 8, 0.7
    X = rng.normal(size=(n, p))
    y = 1.0 + X @ rng.uniform(size=p) + rng.gumbel(size=n)
    r = quantile_fit(X, y, tau=tau, eps_abs=1e-7, eps_rel=1e-7)
    b0, coef = float(r.beta0), np.asarray(r.coef)

    def pinball(b0_, c_):
        res = y - b0_ - X @ c_
        return np.sum(res * (tau - (res < 0)))

    base = pinball(b0, coef)
    h = 1e-4
    for j in range(p):
        e = np.zeros(p)
        e[j] = h
        assert pinball(b0, coef + e) >= base - 1e-4 * n * h
        assert pinball(b0, coef - e) >= base - 1e-4 * n * h
    assert pinball(b0 + h, coef) >= base - 1e-4 * n * h
    assert pinball(b0 - h, coef) >= base - 1e-4 * n * h


# ---------------------------------------------------------------------------
# Round-4/5 prox operators (VERDICT r4 item 8): sorted-l1, SVT,
# hinge / squared hinge, block shrinkage, asymmetric soft threshold.
# ---------------------------------------------------------------------------

sorted_vec = hnp.arrays(np.float64, st.integers(1, 25),
                        elements=st.floats(-50, 50, allow_nan=False,
                                           allow_infinity=False))


def _prox_objective(w, v, J):
    return 0.5 * np.sum((w - v) ** 2) + J(w)


@settings(max_examples=50, deadline=None)
@given(sorted_vec, st.floats(0.01, 5.0), st.integers(0, 10 ** 6))
def test_prox_sorted_l1_properties(v, scale, seed):
    """Sorted-l1 prox: exact agreement with the independent sklearn
    PAVA construction, prox optimality against random competitors,
    permutation/sign equivariance, nonexpansiveness."""
    from sklearn.isotonic import isotonic_regression

    from admm_tpu.models.slope import prox_sorted_l1

    rng = np.random.default_rng(seed)
    p = v.shape[0]
    lam = np.sort(rng.uniform(0.0, scale, size=p))[::-1]
    lam[0] = max(lam[0], 1e-3)

    def J(w):
        return np.sum(lam * np.sort(np.abs(w))[::-1])

    w = np.asarray(prox_sorted_l1(jnp.asarray(v), jnp.asarray(lam)))
    # Both isotonic backends give the same prox on every input.
    w_pava = np.asarray(prox_sorted_l1(jnp.asarray(v), jnp.asarray(lam),
                                       method="pava"))
    np.testing.assert_allclose(w_pava, w, rtol=1e-9, atol=1e-9)
    # Independent PAVA oracle.
    a = np.abs(v)
    o = np.argsort(-a, kind="stable")
    iso = np.maximum(isotonic_regression(a[o] - lam, increasing=False),
                     0.0)
    ref = np.zeros_like(v)
    ref[o] = iso
    ref *= np.sign(v)
    np.testing.assert_allclose(w, ref, rtol=1e-8, atol=1e-8)
    # Prox optimality: no random competitor does better.
    f_w = _prox_objective(w, v, J)
    for _ in range(5):
        cand = w + rng.normal(scale=0.3, size=p)
        assert f_w <= _prox_objective(cand, v, J) + 1e-9
    # Permutation and sign equivariance (the norm is symmetric).
    perm = rng.permutation(p)
    sgn = rng.choice([-1.0, 1.0], size=p)
    w2 = np.asarray(prox_sorted_l1(jnp.asarray(sgn * v[perm]),
                                   jnp.asarray(lam)))
    np.testing.assert_allclose(w2, sgn * w[perm], rtol=1e-8, atol=1e-8)
    # Nonexpansiveness.
    u = v + rng.normal(scale=0.5, size=p)
    wu = np.asarray(prox_sorted_l1(jnp.asarray(u), jnp.asarray(lam)))
    assert np.linalg.norm(wu - w) <= np.linalg.norm(u - v) + 1e-8


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 10), st.integers(2, 10), st.floats(0.05, 3.0),
       st.integers(0, 10 ** 6))
def test_svt_properties(m, n, tau, seed):
    """SVT: prox optimality for the nuclear norm against random
    competitors, left/right unitary equivariance, nonexpansiveness."""
    from scipy.stats import ortho_group

    from admm_tpu.models.rpca import svt

    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))

    def J(W):
        return tau * np.linalg.svd(W, compute_uv=False).sum()

    Z = np.asarray(svt(jnp.asarray(A), tau))
    f_Z = _prox_objective(Z, A, J)
    for _ in range(5):
        cand = Z + rng.normal(scale=0.2, size=(m, n))
        assert f_Z <= _prox_objective(cand, A, J) + 1e-8
    # Unitary equivariance: svt(U A V') = U svt(A) V'.
    U = ortho_group.rvs(m, random_state=int(seed % 2 ** 31))
    V = ortho_group.rvs(n, random_state=int(seed % 2 ** 31) + 1)
    Z2 = np.asarray(svt(jnp.asarray(U @ A @ V.T), tau))
    np.testing.assert_allclose(Z2, U @ Z @ V.T, rtol=1e-5, atol=1e-6)
    # Nonexpansiveness.
    B = A + rng.normal(scale=0.3, size=(m, n))
    ZB = np.asarray(svt(jnp.asarray(B), tau))
    assert (np.linalg.norm(ZB - Z) <= np.linalg.norm(B - A) + 1e-7)


@settings(max_examples=60, deadline=None)
@given(vec, pos)
def test_hinge_proxes_are_proxes(v, scale):
    """Hinge and squared-hinge proxes: closed forms minimize their
    defining objectives against dense grids of competitors."""
    from admm_tpu.models.svm import hinge_prox, sq_hinge_prox

    grid = np.linspace(-3, 3, 601)

    def check(prox, loss):
        z = np.asarray(prox(jnp.asarray(v.astype(np.float64)),
                            np.float64(scale)))
        for i in range(min(v.shape[0], 5)):
            obj = loss(grid) * scale + 0.5 * (grid - v[i]) ** 2
            f_z = loss(z[i]) * scale + 0.5 * (z[i] - v[i]) ** 2
            assert f_z <= obj.min() + 1e-4

    check(hinge_prox, lambda z: np.maximum(0.0, 1.0 - z))
    check(sq_hinge_prox, lambda z: np.maximum(0.0, 1.0 - z) ** 2)


@settings(max_examples=60, deadline=None)
@given(vec, pos)
def test_l2_prox_moreau_identity(v, tau):
    """Block shrinkage: prox of tau||.||_2 satisfies the EXACT Moreau
    decomposition v = prox(v) + proj_{tau-ball}(v) (the dual of the l2
    norm is the indicator of the l2 ball)."""
    from admm_tpu.models.sqrtlasso import l2_prox

    z = np.asarray(l2_prox(jnp.asarray(v.astype(np.float64)), np.float64(tau)))
    nv = np.linalg.norm(v)
    proj = v if nv <= tau else v * (tau / nv)
    np.testing.assert_allclose(z + proj, v, rtol=1e-7, atol=1e-7)


@settings(max_examples=60, deadline=None)
@given(vec, pos, pos)
def test_asym_soft_threshold_is_check_loss_prox(v, tp, tn):
    """The quantile r-prox minimizes its defining objective; with
    t_pos == t_neg it is the ordinary soft threshold."""
    from admm_tpu.models.lad import _asym_soft_threshold

    z = np.asarray(_asym_soft_threshold(jnp.asarray(v.astype(np.float64)),
                                        np.float64(tp), np.float64(tn)))
    grid = np.linspace(-4, 4, 801)

    def loss(r):
        return tp * np.maximum(r, 0.0) + tn * np.maximum(-r, 0.0)

    for i in range(min(v.shape[0], 5)):
        f_z = loss(z[i]) + 0.5 * (z[i] - v[i]) ** 2
        assert f_z <= (loss(grid) + 0.5 * (grid - v[i]) ** 2).min() + 1e-4
    sym = np.asarray(_asym_soft_threshold(jnp.asarray(v.astype(np.float64)),
                                          np.float64(tp), np.float64(tp)))
    np.testing.assert_allclose(
        sym, np.asarray(soft_threshold(jnp.asarray(v.astype(np.float64)),
                                       np.float64(tp))),
        rtol=1e-7, atol=1e-7)
