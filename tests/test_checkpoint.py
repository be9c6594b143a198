"""Checkpoint/resume of lambda-path solves (admm_tpu.diag.checkpoint).

The reference's only resume primitive is the in-process warm start
(reference: src/ADMMLassoTall.h:219-230); here the same chain is cut at
chunk boundaries and persisted, so a killed run resumes bit-exactly.
"""
import os

import numpy as np
import pytest

from admm_tpu.core.engine import make_state
from admm_tpu.diag.checkpoint import (checkpointed_lasso_path, load_pytree,
                                      save_pytree)
from admm_tpu.models.lasso import lasso_path


def _problem(n=300, p=25, seed=7):
    rng = np.random.default_rng(seed)
    b = rng.uniform(size=p) * (rng.uniform(size=p) < 0.5)
    X = rng.normal(size=(n, p))
    y = 1.5 + X @ b + 0.3 * rng.normal(size=n)
    return X, y


def _lams():
    return np.geomspace(0.5, 0.005, 20)


def test_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp

    st = make_state(jnp.arange(4.0), jnp.ones(4), jnp.zeros(4), 1.0, 0.1)
    f = str(tmp_path / "st.npz")
    save_pytree(f, st, tag=np.asarray(42))
    st2, extras = load_pytree(f, st)
    assert int(extras["tag"]) == 42
    for a, b in zip(
            __import__("jax").tree.leaves(st, is_leaf=lambda x: x is None),
            __import__("jax").tree.leaves(st2, is_leaf=lambda x: x is None)):
        if a is None:
            assert b is None
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uninterrupted_checkpoint_matches_plain_path(tmp_path):
    X, y = _problem()
    lams = _lams()
    ck = str(tmp_path / "run.npz")
    res = checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                  chunk_size=7)
    plain = lasso_path(X, y, lambdas=lams)
    # The chunked driver standardizes outside the single-program jit, so
    # f32 rounding can shift an iteration count by one; coefficients agree.
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-5)
    assert np.max(np.abs(np.asarray(res.niter)
                         - np.asarray(plain.niter))) <= 1
    import os
    assert not os.path.exists(ck)  # cleaned up on success


def test_crash_and_resume_identical(tmp_path):
    X, y = _problem()
    lams = _lams()
    ck = str(tmp_path / "run.npz")
    # Simulated crash after 1 chunk (7 of 20 lambdas done).
    out = checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                  chunk_size=7, _stop_after_chunks=1)
    assert out is None
    import os
    assert os.path.exists(ck)
    # Resume and finish.
    res = checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                  chunk_size=7)
    # The resumed run must be bit-identical to an uninterrupted
    # checkpointed run (same code path, same chunk boundaries).
    full = checkpointed_lasso_path(X, y, lambdas=lams,
                                   checkpoint=str(ck) + ".2",
                                   chunk_size=7)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(full.niter))


def test_resume_wide_regime(tmp_path):
    X, y = _problem(n=40, p=80)
    lams = np.geomspace(0.3, 0.01, 12)
    ck = str(tmp_path / "wide.npz")
    assert checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                   chunk_size=5,
                                   _stop_after_chunks=1) is None
    res = checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                  chunk_size=5)
    full = checkpointed_lasso_path(X, y, lambdas=lams,
                                   checkpoint=str(ck) + ".2",
                                   chunk_size=5)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = lasso_path(X, y, lambdas=lams)
    # Same solutions to within the ADMM stopping tolerance (the chunked
    # driver's out-of-jit standardization perturbs iterates in the last
    # f32 bit, which the linearized wide updates amplify to ~1e-4).
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-3)


def test_refuses_foreign_checkpoint(tmp_path):
    X, y = _problem()
    lams = _lams()
    ck = str(tmp_path / "run.npz")
    assert checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                   chunk_size=7,
                                   _stop_after_chunks=1) is None
    X2, y2 = _problem(seed=99)
    with pytest.raises(ValueError, match="different"):
        checkpointed_lasso_path(X2, y2, lambdas=lams, checkpoint=ck,
                                chunk_size=7)


def test_fingerprint_detects_interior_row_change(tmp_path):
    """A change to any interior row of X (with standardize_x=False, so
    the standardized matrix is X itself) must refuse to resume — the
    fingerprint hashes the full data, not a sample."""
    X, y = _problem()
    lams = _lams()
    ck = str(tmp_path / "row.npz")
    assert checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                   chunk_size=7, standardize_x=False,
                                   _stop_after_chunks=1) is None
    X2 = X.copy()
    X2[137, 11] += 1.0  # interior entry, first row untouched
    with pytest.raises(ValueError, match="different"):
        checkpointed_lasso_path(X2, y, lambdas=lams, checkpoint=ck,
                                chunk_size=7, standardize_x=False)


def test_fingerprint_detects_interior_grid_change(tmp_path):
    """Two grids with the same endpoints and count but different interior
    spacing must not share a checkpoint."""
    X, y = _problem()
    geo = np.geomspace(0.5, 0.005, 20)
    lin = np.linspace(0.5, 0.005, 20)
    ck = str(tmp_path / "grid.npz")
    assert checkpointed_lasso_path(X, y, lambdas=geo, checkpoint=ck,
                                   chunk_size=7,
                                   _stop_after_chunks=1) is None
    with pytest.raises(ValueError, match="different"):
        checkpointed_lasso_path(X, y, lambdas=lin, checkpoint=ck,
                                chunk_size=7)


def test_validates_chunk_size_and_lambdas(tmp_path):
    X, y = _problem(n=60, p=10)
    ck = str(tmp_path / "bad.npz")
    with pytest.raises(ValueError, match="chunk_size"):
        checkpointed_lasso_path(X, y, lambdas=_lams(), checkpoint=ck,
                                chunk_size=0)
    with pytest.raises(ValueError, match="non-empty"):
        checkpointed_lasso_path(X, y, lambdas=np.array([]), checkpoint=ck,
                                chunk_size=5)


def test_refuses_different_options(tmp_path):
    """Options that change solver behavior (here the Enet lambda0
    inflation flag) must invalidate a checkpoint."""
    X, y = _problem(n=40, p=80)
    lams = np.geomspace(0.3, 0.01, 12)
    ck = str(tmp_path / "opt.npz")
    assert checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                   chunk_size=5, _enet_scale=True,
                                   _stop_after_chunks=1) is None
    with pytest.raises(ValueError, match="different"):
        checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                chunk_size=5, _enet_scale=False)


def test_dantzig_crash_resume(tmp_path):
    """VERDICT item: checkpoint/resume extended to the Dantzig path —
    crash-resume is bit-identical to an uninterrupted chunked run."""
    from admm_tpu.diag.checkpoint import checkpointed_dantzig_path
    from admm_tpu.models.dantzig import dantzig_path

    X, y = _problem(n=150, p=20)
    lams = np.geomspace(0.4, 0.02, 12)
    ck = str(tmp_path / "dz.npz")
    assert checkpointed_dantzig_path(X, y, lambdas=lams, checkpoint=ck,
                                     chunk_size=5,
                                     _stop_after_chunks=1) is None
    res = checkpointed_dantzig_path(X, y, lambdas=lams, checkpoint=ck,
                                    chunk_size=5)
    full = checkpointed_dantzig_path(X, y, lambdas=lams,
                                     checkpoint=str(ck) + ".2",
                                     chunk_size=5)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(full.niter))
    plain = dantzig_path(X, y, lambdas=lams)
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-3)


def test_group_lasso_crash_resume_and_group_fingerprint(tmp_path):
    from admm_tpu.diag.checkpoint import checkpointed_group_lasso_path
    from admm_tpu.models.grouplasso import group_lasso_path

    rng = np.random.default_rng(11)
    n, p = 200, 16
    groups = np.arange(p) % 4
    b = np.zeros(p)
    b[groups == 1] = 1.5
    X = rng.normal(size=(n, p))
    y = X @ b + 0.3 * rng.normal(size=n)
    lams = np.geomspace(0.5, 0.01, 12)
    ck = str(tmp_path / "gl.npz")
    assert checkpointed_group_lasso_path(
        X, y, groups, lambdas=lams, checkpoint=ck, chunk_size=5,
        _stop_after_chunks=1) is None
    # A DIFFERENT grouping must refuse to resume (groups are part of the
    # fingerprint).
    with pytest.raises(ValueError, match="different"):
        checkpointed_group_lasso_path(X, y, (np.arange(p) % 2),
                                      lambdas=lams, checkpoint=ck,
                                      chunk_size=5)
    res = checkpointed_group_lasso_path(X, y, groups, lambdas=lams,
                                        checkpoint=ck, chunk_size=5)
    full = checkpointed_group_lasso_path(X, y, groups, lambdas=lams,
                                         checkpoint=str(ck) + ".2",
                                         chunk_size=5)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = group_lasso_path(X, y, groups, lambdas=lams)
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-3)


def test_consensus_crash_resume(tmp_path):
    """Consensus checkpoint: the (x, y, z, rho) worker state is gathered
    at chunk boundaries and re-sharded on resume; a resumed run is
    bit-identical to an uninterrupted chunked run and matches the plain
    consensus path."""
    from admm_tpu.diag.checkpoint import checkpointed_parallel_lasso_path
    from admm_tpu.parallel.consensus import parallel_lasso_path

    X, y = _problem(n=320, p=24)
    lams = np.geomspace(0.5, 0.01, 12)
    ck = str(tmp_path / "par.npz")
    kw = dict(lambdas=lams, nworkers=8, chunk_size=5)
    assert checkpointed_parallel_lasso_path(
        X, y, checkpoint=ck, _stop_after_chunks=1, **kw) is None
    res = checkpointed_parallel_lasso_path(X, y, checkpoint=ck, **kw)
    full = checkpointed_parallel_lasso_path(
        X, y, checkpoint=str(ck) + ".2", **kw)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(full.niter))
    plain = parallel_lasso_path(X, y, lambdas=lams, nworkers=8)
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=2e-3)


def test_fingerprint_digest_compared_exactly(tmp_path):
    """A digest lane differing by one ulp of a ~1e19 float — far inside
    np.allclose's default rtol — must refuse to resume (advisor r2:
    allclose discarded ~47 bits per digest lane)."""
    X, y = _problem()
    lams = _lams()
    ck = str(tmp_path / "digest.npz")
    assert checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                   chunk_size=7,
                                   _stop_after_chunks=1) is None
    with np.load(ck) as d:
        payload = {k: d[k] for k in d.files}
    fp = payload["fingerprint"].copy()
    fp[-1] = np.nextafter(fp[-1], np.inf)
    payload["fingerprint"] = fp
    np.savez(ck, **payload)
    with pytest.raises(ValueError, match="different"):
        checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                chunk_size=7)


def test_glm_crash_and_resume_identical(tmp_path):
    """Checkpoint/resume for the GLM paths (VERDICT r2 missing #4):
    crash after 1 chunk, resume, compare bit-exactly to an
    uninterrupted checkpointed run — binomial and huber (fixed
    majorizer) plus poisson (exact Hessian)."""
    from admm_tpu.diag.checkpoint import checkpointed_glm_path
    from admm_tpu.models.glm import binomial, glm_lasso_path, poisson

    rng = np.random.default_rng(13)
    n, p = 200, 12
    b = np.concatenate([[1.5, -1.0], np.zeros(p - 2)])
    X = rng.normal(size=(n, p))
    for fam, y in (
            (binomial(), (rng.uniform(size=n)
                          < 1 / (1 + np.exp(-(X @ b)))).astype(float)),
            (poisson(), rng.poisson(np.exp(0.2 * (X @ b)))
             .astype(float))):
        lams = np.geomspace(0.1, 0.005, 12)
        ck = str(tmp_path / f"glm-{fam.name}.npz")
        out = checkpointed_glm_path(X, y, fam, lambdas=lams,
                                    checkpoint=ck, chunk_size=5,
                                    _stop_after_chunks=1)
        assert out is None
        res = checkpointed_glm_path(X, y, fam, lambdas=lams,
                                    checkpoint=ck, chunk_size=5)
        full = checkpointed_glm_path(X, y, fam, lambdas=lams,
                                     checkpoint=ck + ".2", chunk_size=5)
        np.testing.assert_array_equal(np.asarray(res.coef),
                                      np.asarray(full.coef))
        np.testing.assert_array_equal(np.asarray(res.niter),
                                      np.asarray(full.niter))
        # And the chunked chain agrees with the plain scan path (the
        # checkpointed driver cuts the warm-start chain, so compare
        # against the scan protocol, not the batch default — and
        # against the SAME hessian engine: checkpointing resolves auto
        # to exact for unbounded families, while the plain poisson path
        # defaults to the adaptive majorizer).
        hess = "fixed" if fam.curvature_bound is not None else "exact"
        plain = glm_lasso_path(X, y, fam, lambdas=lams,
                               path_mode="scan", hessian=hess)
        np.testing.assert_allclose(np.asarray(res.coef),
                                   np.asarray(plain.coef), atol=1e-5)


def test_glm_checkpoint_refuses_different_family_or_weights(tmp_path):
    from admm_tpu.diag.checkpoint import checkpointed_glm_path
    from admm_tpu.models.glm import binomial, huber

    rng = np.random.default_rng(14)
    n, p = 120, 8
    X = rng.normal(size=(n, p))
    y = (rng.uniform(size=n) < 0.5).astype(float)
    lams = np.geomspace(0.1, 0.01, 8)
    ck = str(tmp_path / "fam.npz")
    assert checkpointed_glm_path(X, y, binomial(), lambdas=lams,
                                 checkpoint=ck, chunk_size=4,
                                 _stop_after_chunks=1) is None
    with pytest.raises(ValueError, match="different"):
        checkpointed_glm_path(X, y, huber(1.345), lambdas=lams,
                              checkpoint=ck, chunk_size=4)
    with pytest.raises(ValueError, match="different"):
        checkpointed_glm_path(X, y, binomial(), lambdas=lams,
                              checkpoint=ck, chunk_size=4,
                              weights=rng.uniform(0.5, 2.0, n))


def test_genlasso_crash_and_resume_identical(tmp_path):
    from admm_tpu.diag.checkpoint import checkpointed_gen_lasso_path
    from admm_tpu.models.genlasso import (difference_matrix,
                                          gen_lasso_path)

    rng = np.random.default_rng(15)
    n, p = 150, 12
    X = rng.normal(size=(n, p))
    bstep = np.repeat([1.0, -0.5, 0.8], 4)
    y = 0.5 + X @ bstep + 0.3 * rng.normal(size=n)
    D = difference_matrix(p, 1)
    lams = np.geomspace(0.2, 0.01, 12)
    ck = str(tmp_path / "gen.npz")
    assert checkpointed_gen_lasso_path(X, y, D, lambdas=lams,
                                       checkpoint=ck, chunk_size=5,
                                       _stop_after_chunks=1) is None
    res = checkpointed_gen_lasso_path(X, y, D, lambdas=lams,
                                      checkpoint=ck, chunk_size=5)
    full = checkpointed_gen_lasso_path(X, y, D, lambdas=lams,
                                       checkpoint=ck + ".2",
                                       chunk_size=5)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = gen_lasso_path(X, y, D, lambdas=lams, path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-5)
    # A different D must refuse to resume.
    assert checkpointed_gen_lasso_path(X, y, D, lambdas=lams,
                                       checkpoint=ck + ".3",
                                       chunk_size=5,
                                       _stop_after_chunks=1) is None
    with pytest.raises(ValueError, match="different"):
        checkpointed_gen_lasso_path(X, y, difference_matrix(p, 2),
                                    lambdas=lams, checkpoint=ck + ".3",
                                    chunk_size=5)


def test_multitask_and_multinomial_crash_and_resume(tmp_path):
    """Checkpoint/resume for the matrix-variable families: crash after
    one chunk, resume, compare bit-exactly to an uninterrupted
    checkpointed run and (to tolerance) to the plain scan path."""
    from admm_tpu.diag.checkpoint import (checkpointed_multinomial_path,
                                          checkpointed_multitask_lasso_path)
    from admm_tpu.models.multinomial import multinomial_lasso_path
    from admm_tpu.models.multitask import multitask_lasso_path

    rng = np.random.default_rng(23)
    n, p, K = 150, 10, 3
    B = np.zeros((p, K))
    B[:3] = rng.uniform(0.5, 1.5, (3, K))
    X = rng.normal(size=(n, p))
    Y = X @ B + 0.3 * rng.normal(size=(n, K))
    lams = np.geomspace(0.3, 0.01, 12)
    ck = str(tmp_path / "mt.npz")
    assert checkpointed_multitask_lasso_path(
        X, Y, lambdas=lams, checkpoint=ck, chunk_size=5,
        _stop_after_chunks=1) is None
    res = checkpointed_multitask_lasso_path(X, Y, lambdas=lams,
                                            checkpoint=ck, chunk_size=5)
    full = checkpointed_multitask_lasso_path(X, Y, lambdas=lams,
                                             checkpoint=ck + ".2",
                                             chunk_size=5)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = multitask_lasso_path(X, Y, lambdas=lams, path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-5)

    ylab = rng.integers(0, 3, n)
    lamsn = np.geomspace(0.1, 0.01, 10)
    ck2 = str(tmp_path / "mn.npz")
    assert checkpointed_multinomial_path(
        X, ylab, lambdas=lamsn, checkpoint=ck2, chunk_size=4,
        _stop_after_chunks=1) is None
    resn = checkpointed_multinomial_path(X, ylab, lambdas=lamsn,
                                         checkpoint=ck2, chunk_size=4)
    fulln = checkpointed_multinomial_path(X, ylab, lambdas=lamsn,
                                          checkpoint=ck2 + ".2",
                                          chunk_size=4)
    np.testing.assert_array_equal(np.asarray(resn.coef),
                                  np.asarray(fulln.coef))
    plainn = multinomial_lasso_path(X, ylab, lambdas=lamsn,
                                    path_mode="scan")
    np.testing.assert_allclose(np.asarray(resn.coef),
                               np.asarray(plainn.coef), atol=1e-5)
    # A grouped-flag change must refuse to resume.
    assert checkpointed_multinomial_path(
        X, ylab, lambdas=lamsn, checkpoint=ck2 + ".3", chunk_size=4,
        _stop_after_chunks=1) is None
    with pytest.raises(ValueError, match="different"):
        checkpointed_multinomial_path(X, ylab, lambdas=lamsn,
                                      checkpoint=ck2 + ".3",
                                      chunk_size=4, grouped=True)


def test_cox_crash_and_resume_identical(tmp_path):
    """Cox checkpoint: crash-resume bit-exactness, agreement with the
    plain scan path, and the start-stop variant; risk-set-defining
    times are fingerprinted."""
    from admm_tpu.diag.checkpoint import checkpointed_cox_path
    from admm_tpu.models.cox import cox_lasso_path

    rng = np.random.default_rng(21)
    n, p = 120, 8
    X = rng.normal(size=(n, p))
    b = np.concatenate([[0.8, -0.6], np.zeros(p - 2)])
    t = rng.exponential(np.exp(-(X @ b)))
    d = (rng.uniform(size=n) < 0.75).astype(float)
    lams = np.exp(np.linspace(np.log(0.2), np.log(0.01), 8))
    for kw in ({}, {"start": t * rng.uniform(0, 0.7, n)}):
        ck = str(tmp_path / f"cox{len(kw)}.npz")
        out = checkpointed_cox_path(X, t, d, lambdas=lams,
                                    checkpoint=ck, chunk_size=3,
                                    _stop_after_chunks=1, **kw)
        assert out is None and os.path.exists(ck)
        res = checkpointed_cox_path(X, t, d, lambdas=lams,
                                    checkpoint=ck, chunk_size=3, **kw)
        ck2 = str(tmp_path / f"cox{len(kw)}-full.npz")
        full = checkpointed_cox_path(X, t, d, lambdas=lams,
                                     checkpoint=ck2, chunk_size=3, **kw)
        np.testing.assert_array_equal(np.asarray(res.coef),
                                      np.asarray(full.coef))
        np.testing.assert_array_equal(np.asarray(res.niter),
                                      np.asarray(full.niter))
        plain = cox_lasso_path(X, t, d, lambdas=lams, **kw)
        np.testing.assert_allclose(np.asarray(res.coef),
                                   np.asarray(plain.coef), atol=1e-5)
    # Different survival times (same X, d) must be refused — the
    # sorted times define the risk sets and enter the fingerprint.
    ck = str(tmp_path / "cox-partial.npz")
    checkpointed_cox_path(X, t, d, lambdas=lams, checkpoint=ck,
                          chunk_size=3, _stop_after_chunks=1)
    t2 = t.copy()
    t2[0] *= 2.0
    with pytest.raises(ValueError, match="different"):
        checkpointed_cox_path(X, t2, d, lambdas=lams, checkpoint=ck,
                              chunk_size=3)


def test_glasso_crash_and_resume_identical(tmp_path):
    """Graphical-lasso checkpoint: crash-resume bit-exactness (the
    adaptive rho rides the saved state), agreement with the plain scan
    path, and penalty-convention fingerprinting."""
    from admm_tpu.diag.checkpoint import checkpointed_glasso_path
    from admm_tpu.models.glasso import glasso_path

    rng = np.random.default_rng(31)
    A = rng.normal(size=(200, 10))
    S = A.T @ A / 200 + np.eye(10)
    lams = np.geomspace(0.5, 0.02, 8)
    ck = str(tmp_path / "gl.npz")
    out = checkpointed_glasso_path(cov=S, lambdas=lams, checkpoint=ck,
                                   chunk_size=3, _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_glasso_path(cov=S, lambdas=lams, checkpoint=ck,
                                   chunk_size=3)
    full = checkpointed_glasso_path(cov=S, lambdas=lams,
                                    checkpoint=str(tmp_path / "gl2.npz"),
                                    chunk_size=3)
    np.testing.assert_array_equal(np.asarray(res.precision),
                                  np.asarray(full.precision))
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(full.niter))
    plain = glasso_path(cov=S, lambdas=lams, path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.precision),
                               np.asarray(plain.precision), atol=2e-5)
    # The penalty convention is part of the problem identity.
    ck3 = str(tmp_path / "gl3.npz")
    checkpointed_glasso_path(cov=S, lambdas=lams, checkpoint=ck3,
                             chunk_size=3, _stop_after_chunks=1)
    with pytest.raises(ValueError, match="different"):
        checkpointed_glasso_path(cov=S, lambdas=lams, checkpoint=ck3,
                                 chunk_size=3, penalize_diagonal=True)


def test_svm_crash_and_resume_identical(tmp_path):
    """SVM checkpoint: crash-resume bit-exactness and agreement with
    the one-shot scan path; the loss tag is fingerprinted."""
    from admm_tpu.diag.checkpoint import checkpointed_svm_path
    from admm_tpu.models.svm import svm_path

    rng = np.random.default_rng(32)
    X = rng.normal(size=(150, 12))
    y = (X @ rng.normal(size=12) > 0).astype(int)
    Cs = np.geomspace(2.0, 0.02, 9)
    ck = str(tmp_path / "svm.npz")
    out = checkpointed_svm_path(X, y, Cs=Cs, checkpoint=ck,
                                chunk_size=4, _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_svm_path(X, y, Cs=Cs, checkpoint=ck, chunk_size=4)
    full = checkpointed_svm_path(X, y, Cs=Cs,
                                 checkpoint=str(tmp_path / "svm2.npz"),
                                 chunk_size=4)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.intercept),
                                  np.asarray(full.intercept))
    plain = svm_path(X, y, Cs=Cs, path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.intercept),
                               np.asarray(plain.intercept), atol=1e-5)
    ck3 = str(tmp_path / "svm3.npz")
    checkpointed_svm_path(X, y, Cs=Cs, checkpoint=ck3, chunk_size=4,
                          _stop_after_chunks=1)
    with pytest.raises(ValueError, match="different"):
        checkpointed_svm_path(X, y, Cs=Cs, checkpoint=ck3, chunk_size=4,
                              loss="hinge")


def test_slope_crash_and_resume_identical(tmp_path):
    """SLOPE checkpoint: crash-resume bit-exactness, one-shot scan
    agreement, and the penalty-sequence fingerprint."""
    from admm_tpu.diag.checkpoint import checkpointed_slope_path
    from admm_tpu.models.slope import bh_sequence, slope_path

    rng = np.random.default_rng(41)
    X = rng.normal(size=(150, 12))
    y = X[:, :3] @ np.array([2.0, -1.0, 1.0]) + 0.3 * rng.normal(size=150)
    ts = np.geomspace(0.3, 0.01, 9)
    ck = str(tmp_path / "sl.npz")
    out = checkpointed_slope_path(X, y, lambdas=ts, checkpoint=ck,
                                  chunk_size=4, _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_slope_path(X, y, lambdas=ts, checkpoint=ck,
                                  chunk_size=4)
    full = checkpointed_slope_path(X, y, lambdas=ts,
                                   checkpoint=str(tmp_path / "sl2.npz"),
                                   chunk_size=4)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = slope_path(X, y, lambdas=ts, path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-5)
    ck3 = str(tmp_path / "sl3.npz")
    checkpointed_slope_path(X, y, lambdas=ts, checkpoint=ck3,
                            chunk_size=4, _stop_after_chunks=1)
    with pytest.raises(ValueError, match="different"):
        checkpointed_slope_path(X, y, lambdas=ts, checkpoint=ck3,
                                chunk_size=4,
                                lam_seq=bh_sequence(12, 0.3))


def test_checkpointed_svm_carries_class_labels(tmp_path):
    """Review fix: predict(type='class') on a checkpointed SVM fit must
    map back to the ORIGINAL labels (it silently returned -1/+1)."""
    from admm_tpu.diag.checkpoint import checkpointed_svm_path
    from admm_tpu.predict import predict

    rng = np.random.default_rng(33)
    X = rng.normal(size=(80, 6))
    y = np.where(X @ rng.normal(size=6) > 0, 7, 2)
    res = checkpointed_svm_path(X, y, Cs=[1.0, 0.1],
                                checkpoint=str(tmp_path / "s.npz"),
                                chunk_size=1)
    lab = predict(res, X, type="class", lam=1.0)
    assert set(np.unique(lab)) <= {2, 7}


def test_sqrt_lasso_crash_and_resume_identical(tmp_path):
    """The concomitant chain's (state, sigma) carry persists across
    chunks: resumed == uninterrupted bit-exactly, and both match the
    one-shot scan path."""
    from admm_tpu.diag.checkpoint import checkpointed_sqrt_lasso_path
    from admm_tpu.models.sqrtlasso import sqrt_lasso_path

    X, y = _problem()
    lams = np.geomspace(0.3, 0.01, 9)
    ck = str(tmp_path / "sq.npz")
    out = checkpointed_sqrt_lasso_path(X, y, lambdas=lams,
                                       checkpoint=ck, chunk_size=4,
                                       _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_sqrt_lasso_path(X, y, lambdas=lams,
                                       checkpoint=ck, chunk_size=4)
    full = checkpointed_sqrt_lasso_path(
        X, y, lambdas=lams, checkpoint=str(tmp_path / "sq2.npz"),
        chunk_size=4)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(full.niter))
    plain = sqrt_lasso_path(X, y, lambdas=lams, path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=2e-5)


def test_constrained_lasso_crash_and_resume_identical(tmp_path):
    from admm_tpu.diag.checkpoint import \
        checkpointed_constrained_lasso_path
    from admm_tpu.models.conlasso import constrained_lasso_path

    X, y = _problem(n=200, p=15)
    C = np.ones((1, 15))
    lams = np.geomspace(0.2, 0.005, 8)
    ck = str(tmp_path / "cl.npz")
    out = checkpointed_constrained_lasso_path(
        X, y, C, lambdas=lams, checkpoint=ck, chunk_size=3,
        _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_constrained_lasso_path(
        X, y, C, lambdas=lams, checkpoint=ck, chunk_size=3)
    full = checkpointed_constrained_lasso_path(
        X, y, C, lambdas=lams, checkpoint=str(tmp_path / "cl2.npz"),
        chunk_size=3)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = constrained_lasso_path(X, y, C, lambdas=lams,
                                   path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=2e-5)
    # Zero-sum constraint holds along the whole resumed path.
    assert np.abs(np.asarray(res.coef).sum(axis=1)).max() < 1e-3
    # A different constraint matrix refuses to resume.
    ck3 = str(tmp_path / "cl3.npz")
    checkpointed_constrained_lasso_path(
        X, y, C, lambdas=lams, checkpoint=ck3, chunk_size=3,
        _stop_after_chunks=1)
    with pytest.raises(ValueError, match="different"):
        checkpointed_constrained_lasso_path(
            X, y, 2.0 * C, lambdas=lams, checkpoint=ck3, chunk_size=3)


def test_relaxed_lasso_crash_and_resume_identical(tmp_path):
    from admm_tpu.diag.checkpoint import checkpointed_relaxed_lasso_path
    from admm_tpu.models.relaxed import relaxed_lasso_path

    X, y = _problem()
    lams = np.geomspace(0.4, 0.02, 9)
    ck = str(tmp_path / "rl.npz")
    out = checkpointed_relaxed_lasso_path(X, y, lambdas=lams,
                                          checkpoint=ck, chunk_size=4,
                                          _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_relaxed_lasso_path(X, y, lambdas=lams,
                                          checkpoint=ck, chunk_size=4)
    full = checkpointed_relaxed_lasso_path(
        X, y, lambdas=lams, checkpoint=str(tmp_path / "rl2.npz"),
        chunk_size=4)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.refit_coef),
                                  np.asarray(full.refit_coef))
    plain = relaxed_lasso_path(X, y, lambdas=lams)
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=2e-4)
    # gamma = 1 lane reproduces the lasso lane of the plain fit.
    np.testing.assert_allclose(np.asarray(res.coef[-1]),
                               np.asarray(res.fit.coef), atol=1e-6)


def test_rpca_crash_and_resume_identical(tmp_path):
    from admm_tpu.diag.checkpoint import checkpointed_rpca_path
    from admm_tpu.models.rpca import rpca_path

    rng = np.random.default_rng(21)
    L0 = rng.normal(size=(40, 3)) @ rng.normal(size=(3, 30))
    S0 = np.zeros((40, 30))
    idx = rng.uniform(size=(40, 30)) < 0.08
    S0[idx] = 8 * rng.choice([-1.0, 1.0], size=idx.sum())
    M = L0 + S0
    lams = np.geomspace(3, 1 / 3, 6) / np.sqrt(40)
    ck = str(tmp_path / "rp.npz")
    out = checkpointed_rpca_path(M, lambdas=lams, checkpoint=ck,
                                 chunk_size=2, _stop_after_chunks=1,
                                 maxit=2000)
    assert out is None and os.path.exists(ck)
    res = checkpointed_rpca_path(M, lambdas=lams, checkpoint=ck,
                                 chunk_size=2, maxit=2000)
    full = checkpointed_rpca_path(M, lambdas=lams,
                                  checkpoint=str(tmp_path / "rp2.npz"),
                                  chunk_size=2, maxit=2000)
    np.testing.assert_array_equal(np.asarray(res.low_rank),
                                  np.asarray(full.low_rank))
    np.testing.assert_array_equal(np.asarray(res.sparse),
                                  np.asarray(full.sparse))
    plain = rpca_path(M, lambdas=lams, maxit=2000)
    np.testing.assert_allclose(np.asarray(res.low_rank),
                               np.asarray(plain.low_rank), atol=1e-4)
    # Partial-SVT variant checkpoints too (warm basis in the state).
    # rank= must upper-bound the SOLUTION rank, so test on the
    # lam <= lam* slice of the grid where the plant (rank 3) is the
    # solution — above lam* the sparse part empties and L approaches
    # the (full-rank) data matrix; far below lam* the solve itself is
    # degenerate (both solvers run to maxit).
    star = 1.0 / np.sqrt(40)
    lo = lams[(lams <= star + 1e-12) & (lams >= 0.6 * star)]
    ck4 = str(tmp_path / "rp4.npz")
    part = checkpointed_rpca_path(M, lambdas=lo, checkpoint=ck4,
                                  chunk_size=2, rank=3, maxit=20000)
    plain_lo = rpca_path(M, lambdas=lo, maxit=20000)
    np.testing.assert_allclose(np.asarray(part.low_rank),
                               np.asarray(plain_lo.low_rank), atol=1e-3)


def test_quantile_crash_and_resume_identical(tmp_path):
    """The tau-lane scan chain persists across chunks: resumed ==
    uninterrupted bit-exactly, and both match the one-shot scan."""
    from admm_tpu.diag.checkpoint import checkpointed_quantile_lasso_path
    from admm_tpu.models.quantile import quantile_lasso_path

    X, y = _problem(n=200, p=12)
    lams = np.geomspace(0.2, 0.01, 8)
    taus = np.array([0.3, 0.7])
    ck = str(tmp_path / "qt.npz")
    out = checkpointed_quantile_lasso_path(
        X, y, tau=taus, lambdas=lams, checkpoint=ck, chunk_size=3,
        _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_quantile_lasso_path(
        X, y, tau=taus, lambdas=lams, checkpoint=ck, chunk_size=3)
    full = checkpointed_quantile_lasso_path(
        X, y, tau=taus, lambdas=lams,
        checkpoint=str(tmp_path / "qt2.npz"), chunk_size=3)
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(full.niter))
    plain = quantile_lasso_path(X, y, tau=taus, lambdas=lams,
                                path_mode="scan")
    assert np.abs(np.asarray(res.coef)
                  - np.asarray(plain.coef)).max() < 1e-3
    # A different tau grid refuses to resume.
    ck3 = str(tmp_path / "qt3.npz")
    checkpointed_quantile_lasso_path(
        X, y, tau=taus, lambdas=lams, checkpoint=ck3, chunk_size=3,
        _stop_after_chunks=1)
    with pytest.raises(ValueError, match="different"):
        checkpointed_quantile_lasso_path(
            X, y, tau=np.array([0.25, 0.75]), lambdas=lams,
            checkpoint=ck3, chunk_size=3)


def test_multitask_nuclear_crash_and_resume(tmp_path):
    """The reduced-rank (trace-norm) path checkpoints on the same
    multitask driver; the penalty tag enters the fingerprint."""
    from admm_tpu.diag.checkpoint import checkpointed_multitask_lasso_path
    from admm_tpu.models.multitask import multitask_nuclear_path

    rng = np.random.default_rng(31)
    n, p, K = 150, 10, 4
    X = rng.normal(size=(n, p))
    B0 = rng.normal(size=(p, 2)) @ rng.normal(size=(2, K))
    Y = X @ B0 + 0.3 * rng.normal(size=(n, K))
    lams = np.geomspace(0.5, 0.02, 8)
    ck = str(tmp_path / "nu.npz")
    out = checkpointed_multitask_lasso_path(
        X, Y, lambdas=lams, checkpoint=ck, chunk_size=3,
        penalty="nuclear", _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    res = checkpointed_multitask_lasso_path(
        X, Y, lambdas=lams, checkpoint=ck, chunk_size=3,
        penalty="nuclear")
    full = checkpointed_multitask_lasso_path(
        X, Y, lambdas=lams, checkpoint=str(tmp_path / "nu2.npz"),
        chunk_size=3, penalty="nuclear")
    np.testing.assert_array_equal(np.asarray(res.coef),
                                  np.asarray(full.coef))
    plain = multitask_nuclear_path(X, Y, lambdas=lams,
                                   path_mode="scan")
    np.testing.assert_allclose(np.asarray(res.coef),
                               np.asarray(plain.coef), atol=1e-4)
    # The row-penalty checkpoint refuses to resume a nuclear run.
    ck3 = str(tmp_path / "nu3.npz")
    checkpointed_multitask_lasso_path(
        X, Y, lambdas=lams, checkpoint=ck3, chunk_size=3,
        penalty="nuclear", _stop_after_chunks=1)
    with pytest.raises(ValueError, match="different"):
        checkpointed_multitask_lasso_path(
            X, Y, lambdas=lams, checkpoint=ck3, chunk_size=3)
