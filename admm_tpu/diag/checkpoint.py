"""Checkpoint / resume for lambda-path solves.

The reference has no cross-process checkpointing; *within* a run the
lambda-path warm-start protocol is its resume mechanism
(reference: src/ADMMLassoTall.h:219-230, SURVEY.md section 5).  The
TPU-native design makes the natural next step trivial: the entire solver
state is an :class:`~admm_tpu.core.engine.ADMMState` pytree of arrays, so
a path solve can be chunked, with the terminal state of each chunk saved
to disk, and resumed bit-exactly after a crash — the data-derived caches
(standardization stats, Gram matrices, factorizations, auto-rho) are
deterministic functions of (X, y, options) and are rebuilt on resume
rather than stored.

Usage::

    res = checkpointed_lasso_path(X, y, lambdas=lams,
                                  checkpoint="/tmp/run.npz", chunk_size=10)

If the process dies mid-path, calling again with the same arguments skips
the completed chunks (warm-starting from the saved state) and returns the
identical result a single uninterrupted solve would have produced.
"""
from __future__ import annotations

import os
import tempfile
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.standardize import recover, standardize
from ..models.lasso import (PathResult, _scan_path, _tall_engine,
                            _wide_engine)

_STATE_PREFIX = "state__"


def save_pytree(path: str, tree, **extras) -> None:
    """Serialize a pytree of arrays (plus named numpy extras) to ``.npz``.

    Leaves are keyed by their flattened position; ``None`` leaves are
    recorded so the structure round-trips.  The write is atomic (tmp file
    + rename) so a crash mid-save never corrupts an existing checkpoint.
    """
    leaves = jax.tree.leaves(tree, is_leaf=lambda x: x is None)
    payload = {}
    for i, leaf in enumerate(leaves):
        key = f"{_STATE_PREFIX}{i}"
        payload[key] = (np.asarray(False) if leaf is None
                        else np.asarray(leaf))
        payload[key + "__none"] = np.asarray(leaf is None)
    payload.update(extras)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`, shaped ``like`` the
    given template pytree.  Returns ``(tree, extras_dict)``."""
    with np.load(path) as data:
        treedef = jax.tree.structure(like, is_leaf=lambda x: x is None)
        leaves = []
        i = 0
        while f"{_STATE_PREFIX}{i}" in data:
            if bool(data[f"{_STATE_PREFIX}{i}__none"]):
                leaves.append(None)
            else:
                leaves.append(jnp.asarray(data[f"{_STATE_PREFIX}{i}"]))
            i += 1
        extras = {k: data[k] for k in data.files
                  if not k.startswith(_STATE_PREFIX)}
    return jax.tree.unflatten(treedef, leaves), extras


def _fingerprint(Xs, ys, lams, alpha, maxit, eps_abs, eps_rel, rho,
                 standardize_x, intercept, enet_scale):
    """Problem identity so a checkpoint is never resumed against a
    different problem or options.  Every option that changes solver
    behavior must appear here — including the static flags (enet_scale
    changes the wide regime's lambda0 early-exit threshold).  The data
    and the full lambda grid enter as a SHA-256 over their bytes: shape
    plus a couple of sample sums is not identity (a change to an interior
    row of X, or a different interior grid with the same endpoints, must
    refuse to resume).  The hash is one streaming pass over host memory —
    negligible next to a single solve chunk."""
    import hashlib

    h = hashlib.sha256()
    for arr in (Xs, ys, lams):
        a = np.ascontiguousarray(np.asarray(arr))
        h.update(str(a.dtype).encode())
        h.update(np.asarray(a.shape, dtype=np.int64).tobytes())
        h.update(a.tobytes())
    # Fold the 256-bit digest into four float64 lanes so the fingerprint
    # stays a flat float array (backwards-compatible container format).
    digest = np.frombuffer(h.digest(), dtype=np.uint64).astype(np.float64)
    return np.concatenate([np.array([
        Xs.shape[0], Xs.shape[1], lams.shape[0],
        float(alpha), float(maxit), float(eps_abs), float(eps_rel),
        float(rho), float(standardize_x), float(intercept),
        float(enet_scale),
    ], dtype=np.float64), digest])


def checkpointed_lasso_path(
        X, y, *, lambdas, checkpoint: str, chunk_size: int = 10,
        alpha: float = 1.0, standardize_x: bool = True,
        intercept: bool = True, maxit: int = 10000,
        eps_abs: float = 1e-5, eps_rel: float = 1e-5, rho: float = -1.0,
        _enet_scale: bool = False, dtype=jnp.float32,
        _stop_after_chunks: Optional[int] = None) -> Optional[PathResult]:
    """Lasso/Enet lambda path solved in resumable chunks.

    Semantically identical to
    :func:`admm_tpu.models.lasso.lasso_path` with explicit ``lambdas``
    (the warm-start chain is the same chain, just cut at chunk
    boundaries), but after every ``chunk_size`` lambdas the solver state
    and accumulated results are written to ``checkpoint``.  On a rerun,
    completed chunks are skipped.  The checkpoint file is deleted on
    successful completion.

    ``_stop_after_chunks`` is a fault-injection hook for tests: abandon
    the run (returning None) after that many chunks.
    """
    if int(chunk_size) < 1:
        raise ValueError("chunk_size must be >= 1")
    chunk_size = int(chunk_size)
    lambdas = np.asarray(lambdas)
    if lambdas.size < 1:
        raise ValueError("lambdas must be non-empty")
    X = jnp.asarray(X, dtype)
    y = jnp.asarray(y, dtype)
    n, p = X.shape
    Xs, ys, stats = standardize(X, y, standardize_x=standardize_x,
                                intercept=intercept)
    lams = jnp.sort(jnp.asarray(lambdas, dtype))[::-1]
    ilams = lams * n / stats.scale_y
    nlam = int(lams.shape[0])

    if n > p:
        st0, solve, report = _tall_engine(Xs, ys, ilams[0], rho, alpha)
    else:
        st0, solve, report = _wide_engine(Xs, ys, ilams[0], rho, alpha,
                                          _enet_scale)

    fp = _fingerprint(Xs, ys, ilams, alpha, maxit, eps_abs, eps_rel, rho,
                      standardize_x, intercept, _enet_scale)
    k_done = 0
    coefs_done = []
    niter_done = []
    st = st0
    if os.path.exists(checkpoint):
        st_loaded, extras = load_pytree(checkpoint, st0)
        fp_old = np.asarray(extras["fingerprint"])
        if fp_old.shape != fp.shape or not np.allclose(fp_old, fp):
            raise ValueError(
                f"checkpoint {checkpoint!r} belongs to a different "
                "problem/options; refusing to resume")
        st = st_loaded
        k_done = int(extras["k_done"])
        coefs_done = [extras["coefs"]]
        niter_done = [extras["niter"]]

    segment = jax.jit(lambda st, il, m, ea, er: _scan_path(
        st, solve, report, il, m, ea, er)[:3])

    chunks_run = 0
    while k_done < nlam:
        if (_stop_after_chunks is not None
                and chunks_run >= _stop_after_chunks):
            return None
        hi = min(k_done + chunk_size, nlam)
        st, coefs, niter = segment(st, ilams[k_done:hi],
                                   maxit, eps_abs, eps_rel)
        jax.block_until_ready(st)
        coefs_done.append(np.asarray(coefs))
        niter_done.append(np.asarray(niter))
        k_done = hi
        chunks_run += 1
        save_pytree(checkpoint, st, fingerprint=fp,
                    k_done=np.asarray(k_done),
                    coefs=np.concatenate(coefs_done, axis=0),
                    niter=np.concatenate(niter_done, axis=0))

    coefs = jnp.asarray(np.concatenate(coefs_done, axis=0))
    niter = jnp.asarray(np.concatenate(niter_done, axis=0))
    beta0, coef = recover(stats, coefs, standardize_x=standardize_x,
                          intercept=intercept)
    if os.path.exists(checkpoint):
        os.unlink(checkpoint)
    return PathResult(lambdas=lams, beta0=beta0, coef=coef, niter=niter)
