"""K-fold cross-validation over the lambda path.

The reference has no model selection at all — users eyeball the solution
path plot (reference: R/30_admm_lasso.R:189-214).  On TPU the batched
lambda-path solver makes CV nearly free: every fold solves its whole
path as MXU lanes, and all folds share one compiled program (fold sizes
are equalised by construction), so a 10-fold CV costs ~10 batched path
solves.

Conventions follow glmnet's ``cv.glmnet``: the lambda grid is computed
once on the full data; per-fold models are fit on the training split and
scored by mean-squared prediction error on the held-out split;
``lambda_min`` minimises the CV curve and ``lambda_1se`` is the largest
lambda within one standard error of the minimum.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .lasso import PathResult, lasso_path


class CVResult(NamedTuple):
    lambdas: np.ndarray     # (nlambda,) the shared grid
    cvm: np.ndarray         # (nlambda,) mean CV MSE
    cvsd: np.ndarray        # (nlambda,) standard error of the CV MSE
    lambda_min: float       # grid point minimising cvm
    lambda_1se: float       # largest lambda with cvm <= min + 1 se
    fit: PathResult         # full-data path fit on the same grid
    foldid: np.ndarray      # (n,) fold assignment used (-1 = dropped row)


def cv_lasso_path(X, y, *, nfolds: int = 10, nlambda: int = 100,
                  lambda_min_ratio: Optional[float] = None,
                  lambdas: Optional[np.ndarray] = None,
                  alpha: float = 1.0, _enet_scale: bool = False,
                  standardize: bool = True, intercept: bool = True,
                  seed: int = 0, foldid: Optional[np.ndarray] = None,
                  path_mode: str = "batch", _path_fn=None,
                  **solver_kw) -> CVResult:
    """Cross-validated Lasso/Elastic-Net path.

    Rows are randomly permuted and split into ``nfolds`` equal folds
    (``n mod nfolds`` rows are dropped from CV scoring — but never from
    the final full-data fit — so every fold's train set has the same
    shape and XLA compiles the path solver exactly once).  When an
    explicit ``foldid`` is given it defines the folds and ``nfolds`` is
    derived from it (glmnet convention); entries of -1 are excluded from
    CV scoring.
    """
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64).ravel()
    n, p = X.shape
    # Cheap input validation BEFORE the expensive full-data fit; an
    # explicit foldid defines nfolds itself (glmnet convention).
    if foldid is None:
        if not 2 <= nfolds <= n:
            raise ValueError("nfolds must be in [2, nrow(x)]")
    else:
        foldid = np.asarray(foldid, np.int64)
        if foldid.shape != (n,):
            raise ValueError("foldid must have one entry per row")
        nfolds = int(foldid.max()) + 1
        counts = np.bincount(foldid[foldid >= 0], minlength=nfolds)
        if nfolds < 2 or np.any(counts == 0):
            raise ValueError(
                "foldid must assign at least one row to each of >= 2 "
                f"folds (got counts {counts.tolist()})")

    # Shared lambda grid: user-supplied, or from the full data (glmnet
    # convention).  ``lambdas`` is a named parameter so it cannot collide
    # with the per-fold calls' grid argument.
    if _path_fn is None:
        def _path_fn(Xf, yf, lambdas, nlambda=nlambda,
                     lambda_min_ratio=lambda_min_ratio):
            return lasso_path(Xf, yf, lambdas=lambdas, nlambda=nlambda,
                              lambda_min_ratio=lambda_min_ratio,
                              alpha=alpha, _enet_scale=_enet_scale,
                              standardize=standardize,
                              intercept=intercept, path_mode=path_mode,
                              **solver_kw)
    full = _path_fn(X, y, lambdas)
    lams = np.asarray(full.lambdas, np.float64)

    if foldid is None:
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        fold_size = n // nfolds
        foldid = np.full(n, -1, np.int64)
        for f in range(nfolds):
            foldid[perm[f * fold_size:(f + 1) * fold_size]] = f

    mse = np.empty((nfolds, lams.shape[0]))
    for f in range(nfolds):
        tr = foldid != f
        va = foldid == f
        res = _path_fn(X[tr], y[tr], lams)
        pred = (np.asarray(res.beta0)[:, None]
                + np.asarray(res.coef) @ X[va].T)   # (nlambda, n_va)
        mse[f] = np.mean((pred - y[va][None, :]) ** 2, axis=1)

    cvm = mse.mean(axis=0)
    cvsd = mse.std(axis=0, ddof=1) / np.sqrt(nfolds)
    i_min = int(np.argmin(cvm))
    lambda_min = float(lams[i_min])
    within = cvm <= cvm[i_min] + cvsd[i_min]
    lambda_1se = float(lams[np.flatnonzero(within)[0]])  # grid is decreasing

    return CVResult(lambdas=lams, cvm=cvm, cvsd=cvsd,
                    lambda_min=lambda_min, lambda_1se=lambda_1se,
                    fit=full, foldid=foldid)


def cv_enet_path(X, y, *, alpha: float = 1.0, **kw) -> CVResult:
    """Cross-validated Elastic-Net path (lambda0 inflation as in
    reference: src/ADMMEnet.h:56)."""
    return cv_lasso_path(X, y, alpha=alpha, _enet_scale=True, **kw)


def cv_group_lasso_path(X, y, groups, *, weights=None, nlambda: int = 100,
                        lambda_min_ratio: Optional[float] = None,
                        standardize: bool = True, intercept: bool = True,
                        maxit: int = 10000, eps_abs: float = 1e-5,
                        eps_rel: float = 1e-5, rho: float = -1.0,
                        **kw) -> CVResult:
    """Cross-validated group-Lasso path (extension; same fold protocol
    as :func:`cv_lasso_path`).  Solver options are named explicitly so
    they reach the group solver (generic **kw would be consumed by the
    lasso path this wraps)."""
    from .grouplasso import group_lasso_path

    def path_fn(Xf, yf, lambdas, nlambda=nlambda,
                lambda_min_ratio=lambda_min_ratio):
        return group_lasso_path(Xf, yf, groups, weights=weights,
                                lambdas=lambdas, nlambda=nlambda,
                                lambda_min_ratio=lambda_min_ratio,
                                standardize=standardize,
                                intercept=intercept, maxit=maxit,
                                eps_abs=eps_abs, eps_rel=eps_rel, rho=rho)

    return cv_lasso_path(X, y, nlambda=nlambda,
                         lambda_min_ratio=lambda_min_ratio,
                         standardize=standardize, intercept=intercept,
                         _path_fn=path_fn, **kw)
