"""K-fold cross-validation over the lambda path.

The reference has no model selection at all — users eyeball the solution
path plot (reference: R/30_admm_lasso.R:189-214).  On TPU the batched
lambda-path solver makes CV nearly free: every fold solves its whole
path as MXU lanes, and folds share compiled programs (fold sizes differ
by at most one, so at most two train shapes exist), so a 10-fold CV
costs ~10 batched path solves and <= 2 compiles.

Conventions follow glmnet's ``cv.glmnet``: the lambda grid is computed
once on the full data; per-fold models are fit on the training split and
scored by mean-squared prediction error on the held-out split;
``lambda_min`` minimises the CV curve and ``lambda_1se`` is the largest
lambda within one standard error of the minimum.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from .lasso import PathResult, lasso_path


class CVResult(NamedTuple):
    lambdas: np.ndarray     # (nlambda,) the shared grid
    cvm: np.ndarray         # (nlambda,) mean CV MSE
    cvsd: np.ndarray        # (nlambda,) standard error of the CV MSE
    lambda_min: float       # grid point minimising cvm
    lambda_1se: float       # largest lambda with cvm <= min + 1 se
    fit: PathResult         # full-data path fit on the same grid
    foldid: np.ndarray      # (n,) fold assignment (-1 = train-only row)


def _squared_error(eta, y):
    """Per-observation squared error (gaussian; glmnet type.measure
    'mse').  ``eta`` is the (nlambda, n_va) linear predictor."""
    return (eta - y[None, :]) ** 2


def binomial_deviance(eta, y):
    """Per-observation binomial deviance (glmnet type.measure
    'deviance' for family='binomial'): -2[y log p + (1-y) log(1-p)]
    computed stably from the linear predictor."""
    # log(1 + exp(eta)) - y*eta, doubled; logaddexp is overflow-safe.
    return 2.0 * (np.logaddexp(0.0, eta) - y[None, :] * eta)


def cv_lasso_path(X, y, *, nfolds: int = 10, nlambda: int = 100,
                  lambda_min_ratio: Optional[float] = None,
                  lambdas: Optional[np.ndarray] = None,
                  alpha: float = 1.0, _enet_scale: bool = False,
                  standardize: bool = True, intercept: bool = True,
                  seed: int = 0, foldid: Optional[np.ndarray] = None,
                  path_mode: str = "batch", _path_fn=None,
                  _loss_fn=None,
                  **solver_kw) -> CVResult:
    """Cross-validated Lasso/Elastic-Net path.

    Fold assignment and scoring follow ``cv.glmnet`` exactly: rows are
    randomly assigned round-robin over a permutation, so fold sizes
    differ by at most one and EVERY row is scored (when ``nfolds`` does
    not divide ``n`` the train sets take two distinct shapes, costing at
    most two XLA compiles instead of one).  Errors are aggregated per
    OBSERVATION, not per fold: ``cvm`` is the mean squared prediction
    error over all scored rows and ``cvsd`` its standard error
    (glmnet's ``cvraw``/``cvsd`` formula with unit weights), so unequal
    explicit folds are weighted by their size automatically.

    When an explicit ``foldid`` is given it defines the folds and
    ``nfolds`` is derived from it (glmnet convention).  Entries of -1
    (an extension; glmnet has no such sentinel) are excluded from CV
    scoring but still participate in EVERY fold's training set.
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
        # glmnet: foldid = sample(rep(seq(nfolds), length = N)) — every
        # row gets a fold, sizes differ by at most one.
        rng = np.random.default_rng(seed)
        foldid = np.resize(np.arange(nfolds, dtype=np.int64), n)
        foldid = foldid[rng.permutation(n)]

    # Per-observation losses (glmnet's cvraw), each row scored by the
    # model trained without its fold; the loss maps the linear
    # predictor to the family's deviance measure (MSE for gaussian).
    loss = _squared_error if _loss_fn is None else _loss_fn
    sqerr = np.full((n, lams.shape[0]), np.nan)
    for f in range(nfolds):
        tr = foldid != f
        va = foldid == f
        res = _path_fn(X[tr], y[tr], lams)
        pred = (np.asarray(res.beta0)[:, None]
                + np.asarray(res.coef) @ X[va].T)   # (nlambda, n_va)
        sqerr[va] = loss(pred, y[va]).T

    scored = foldid >= 0
    n_sc = int(scored.sum())
    cvm = sqerr[scored].mean(axis=0)
    # glmnet: cvsd = sqrt(weighted.mean((cvraw - cvm)^2) / (N - 1))
    cvsd = np.sqrt(((sqerr[scored] - cvm) ** 2).mean(axis=0) / (n_sc - 1))
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


def cv_logistic_path(X, y, *, nlambda: int = 50,
                     lambda_min_ratio: float = 1e-2,
                     alpha: float = 1.0, standardize: bool = True,
                     intercept: bool = True, maxit: int = 10000,
                     eps_abs: float = 1e-5, eps_rel: float = 1e-5,
                     rho: float = -1.0, path_mode: str = "scan",
                     **kw) -> CVResult:
    """Cross-validated sparse logistic regression path (extension; same
    fold protocol as :func:`cv_lasso_path`, scored by per-observation
    BINOMIAL DEVIANCE — glmnet's default type.measure for
    family='binomial').  ``cvm`` is the mean deviance; lambda_min /
    lambda_1se follow from it as usual."""
    from .logistic import logistic_lasso_path

    def path_fn(Xf, yf, lambdas, nlambda=nlambda,
                lambda_min_ratio=lambda_min_ratio):
        return logistic_lasso_path(Xf, yf, lambdas=lambdas,
                                   nlambda=nlambda,
                                   lambda_min_ratio=lambda_min_ratio,
                                   alpha=alpha, standardize=standardize,
                                   intercept=intercept, maxit=maxit,
                                   eps_abs=eps_abs, eps_rel=eps_rel,
                                   rho=rho, path_mode=path_mode)

    return cv_lasso_path(X, y, nlambda=nlambda,
                         lambda_min_ratio=lambda_min_ratio,
                         standardize=standardize, intercept=intercept,
                         _path_fn=path_fn, _loss_fn=binomial_deviance,
                         **kw)


def cv_glm_path(X, y, family, *, nlambda: int = 50,
                lambda_min_ratio: float = 1e-2, alpha: float = 1.0,
                standardize: bool = True, intercept: bool = True,
                maxit: int = 10000, eps_abs: float = 1e-5,
                eps_rel: float = 1e-5, rho: float = -1.0,
                path_mode: str = "scan", loss=None, **kw) -> CVResult:
    """Cross-validated path for any smooth-loss GLM family (extension;
    admm_tpu/models/glm.py).  Held-out folds are scored by the FAMILY'S
    per-observation loss evaluated at the linear predictor — i.e. the
    deviance-style measure matching the objective being fit — unless an
    explicit ``loss(eta, y)`` is given.  ``cv_logistic_path`` is the
    binomial special case."""
    from .glm import GLMFamily, glm_lasso_path

    fam = family() if not isinstance(family, GLMFamily) else family
    if loss is None:
        loss = fam.cv_loss

    def path_fn(Xf, yf, lambdas, nlambda=nlambda,
                lambda_min_ratio=lambda_min_ratio):
        return glm_lasso_path(Xf, yf, fam, lambdas=lambdas,
                              nlambda=nlambda,
                              lambda_min_ratio=lambda_min_ratio,
                              alpha=alpha, standardize=standardize,
                              intercept=intercept, maxit=maxit,
                              eps_abs=eps_abs, eps_rel=eps_rel, rho=rho,
                              path_mode=path_mode)

    return cv_lasso_path(X, y, nlambda=nlambda,
                         lambda_min_ratio=lambda_min_ratio,
                         standardize=standardize, intercept=intercept,
                         _path_fn=path_fn, _loss_fn=loss, **kw)
