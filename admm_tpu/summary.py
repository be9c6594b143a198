"""glmnet-style per-lambda path summary: Df / %Dev / Lambda.

Extension beyond the reference (which returns only ``niter`` per
lambda): glmnet's ``print.glmnet`` table — the number of exact nonzero
coefficients and the fraction of null deviance explained at every grid
point.  Host-side reporting (numpy) on a finished
:class:`~admm_tpu.models.lasso.PathResult`; the deviance definitions
match the per-observation CV losses (models/cv.py / GLMFamily.cv_loss)
so ``1 - dev/nulldev`` agrees with what ``cv_*_path`` cross-validates.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class PathTable(NamedTuple):
    df: np.ndarray         # (nlambda,) exact nonzero coefficient counts
    dev_ratio: np.ndarray  # (nlambda,) 1 - deviance/null_deviance
    lambdas: np.ndarray    # (nlambda,) the penalty grid
    nulldev: float = 0.0   # the null (intercept-only) deviance


def _resolve_family(family):
    """None/'gaussian' -> None (squared error); a GLMFamily or factory
    -> the family instance."""
    if family is None or family == "gaussian":
        return None
    from .models.glm import GLMFamily

    fam = family() if callable(family) and not isinstance(
        family, GLMFamily) else family
    if not isinstance(fam, GLMFamily):
        raise ValueError("family must be 'gaussian', a GLMFamily or a "
                         "family factory (binomial, poisson, huber)")
    return fam


def _null_eta(fam, y, w):
    """Intercept-only linear predictor: the root of the weighted score
    ``sum w grad_eta(b0, y) = 0`` (loss convex in eta -> the score is
    monotone nondecreasing; bisection on the data bracket is globally
    convergent — the host-side analog of
    models/glm.py::_null_resid_with_offset)."""
    if fam is None:
        return float(np.average(y, weights=w))

    def score(b0):
        g = np.asarray(fam.grad_eta(np.full(y.shape, b0, np.float64), y))
        return float(np.sum(g if w is None else w * g))

    lo, hi = float(np.min(y)) - 30.0, float(np.max(y)) + 30.0
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if score(mid) < 0.0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def path_table(result, X, y, *, family="gaussian",
               weights: Optional[np.ndarray] = None) -> PathTable:
    """Per-lambda ``Df`` (exact nonzeros — the soft-threshold z-update
    produces true zeros), ``%Dev`` (fraction of null deviance
    explained) and ``Lambda`` for a fitted path — glmnet's
    ``print.glmnet`` columns.

    ``family``: 'gaussian' (default, squared-error deviance) or the
    GLM family the path was fit with (``binomial``/``poisson``/
    ``huber`` — deviance from the family's per-observation CV loss).
    ``weights``: observation weights (the same vector passed to the
    path fit); deviances become weighted sums.
    """
    from .models.cox import CoxPathResult

    if isinstance(result, CoxPathResult):
        # glmnet's print for family='cox': deviance = -2 log partial
        # likelihood, nulldev at beta = 0 (strata/start via y columns).
        from .models.cox import _breslow_pl

        yz = np.asarray(y, np.float64)
        if yz.ndim == 2 and yz.shape[1] == 3:
            start, t, d = yz[:, 0], yz[:, 1], yz[:, 2]
        elif yz.ndim == 2 and yz.shape[1] == 2:
            (t, d), start = (yz[:, 0], yz[:, 1]), None
        else:
            raise ValueError("cox path_table needs y as an (n, 2) "
                             "[time, event] or (n, 3) [start, stop, "
                             "event] array")
        coef = np.asarray(result.coef, np.float64)
        lams = np.asarray(result.lambdas, np.float64)
        dev = -2.0 * _breslow_pl(X, t, d, coef, weights, None, None,
                                 start)
        nulldev = float(-2.0 * _breslow_pl(
            X, t, d, np.zeros((1, coef.shape[1])), weights, None, None,
            start)[0])
        dev_ratio = ((nulldev - dev) / nulldev if nulldev > 0
                     else np.zeros_like(dev))
        return PathTable(df=np.count_nonzero(coef, axis=1),
                         dev_ratio=dev_ratio, lambdas=lams,
                         nulldev=nulldev)

    fam = _resolve_family(family)
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    w = None if weights is None else np.asarray(weights, np.float64)

    coef = np.asarray(result.coef, np.float64)    # (L, p)
    beta0 = np.asarray(result.beta0, np.float64)  # (L,)
    lams = np.asarray(result.lambdas, np.float64)
    df = np.count_nonzero(coef, axis=1)

    eta = beta0[:, None] + coef @ X.T             # (L, n)
    if fam is None:
        per_obs = (eta - y[None, :]) ** 2
        null_per = (y - _null_eta(None, y, w)) ** 2
    elif fam.name == "poisson":
        # cv_loss (e^eta - y eta) drops the eta-free y log y - y term,
        # which cancels in deviance DIFFERENCES but not in the %Dev
        # denominator — use the exact saturated-model deviance here so
        # the ratio matches glmnet: 2[y log(y/mu) - (y - mu)].
        def pdev(e):
            mu = np.exp(e)
            ylogy = np.where(y > 0, y * np.log(np.maximum(y, 1e-300)),
                             0.0)
            return 2.0 * (ylogy - y * e - (y - mu))

        per_obs = pdev(eta)
        null_per = pdev(np.full((1, y.size), _null_eta(fam, y, w)))[0]
    else:
        # binomial's cv_loss IS the exact deviance for y in {0,1}
        # (the saturated terms vanish); huber's has no canonical
        # deviance — the CV loss is the measure we report.
        per_obs = np.asarray(fam.cv_loss(eta, y), np.float64)
        b0 = _null_eta(fam, y, w)
        null_per = np.asarray(
            fam.cv_loss(np.full((1, y.size), b0), y), np.float64)[0]

    if w is not None:
        per_obs = per_obs * w[None, :]
        null_per = null_per * w
    dev = per_obs.sum(axis=1)
    nulldev = float(null_per.sum())
    dev_ratio = (nulldev - dev) / nulldev if nulldev > 0 else \
        np.zeros_like(dev)
    return PathTable(df=df, dev_ratio=dev_ratio, lambdas=lams,
                     nulldev=nulldev)


def deviance(result, X, y, *, family="gaussian", weights=None):
    """Residual deviance per path point (glmnet's
    ``deviance.glmnet``): ``(1 - dev.ratio) * nulldev``."""
    t = path_table(result, X, y, family=family, weights=weights)
    return (1.0 - t.dev_ratio) * t.nulldev


def format_path_table(table: PathTable) -> str:
    """Render a :class:`PathTable` as glmnet's printed table."""
    lines = [f"{'Df':>6} {'%Dev':>8} {'Lambda':>10}"]
    for d, r, l in zip(table.df, table.dev_ratio, table.lambdas):
        lines.append(f"{int(d):>6} {100.0 * r:>7.2f}% {l:>10.5f}")
    return "\n".join(lines)
