"""Prediction from fitted lambda paths (glmnet's ``predict`` analog).

The reference has no prediction utilities (users assemble
``beta0 + X beta`` by hand from the fit object); glmnet's ``predict``
is part of the surface users expect, so the rebuild ships one::

    res = admm_tpu.logistic_lasso_path(X, y)
    eta = admm_tpu.predict(res, Xnew)                    # (L, m) link
    p   = admm_tpu.predict(res, Xnew, type="response",
                           family="binomial")            # probabilities
    lab = admm_tpu.predict(mn_res, Xnew, type="class")   # multinomial

Works for every path-result type in the package:

* ``PathResult`` (gaussian / GLM / group / genlasso paths):
  (nlambda, m) linear predictors; ``type="response"`` applies the
  inverse link named by ``family`` ("binomial" -> sigmoid,
  "poisson" -> exp; gaussian is the identity).  ``family`` may also
  be a :class:`GLMFamily` instance (glmnet 4.x family objects —
  probit/cloglog/gamma/negbin links apply their own ``mean_eta``).
* ``MTPathResult`` (multi-task): (nlambda, m, K).
* ``MNPathResult`` (multinomial): (nlambda, m, C) linear predictors;
  ``type="response"`` -> softmax probabilities, ``type="class"`` ->
  integer labels.

``lam`` (glmnet's ``s=``, default ``exact=FALSE`` semantics) drops the
leading lambda axis: an ``s`` on the grid is exact, an off-grid ``s``
linearly interpolates the coefficients between its bracketing grid
points on the lambda scale (glmnet's ``lambda.interp``), clamped to
the grid range.

``type="coefficients"`` returns the intercept-prepended coefficient
matrix and ``type="nonzero"`` the nonzero-coefficient indices (glmnet's
remaining predict types); ``X`` is unused for both (pass None).
"""
from __future__ import annotations

import numpy as np


def _at_lam(result, lam):
    """glmnet's ``lambda.interp`` (predict's default ``exact=FALSE``):
    coefficients at ``s`` are the LINEAR interpolation between the
    bracketing grid points on the lambda scale, clamped to the grid
    range; an ``s`` on the grid is exact.  Returns a single-point
    result of the same type (leading lambda axis length 1)."""
    grid_attr = "lambdas" if hasattr(result, "lambdas") else "Cs"
    lams = np.asarray(getattr(result, grid_attr), np.float64)  # decr.
    s = float(np.clip(float(lam), lams.min(), lams.max()))
    right = int(np.searchsorted(-lams, -s))   # first i with lams[i]<=s
    left = max(right - 1, 0)
    frac = 0.0 if right == left else \
        float((lams[left] - s)
              / max(lams[left] - lams[right], 1e-300))

    def mix(a):
        a = np.asarray(a, np.float64)
        return ((1.0 - frac) * a[left] + frac * a[right])[None]

    kw = {grid_attr: np.array([s]), "coef": mix(result.coef)}
    if hasattr(result, "beta0"):
        kw["beta0"] = mix(result.beta0)
    if hasattr(result, "intercept"):
        kw["intercept"] = mix(result.intercept)
    return result._replace(**kw)


def _resolve_cv(result, lam):
    """glmnet's ``predict.cv.glmnet`` / ``coef.cv.glmnet``: a CV result
    predicts through its full-data fit at ``s = "lambda.1se"`` by
    DEFAULT (glmnet's choice), ``"lambda.min"``, or a numeric lambda.
    Returns (fit, lam) unchanged for plain path results."""
    if hasattr(result, "fit") and hasattr(result, "C_1se"):
        # SVM CV results: select on the C grid (1-SE points at smaller
        # C = stronger regularization, the glmnet convention mirrored).
        if lam is None:
            lam = "C_1se"
        if isinstance(lam, str):
            key = lam.replace(".", "_").replace("lambda", "C")
            if key not in ("C_1se", "C_min"):
                raise ValueError("lam must be numeric, 'C_min' or "
                                 "'C_1se' for SVM CV results")
            lam = getattr(result, key)
        return result.fit, float(lam)
    if not (hasattr(result, "fit") and hasattr(result, "lambda_1se")):
        if isinstance(lam, str):
            raise ValueError("string lam selectors need a CV result")
        return result, lam
    if lam is None:
        lam = "lambda_1se"
    if isinstance(lam, str):
        key = lam.replace(".", "_")
        if key not in ("lambda_1se", "lambda_min"):
            raise ValueError("lam must be numeric, 'lambda.min' or "
                             "'lambda.1se' for CV results")
        lam = getattr(result, key)
    return result.fit, float(lam)


def predict(result, X, *, lam=None,
            type: str = "link", family: str = "gaussian",
            offset=None, tau=None):
    """Predict from any fitted path result (module docstring).

    Returns numpy arrays; with ``lam`` set, the leading lambda axis is
    dropped (grid-interpolated — module docstring).  A CV result (from any
    ``cv_*`` driver) predicts through its full-data fit at
    ``lam="lambda.1se"`` by default — glmnet's ``predict.cv.glmnet``;
    pass ``lam="lambda.min"`` or a number to override.

    ``tau`` selects the quantile lane of a
    :class:`~admm_tpu.models.quantile.QuantilePathResult` (must be one
    of the fitted grid values; optional when the fit has a single tau)
    — the selected lane then behaves as a gaussian path (its
    per-tau lambda grid drives ``lam`` interpolation).
    """
    from .models.cox import CoxPathResult
    from .models.lasso import PathResult
    from .models.multinomial import MNPathResult
    from .models.multitask import MTPathResult
    from .models.quantile import QuantilePathResult
    from .models.svm import SVMResult

    if (isinstance(result, dict)
            and isinstance(result.get("fit"), QuantilePathResult)):
        # cv_quantile_lasso_path returns a dict; predict through its
        # full-data fit.  String lam selectors resolve PER TAU after
        # the lane is chosen below.
        cv_qdict, result = result, result["fit"]
    else:
        cv_qdict = None
    if isinstance(result, QuantilePathResult):
        taus = np.asarray(result.taus, np.float64)
        if tau is None:
            if taus.shape[0] != 1:
                raise ValueError("this quantile fit has a tau grid; "
                                 "pass tau= to pick a lane")
            ti = 0
        else:
            # f32 fits store tau at single precision; match at that
            # granularity (grid values are user-chosen, far apart).
            close = np.isclose(taus, float(tau), rtol=0, atol=1e-6)
            if not close.any():
                raise ValueError(f"tau={tau} is not on the fitted grid "
                                 f"{taus.tolist()}")
            ti = int(np.argmax(close))
        result = PathResult(lambdas=result.lambdas[ti],
                            beta0=result.beta0[ti],
                            coef=result.coef[ti],
                            niter=result.niter[ti])
        if cv_qdict is not None:
            if lam is None:
                lam = "lambda_min"
            if isinstance(lam, str):
                key = lam.replace(".", "_")
                if key not in ("lambda_min", "lambda_1se"):
                    raise ValueError("lam must be numeric, 'lambda.min'"
                                     " or 'lambda.1se' for quantile CV "
                                     "results")
                lam = float(np.asarray(cv_qdict[key])[ti])
    elif tau is not None:
        raise ValueError("tau= applies to quantile path results only")

    result, lam = _resolve_cv(result, lam)
    squeeze = lam is not None
    if squeeze:
        result = _at_lam(result, lam)

    if type not in ("link", "response", "class", "coefficients",
                    "nonzero"):
        raise ValueError("type must be 'link', 'response', 'class', "
                         "'coefficients' or 'nonzero'")
    if isinstance(result, SVMResult) and type not in ("coefficients",
                                                      "nonzero"):
        # 'link' = decision values; 'class' maps back through the
        # original labels (no probability scale for the hinge losses).
        if type == "response":
            raise ValueError("SVM predictions are 'link' (decision "
                             "values) or 'class'")
        eta = (np.asarray(result.intercept)[:, None]
               + np.asarray(result.coef) @ np.asarray(X, np.float64).T)
        if type == "class":
            cls = result.classes or (-1, 1)
            eta = np.where(eta > 0, cls[1], cls[0])
        return eta[0] if squeeze else eta
    if type in ("coefficients", "nonzero"):
        # glmnet's predict(type="coefficients"/"nonzero"): X is unused.
        coef = np.asarray(result.coef)
        if type == "nonzero":
            # indices of nonzero coefficients (matrix families: rows
            # with any nonzero entry), per path point or at ``lam``.
            nz_mask = (coef != 0.0) if coef.ndim == 2 \
                else np.any(coef != 0.0, axis=-1)
            if squeeze:
                return np.flatnonzero(nz_mask[0])
            return [np.flatnonzero(m) for m in nz_mask]
        if isinstance(result, CoxPathResult):
            out = coef                                   # no intercept
        else:
            beta0 = np.asarray(result.intercept
                               if isinstance(result, SVMResult)
                               else result.beta0)
            out = (np.concatenate([beta0[:, None], coef], axis=1)
                   if coef.ndim == 2 else
                   np.concatenate([beta0[:, None, :], coef], axis=1))
        return out[0] if squeeze else out
    X = np.asarray(X, np.float64)
    if isinstance(result, CoxPathResult):
        # No intercept (baseline hazard); 'response' = relative risk.
        eta = np.asarray(result.coef) @ X.T          # (L, m)
        if offset is not None:
            # glmnet's newoffset: fits made with an offset need it at
            # prediction time too (applies BEFORE exp for 'response').
            eta = eta + np.asarray(offset, np.float64)[None, :]
        if type == "response":
            eta = np.exp(eta)
        elif type == "class":
            raise ValueError("cox predictions are 'link' (linear "
                             "predictor) or 'response' (relative risk)")
        return eta[0] if squeeze else eta
    beta0 = np.asarray(result.beta0)
    coef = np.asarray(result.coef)

    if isinstance(result, (MNPathResult, MTPathResult)):
        # (L, m, C/K) = beta0 (L, C) + X (m, p) @ coef (L, p, C)
        eta = beta0[:, None, :] + np.einsum("mp,lpc->lmc", X, coef)
        if offset is not None:
            # (m,) broadcasts across classes; (m, C) applies per class
            # (glmnet's multinomial newoffset shape).
            off = np.asarray(offset, np.float64)
            eta = eta + (off[None, :, None] if off.ndim == 1
                         else off[None, :, :])
        if isinstance(result, MNPathResult):
            if type == "response":
                e = np.exp(eta - eta.max(axis=2, keepdims=True))
                eta = e / e.sum(axis=2, keepdims=True)
            elif type == "class":
                eta = np.argmax(eta, axis=2)
        elif type != "link":
            raise ValueError("multi-task predictions are 'link' only")
    else:
        # glmnet 4.x family objects: a GLMFamily instance (or factory)
        # carries its own inverse link (mean_eta); "class" applies to
        # any binomial-link family via the mean > 1/2 rule.
        fam_obj = None
        if not isinstance(family, str):
            from .glmnet import _family_object

            fam_obj = _family_object(family)
        is_binom = (family == "binomial" if fam_obj is None
                    else fam_obj.name.startswith("binomial"))
        if type == "class" and not is_binom:
            raise ValueError("type='class' needs a binomial family "
                             "(or a multinomial result)")
        eta = beta0[:, None] + coef @ X.T            # (L, m)
        if offset is not None:
            # glmnet's newoffset: fits made with an offset need it at
            # prediction time too.
            eta = eta + np.asarray(offset, np.float64)[None, :]
        if type in ("response", "class"):
            if fam_obj is not None:
                if fam_obj.mean_eta is not None:
                    eta = fam_obj.mean_eta(eta)
                if type == "class":
                    eta = (eta > 0.5).astype(np.int64)
            elif family == "binomial":
                eta = 1.0 / (1.0 + np.exp(-eta))
                if type == "class":
                    eta = (eta > 0.5).astype(np.int64)
            elif family == "poisson":
                eta = np.exp(eta)
            elif family != "gaussian":
                raise ValueError(f"unknown family {family!r}")

    return eta[0] if squeeze else eta


def coef(result, *, lam=None):
    """The intercept-prepended coefficient matrix at ``lam`` (or the
    whole path) — glmnet's ``coef(fit, s=)`` accessor, equivalent to
    ``predict(result, None, type="coefficients", lam=lam)``.  CV
    results default to ``lam="lambda.1se"`` (glmnet's
    ``coef.cv.glmnet``)."""
    return predict(result, None, type="coefficients", lam=lam)
