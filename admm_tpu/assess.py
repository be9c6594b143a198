"""Model assessment on held-out data — glmnet's ``assess.glmnet``,
``roc.glmnet``, ``confusion.glmnet`` and ``Cindex`` equivalents.

Extension beyond the reference (which ships no model-selection or
scoring utilities at all); the measure definitions are shared with the
CV drivers (models/cv.py::_resolve_measure, GLMFamily.cv_loss) so
``assess(fit, Xte, yte)['deviance']`` is exactly what ``cv_*_path``
cross-validates.  Host-side numpy post-processing on finished path
results — prediction itself reuses :func:`admm_tpu.predict`.

* :func:`assess` — every applicable measure per path point (deviance,
  mse, mae; class/auc for binomial; class for multinomial; C for cox).
* :func:`roc` — the (FPR, TPR) curve of a binomial fit at one lambda.
* :func:`confusion` — the true-by-predicted count table (binomial or
  multinomial) at one lambda.
* :func:`c_index` — Harrell's concordance for survival predictions.

Like glmnet's ``assess.glmnet(..., newx, newy)`` these also accept the
PREVALIDATED predictor matrix from ``cv_*_path(..., keep=True)`` via
``eta=`` (pass ``result=None, X=None``), scoring honest out-of-fold
predictions without refitting.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .predict import predict


def _eta_matrix(result, X, eta, offset=None):
    """Resolve the (L, m) linear-predictor matrix from either a path
    result + data or a user-supplied ``eta`` (e.g. a ``keep=True``
    ``CVResult.fit_preval`` transposed).  ``offset`` is glmnet's
    ``newoffset`` (fits made with an offset score at eta = b0 + Xb +
    offset)."""
    if eta is not None:
        eta = np.asarray(eta, np.float64)
        if eta.ndim != 2:
            raise ValueError("eta must be (nlambda, n) — transpose a "
                             "keep=True fit_preval (n, nlambda) first")
        return eta
    if result is None or X is None:
        raise ValueError("pass either (result, X) or eta=")
    return np.asarray(predict(result, X, type="link", offset=offset))


def _binomial_dev(eta, y):
    return 2.0 * (np.logaddexp(0.0, eta) - y[None, :] * eta)


def assess(result, X, y, *, family: str = "gaussian",
           weights: Optional[np.ndarray] = None,
           lam=None, eta=None, offset=None,
           time=None, event=None, strata=None, start=None) -> dict:
    """Every applicable performance measure of a fitted path on test
    data (glmnet's ``assess.glmnet``).

    Returns a dict of measure name -> (nlambda,) array (scalars when
    ``lam`` selects one grid point).  Measures by family, matching the
    CV drivers' ``type_measure`` definitions:

    * gaussian: ``deviance`` (= mse), ``mse``, ``mae``
    * binomial: ``deviance``, ``class``, ``auc``, ``mse``/``mae`` on
      the probability scale
    * poisson: ``deviance`` (vs the saturated model), ``mse``/``mae``
      on the mean scale
    * multinomial result: ``deviance`` (-2 log p_y), ``class``,
      ``mse``/``mae`` on the probability simplex (Brier-style)
    * cox result: ``deviance`` (-2 Breslow log partial likelihood) and
      ``C`` (Harrell's concordance) — pass ``time=``/``event=`` (or
      ``y`` as an (n, 2) [time, event] array)

    ``eta=`` scores a precomputed (nlambda, n) linear-predictor matrix
    instead (e.g. ``cv.fit_preval.T`` from ``keep=True``) — ``result``
    and ``X`` may then be None.

    A CV result assesses its full-data fit at ``lam="lambda.1se"`` by
    default (glmnet's ``assess.glmnet`` on a cv object); pass
    ``lam="lambda.min"`` or a number to override.
    """
    from .models.cox import CoxPathResult
    from .models.multinomial import MNPathResult
    from .predict import _resolve_cv

    result, lam = _resolve_cv(result, lam)

    w = None if weights is None else \
        np.asarray(weights, np.float64).ravel()

    def agg(per_obs):
        # weighted mean over observations, per path point
        if w is None:
            return per_obs.mean(axis=-1)
        return (per_obs * w).sum(axis=-1) / w.sum()

    def cut(d):
        if lam is None:
            return d
        i = int(np.argmin(np.abs(np.asarray(lams) - float(lam))))
        return {k: v[i] for k, v in d.items()}

    if isinstance(result, CoxPathResult):
        from .models.cox import _breslow_pl

        if time is None:
            yz = np.asarray(y, np.float64)
            if yz.ndim == 2 and yz.shape[1] == 3:
                # Surv(start, stop, status) columns.
                start, time, event = yz[:, 0], yz[:, 1], yz[:, 2]
            elif yz.ndim == 2 and yz.shape[1] == 2:
                time, event = yz[:, 0], yz[:, 1]
            else:
                raise ValueError("cox assess needs time=/event= or y "
                                 "as an (n, 2) [time, event] or (n, 3)"
                                 " [start, stop, event] array")
        t = np.asarray(time, np.float64).ravel()
        d = np.asarray(event, np.float64).ravel()
        C = np.asarray(result.coef, np.float64)
        lams = np.asarray(result.lambdas)
        # glmnet's newoffset: a fit made with offset= must be scored at
        # eta = Xb + offset.
        out = {"deviance": -2.0 * _breslow_pl(X, t, d, C,
                                              weights, offset,
                                              strata, start)}
        if start is None:
            # Harrell's C is undefined under left truncation.
            etam = C @ np.asarray(X, np.float64).T
            if offset is not None:
                etam = etam + np.asarray(offset,
                                         np.float64).ravel()[None, :]
            out["C"] = c_index(etam, t, d, weights)
        return cut(out)

    y = np.asarray(y, np.float64)
    if isinstance(result, MNPathResult):
        lams = np.asarray(result.lambdas)
        etam = np.asarray(predict(result, X, type="link"))  # (L, m, C)
        yi = y.astype(np.int64).ravel()
        m = etam.max(axis=2, keepdims=True)
        logZ = np.log(np.exp(etam - m).sum(axis=2)) + m[..., 0]
        logp_y = np.take_along_axis(
            etam, yi[None, :, None], axis=2)[..., 0] - logZ  # (L, m)
        P = np.exp(etam - m) / np.exp(etam - m).sum(axis=2, keepdims=1)
        Y1 = np.zeros((yi.size, etam.shape[2]))
        Y1[np.arange(yi.size), yi] = 1.0
        out = {
            "deviance": agg(-2.0 * logp_y),
            "class": agg((etam.argmax(axis=2) != yi[None, :])
                         .astype(np.float64)),
            "mse": agg(((P - Y1[None]) ** 2).sum(axis=2)),
            "mae": agg(np.abs(P - Y1[None]).sum(axis=2)),
        }
        return cut(out)

    etam = _eta_matrix(result, X, eta, offset)
    lams = (np.asarray(result.lambdas) if result is not None
            else np.arange(etam.shape[0]))

    fam_obj = None
    if not isinstance(family, str):
        from .glmnet import _family_object

        fam_obj = _family_object(family)
    if fam_obj is not None:
        # glmnet 4.x family objects: deviance = the family's own
        # cv_loss; mse/mae on the mean scale via its inverse link;
        # class/auc for binomial-link families.
        mu = (etam if fam_obj.mean_eta is None
              else fam_obj.mean_eta(etam))
        out = {"deviance": agg(fam_obj.cv_loss(etam, y)),
               "mse": agg((mu - y[None, :]) ** 2),
               "mae": agg(np.abs(mu - y[None, :]))}
        if fam_obj.name.startswith("binomial"):
            out["class"] = agg(((mu > 0.5) != (y[None, :] > 0.5))
                               .astype(np.float64))
            out["auc"] = _auc_rows(etam, y, w)
    elif family == "gaussian":
        se = (etam - y[None, :]) ** 2
        out = {"deviance": agg(se), "mse": agg(se),
               "mae": agg(np.abs(etam - y[None, :]))}
    elif family == "binomial":
        p = 1.0 / (1.0 + np.exp(-etam))
        out = {"deviance": agg(_binomial_dev(etam, y)),
               "class": agg(((etam > 0.0) != (y[None, :] > 0.5))
                            .astype(np.float64)),
               "auc": _auc_rows(etam, y, w),
               "mse": agg((p - y[None, :]) ** 2),
               "mae": agg(np.abs(p - y[None, :]))}
    elif family == "poisson":
        mu = np.exp(etam)
        ylogy = np.where(y > 0, y * np.log(np.maximum(y, 1e-300)), 0.0)
        out = {"deviance": agg(2.0 * (ylogy[None, :] - y[None, :] * etam
                                      - (y[None, :] - mu))),
               "mse": agg((mu - y[None, :]) ** 2),
               "mae": agg(np.abs(mu - y[None, :]))}
    else:
        raise ValueError("family must be 'gaussian', 'binomial' or "
                         "'poisson' (multinomial/cox dispatch on the "
                         "result type)")
    return cut(out)


def _auc_rows(etam, y, w=None):
    """Row-wise Mann-Whitney AUC of an (L, n) score matrix against
    binary ``y`` (ties get average rank; observation weights via the
    weighted rank-sum, matching sklearn's ``roc_auc_score``)."""
    from scipy.stats import rankdata

    pos = y > 0.5
    if w is None:
        ranks = np.apply_along_axis(rankdata, 1, etam)
        npos, nneg = float(pos.sum()), float((~pos).sum())
        if npos == 0 or nneg == 0:
            raise ValueError("AUC needs both classes present")
        rpos = ranks[:, pos].sum(axis=1)
        return (rpos - npos * (npos + 1) / 2.0) / (npos * nneg)
    # Weighted: direct pairwise form, vectorized per path point.
    out = np.empty(etam.shape[0])
    wp, wn = w[pos], w[~pos]
    for i, e in enumerate(etam):
        d = e[pos][:, None] - e[~pos][None, :]
        conc = (d > 0).astype(np.float64) + 0.5 * (d == 0)
        out[i] = float((wp[:, None] * wn[None, :] * conc).sum()
                       / (wp.sum() * wn.sum()))
    return out


def roc(result, X, y, *, lam: Optional[float] = None, eta=None):
    """The ROC curve of a binomial fit at one path point (glmnet's
    ``roc.glmnet``): returns ``(fpr, tpr)`` arrays stepping through the
    sorted unique scores (threshold DECREASING, so the curve runs from
    (0,0) to (1,1)).  ``lam`` defaults to the last (smallest) grid
    point; ``eta=`` scores a precomputed (n,) score vector instead."""
    if eta is None:
        if lam is None:
            lam = float(np.asarray(result.lambdas)[-1])
        eta = np.asarray(predict(result, X, lam=lam, type="link"))
    eta = np.asarray(eta, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    pos, neg = y > 0.5, y <= 0.5
    npos, nneg = float(pos.sum()), float(neg.sum())
    if npos == 0 or nneg == 0:
        raise ValueError("ROC needs both classes present")
    order = np.argsort(-eta, kind="stable")
    tp = np.cumsum(pos[order].astype(np.float64))
    fp = np.cumsum(neg[order].astype(np.float64))
    # collapse tied thresholds: keep the LAST index of each tied block
    keep = np.r_[np.diff(eta[order]) != 0, True]
    fpr = np.r_[0.0, fp[keep] / nneg]
    tpr = np.r_[0.0, tp[keep] / npos]
    return fpr, tpr


def confusion(result, X, y, *, lam: Optional[float] = None):
    """True-by-predicted class count table at one path point (glmnet's
    ``confusion.glmnet``): (C, C) array, rows = true class, columns =
    predicted class.  Binomial results use family='binomial' class
    predictions; multinomial results use the softmax argmax."""
    from .models.multinomial import MNPathResult

    if lam is None:
        lam = float(np.asarray(result.lambdas)[-1])
    if isinstance(result, MNPathResult):
        pred = np.asarray(predict(result, X, lam=lam, type="class"))
        C = np.asarray(result.beta0).shape[-1]
    else:
        pred = np.asarray(predict(result, X, lam=lam, type="class",
                                  family="binomial"))
        C = 2
    yi = np.asarray(y).astype(np.int64).ravel()
    tab = np.zeros((C, C), np.int64)
    np.add.at(tab, (yi, pred.astype(np.int64).ravel()), 1)
    return tab


def c_index(eta, time, event, weights=None):
    """Harrell's concordance index for risk scores (glmnet's
    ``Cindex``; higher score should mean earlier event).

    ``eta``: (n,) or (L, n) risk scores.  A pair (i, j) is comparable
    when ``t_i < t_j`` and subject i had an event; it is concordant
    when ``eta_i > eta_j`` (ties in eta count 1/2).  Rows with tied
    times are not comparable with each other under Breslow semantics.
    ``weights`` (glmnet's Cindex weights): pair (i, j) carries weight
    ``w_i * w_j``.
    """
    eta = np.asarray(eta, np.float64)
    one = eta.ndim == 1
    E = eta[None, :] if one else eta            # (L, n)
    t = np.asarray(time, np.float64).ravel()
    d = np.asarray(event, np.float64).ravel()
    comp = ((t[:, None] < t[None, :])
            & (d[:, None] > 0)).astype(np.float64)        # (n, n)
    if weights is not None:
        w = np.asarray(weights, np.float64).ravel()
        comp = comp * np.outer(w, w)
    ncomp = float(comp.sum())
    if ncomp == 0:
        raise ValueError("no comparable pairs (need an event with a "
                         "later follow-up)")
    diff = E[:, :, None] - E[:, None, :]        # (L, n, n) eta_i-eta_j
    conc = (diff > 0) + 0.5 * (diff == 0)
    out = (conc * comp[None]).sum(axis=(1, 2)) / ncomp
    return float(out[0]) if one else out
