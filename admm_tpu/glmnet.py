"""The glmnet front door: ``glmnet(X, y, family=...)`` and
``cv_glmnet(...)`` dispatching every family to its path driver.

Extension beyond the reference (whose R API is one builder per model,
``R/30_admm_lasso.R`` etc. — mirrored by :mod:`admm_tpu.api`); this
module is for users arriving FROM glmnet, where a single ``glmnet()``
call with a ``family=`` string reaches every model.  Arguments keep
glmnet's names where they differ from ours (``type_multinomial``), and
``family="cox"`` accepts glmnet's ``Surv``-style ``y`` — an (n, 2)
``[time, status]`` array, or an (n, 3) ``[start, stop, status]`` array
for the start-stop (counting-process) model — or separate
``time=``/``event=`` keywords.

Families: ``gaussian`` (lasso / elastic net on ``alpha``),
``binomial``, ``poisson``, ``multinomial``, ``mgaussian`` (multi-
response gaussian = the multitask driver), ``cox``, plus the
``huber`` robust extension.  Each returns the family's own path-result
type, which :func:`admm_tpu.predict`, :func:`admm_tpu.assess`,
:func:`admm_tpu.path_table` and the plotting helpers all accept.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

_FAMILIES = ("gaussian", "binomial", "poisson", "multinomial",
             "mgaussian", "cox", "huber")


def _family_object(family):
    """glmnet 4.x family-object dispatch: return the GLMFamily instance
    when ``family`` is one (or a zero-arg factory producing one, e.g.
    ``admm_tpu.models.glm.binomial_probit``), else None (string
    dispatch).  reference analog: glmnet's ``family=`` accepting any
    stats::family object since 4.0 — here any :class:`GLMFamily`
    (shipped: probit/cloglog binomial links, gamma_log,
    negative_binomial(theta)) reaches the same engine."""
    from .models.glm import GLMFamily

    if isinstance(family, GLMFamily):
        return family
    if callable(family):
        fam = family()
        if not isinstance(fam, GLMFamily):
            raise ValueError("family factory must return a GLMFamily")
        return fam
    return None


def _cox_args(y, time, event):
    """Resolve (time, event, start) from glmnet's Surv-style ``y``
    — an (n, 2) ``[time, status]`` or an (n, 3) ``[start, stop,
    status]`` (the start-stop / counting-process model) — or explicit
    keywords."""
    if time is not None:
        if event is None:
            raise ValueError("pass event= together with time=")
        return time, event, None
    yz = np.asarray(y, np.float64)
    if yz.ndim == 2 and yz.shape[1] == 2:
        return yz[:, 0], yz[:, 1], None
    if yz.ndim == 2 and yz.shape[1] == 3:
        return yz[:, 1], yz[:, 2], yz[:, 0]
    raise ValueError("family='cox' needs y as an (n, 2) [time, status]"
                     " or (n, 3) [start, stop, status] array, or "
                     "time=/event=")


def glmnet(X, y=None, family: str = "gaussian", *, alpha: float = 1.0,
           type_multinomial: str = "ungrouped", relax: bool = False,
           time=None, event=None, **kw):
    """Fit a regularization path for any family (glmnet's ``glmnet()``).

    Dispatches on ``family`` to the matching path driver, passing every
    other keyword through — so each family keeps its own defaults
    (``nlambda``, ``path_mode``, measured ``rho``/``hessian`` choices)
    and its full argument surface (``weights``, ``penalty_factor``,
    ``lower_limits``/``upper_limits``, ``exclude``, ``dfmax``/``pmax``,
    ``offset``, ``trace_len``, ``data_mesh``, checkpointing) exactly as
    documented on the driver.
    """
    from .models.cox import cox_lasso_path
    from .models.glm import huber_lasso_path, poisson_lasso_path
    from .models.lasso import enet_path, lasso_path
    from .models.logistic import logistic_lasso_path
    from .models.multinomial import multinomial_lasso_path
    from .models.multitask import multitask_lasso_path

    fam_obj = _family_object(family)
    if fam_obj is not None:
        # glmnet 4.x family objects (``glmnet(x, y, family =
        # binomial(link = "probit"))`` etc.): a GLMFamily instance (or
        # zero-arg factory) rides the generic smooth-loss engine.
        if relax:
            raise ValueError("relax=True is implemented for "
                             "family='gaussian'")
        from .models.glm import glm_lasso_path

        return glm_lasso_path(X, y, fam_obj, alpha=alpha, **kw)
    if family not in _FAMILIES:
        raise ValueError(f"family must be one of {_FAMILIES} or a "
                         "GLMFamily instance (admm_tpu.models.glm)")
    if relax:
        # glmnet's relax=TRUE: the de-biased (lambda, gamma) blend of
        # each path point with its support's unpenalized refit.
        from .models.relaxed import relaxed_lasso_path

        if family != "gaussian":
            raise ValueError("relax=True is implemented for "
                             "family='gaussian'")
        # Same lambda convention as the non-relaxed alpha dispatch
        # (glmnet's relax=TRUE reuses the identical lambda sequence).
        return relaxed_lasso_path(X, y, alpha=alpha,
                                  _enet_scale=alpha != 1.0, **kw)
    if family == "gaussian":
        if alpha == 1.0:
            return lasso_path(X, y, **kw)
        return enet_path(X, y, alpha=alpha, **kw)
    if family in ("binomial", "poisson", "huber"):
        # Route through the family wrappers so every family-specific
        # measured default (e.g. poisson's newton_steps=1) applies.
        fn = {"binomial": logistic_lasso_path,
              "poisson": poisson_lasso_path,
              "huber": huber_lasso_path}[family]
        return fn(X, y, alpha=alpha, **kw)
    if family == "multinomial":
        if type_multinomial not in ("ungrouped", "grouped"):
            raise ValueError("type_multinomial must be 'ungrouped' or "
                             "'grouped'")
        return multinomial_lasso_path(
            X, y, alpha=alpha, grouped=type_multinomial == "grouped",
            **kw)
    if family == "mgaussian":
        return multitask_lasso_path(X, y, alpha=alpha, **kw)
    t, d, st = _cox_args(y, time, event)
    if st is not None:
        kw.setdefault("start", st)
    return cox_lasso_path(X, t, d, alpha=alpha, **kw)


def big_glm(X, y=None, family: str = "gaussian", *, weights=None,
            offset=None, lower_limits=None, upper_limits=None,
            intercept: bool = True, time=None, event=None, **kw):
    """One UNPENALIZED fit (glmnet's ``bigGlm``), returned as a
    single-point path result (``lambdas == [0.0]``) that ``predict`` /
    ``assess`` / ``coef`` accept like any other.

    The lambda = 0 point rides the same ADMM engines (the prox
    degenerates to the identity, or to the box clip when limits are
    given), so every family and argument of :func:`glmnet` works;
    meaningful for n > p designs, as in glmnet.  The gaussian engine's
    auto-rho is a power law of lambda (zero at lambda = 0), so rho is
    pinned to 1 there — any positive rho converges to the same
    unpenalized optimum.
    """
    is_glm_obj = _family_object(family) is not None
    if family in ("gaussian", "mgaussian") and "rho" not in kw:
        kw["rho"] = 1.0
    if offset is not None:
        kw["offset"] = offset
    if is_glm_obj or family in ("gaussian", "binomial", "poisson",
                                "huber", "cox"):
        kw["lower_limits"] = lower_limits
        kw["upper_limits"] = upper_limits
    elif lower_limits is not None or upper_limits is not None:
        raise ValueError("coefficient limits are not supported for "
                         f"family {family!r} (glmnet's own multinomial "
                         "restriction)")
    if family != "cox":
        kw["intercept"] = intercept
    if weights is not None:
        kw["weights"] = weights
    return glmnet(X, y, family, lambdas=np.zeros(1),
                  time=time, event=event, **kw)


def cv_glmnet(X, y=None, family: str = "gaussian", *,
              alpha: float = 1.0,
              type_multinomial: str = "ungrouped", relax: bool = False,
              time=None, event=None, **kw):
    """Cross-validate any family's path (glmnet's ``cv.glmnet()``).

    Same dispatch as :func:`glmnet`; every CV keyword (``nfolds``,
    ``foldid``, ``type_measure``, ``keep``, ``fold_mesh``, ``seed``)
    passes through to the family's CV driver.  Returns the driver's
    ``CVResult`` (``lambda_min``/``lambda_1se``, ``cvm``/``cvsd``, the
    full-data ``fit``, and ``fit_preval`` under ``keep=True``).
    """
    from .models.cox import cv_cox_path
    from .models.cv import (cv_enet_path, cv_glm_path, cv_lasso_path,
                            cv_multinomial_path,
                            cv_multitask_lasso_path)

    fam_obj = _family_object(family)
    if fam_obj is not None:
        if relax:
            raise ValueError("relax=True is implemented for "
                             "family='gaussian'")
        return cv_glm_path(X, y, fam_obj, alpha=alpha, **kw)
    if family not in _FAMILIES:
        raise ValueError(f"family must be one of {_FAMILIES} or a "
                         "GLMFamily instance (admm_tpu.models.glm)")
    if relax:
        from .models.relaxed import cv_relaxed_lasso_path

        if family != "gaussian":
            raise ValueError("relax=True is implemented for "
                             "family='gaussian'")
        return cv_relaxed_lasso_path(X, y, alpha=alpha,
                                     _enet_scale=alpha != 1.0, **kw)
    if family == "gaussian":
        if alpha == 1.0:
            return cv_lasso_path(X, y, **kw)
        return cv_enet_path(X, y, alpha=alpha, **kw)
    if family in ("binomial", "poisson", "huber"):
        from .models import glm

        fam = {"binomial": glm.binomial, "poisson": glm.poisson,
               "huber": glm.huber}[family]()
        return cv_glm_path(X, y, fam, alpha=alpha, **kw)
    if family == "multinomial":
        if type_multinomial not in ("ungrouped", "grouped"):
            raise ValueError("type_multinomial must be 'ungrouped' or "
                             "'grouped'")
        return cv_multinomial_path(
            X, y, alpha=alpha, grouped=type_multinomial == "grouped",
            **kw)
    if family == "mgaussian":
        return cv_multitask_lasso_path(X, y, alpha=alpha, **kw)
    t, d, st = _cox_args(y, time, event)
    if st is not None:
        kw.setdefault("start", st)
    return cv_cox_path(X, t, d, alpha=alpha, **kw)
