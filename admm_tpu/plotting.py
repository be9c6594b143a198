"""Matplotlib equivalents of the reference's ggplot2 fit plots.

Reference plots: solution path (R/30_admm_lasso.R:189-214), Basis-Pursuit
coefficient stem plot (R/10_admm_bp.R:152-163), LAD fitted-vs-observed
scatter (R/20_admm_lad.R:87-100).
"""
from __future__ import annotations

import numpy as np


def _get_ax(ax):
    if ax is not None:
        return ax
    import matplotlib.pyplot as plt

    _, ax = plt.subplots()
    return ax


def plot_solution_path(lambdas, beta, ax=None):
    """Coefficient paths vs log(lambda); excludes the intercept row and
    all-zero variables, as the reference does."""
    lambdas = np.asarray(lambdas)
    if lambdas.size < 2:
        raise ValueError("need to have at least two lambda values")
    dense = np.asarray(beta.todense()) if hasattr(beta, "todense") \
        else np.asarray(beta)
    coef = dense[1:, :]  # drop intercept row
    keep = np.any(coef != 0, axis=1)
    ax = _get_ax(ax)
    loglam = np.log(lambdas)
    for row in coef[keep]:
        ax.plot(loglam, row, lw=1)
    ax.set_xlabel(r"$\log(\lambda)$")
    ax.set_ylabel("Coefficients")
    ax.set_title("Solution path")
    return ax


def plot_stem(coef, ax=None):
    """Stem plot of Basis-Pursuit coefficients."""
    coef = np.asarray(coef).ravel()
    ax = _get_ax(ax)
    idx = np.arange(coef.size)
    nz = coef != 0
    if nz.any():  # matplotlib's stem rejects empty arrays
        ax.stem(idx[nz], coef[nz])
    ax.axhline(0.0, color="black", lw=0.5)
    ax.set_xlabel("Index")
    ax.set_ylabel("Coefficient")
    ax.set_title("Basis Pursuit solution")
    return ax


def plot_fitted_vs_observed(fitted, observed, ax=None):
    """LAD diagnostic: fitted vs observed with the identity line."""
    ax = _get_ax(ax)
    ax.scatter(np.asarray(observed), np.asarray(fitted), s=8, alpha=0.6)
    lo = min(np.min(observed), np.min(fitted))
    hi = max(np.max(observed), np.max(fitted))
    ax.plot([lo, hi], [lo, hi], color="red", lw=1)
    ax.set_xlabel("Observed")
    ax.set_ylabel("Fitted")
    ax.set_title("LAD fit")
    return ax
