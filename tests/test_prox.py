"""Unit tests for the proximal operators."""
import numpy as np
import pytest

from admm_tpu.core.prox import (box_clamp_neg, enet_prox, soft_threshold)


def test_soft_threshold_basic():
    v = np.array([-3.0, -1.0, -0.5, 0.0, 0.5, 1.0, 3.0], np.float32)
    out = np.asarray(soft_threshold(v, 1.0))
    np.testing.assert_allclose(out, [-2, 0, 0, 0, 0, 0, 2], atol=1e-7)


def test_soft_threshold_zero_penalty_is_identity():
    v = np.linspace(-2, 2, 11).astype(np.float32)
    np.testing.assert_allclose(np.asarray(soft_threshold(v, 0.0)), v,
                               atol=1e-7)


def test_enet_prox_alpha1_is_soft_threshold():
    v = np.random.default_rng(0).normal(size=50).astype(np.float32)
    np.testing.assert_allclose(np.asarray(enet_prox(v, 0.7, 1.0)),
                               np.asarray(soft_threshold(v, 0.7)),
                               atol=1e-7)


def test_enet_prox_alpha0_is_ridge_shrinkage():
    v = np.random.default_rng(0).normal(size=50).astype(np.float32)
    # alpha=0: pure ridge, prox = v / (1 + penalty)
    np.testing.assert_allclose(np.asarray(enet_prox(v, 0.5, 0.0)),
                               v / 1.5, atol=1e-6)


def test_enet_prox_matches_reference_formula():
    # (reference: src/ADMMEnet.h:24-40)
    v = np.array([2.0, -2.0, 0.1, -0.1], np.float32)
    pen, alpha = 0.5, 0.6
    thresh = alpha * pen
    denom = 1 + pen * (1 - alpha)
    expected = np.array([(2 - thresh) / denom, (-2 + thresh) / denom,
                         0.0, 0.0])
    np.testing.assert_allclose(np.asarray(enet_prox(v, pen, alpha)),
                               expected, atol=1e-6)


def test_box_clamp_neg_matches_reference_branches():
    # (reference: src/TODO/ADMMDantzig.h:164-181): z_i = -min(v,lam) if
    # v>0 else min(-v,lam)
    v = np.array([2.0, 0.3, -0.3, -2.0], np.float32)
    lam = 1.0
    np.testing.assert_allclose(np.asarray(box_clamp_neg(v, lam)),
                               [-1.0, -0.3, 0.3, 1.0], atol=1e-7)
