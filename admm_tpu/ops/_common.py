"""Shared pieces of the VMEM-resident Pallas kernels.

Every kernel in this package repeats three things: the lane/padding
arithmetic, the use-the-kernel gate (env override + dtype + backend),
and the FADMM Nesterov-momentum/restart bookkeeping (reference:
src/FADMMBase.h:240-256).  They live here once so a fix cannot diverge
between kernels.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

LANE = 128


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_enabled(dtype) -> bool:
    """Common gate: f32 on a real TPU backend, unless disabled by env."""
    if os.environ.get("ADMM_TPU_DISABLE_PALLAS"):
        return False
    return dtype == jnp.float32 and jax.default_backend() == "tpu"


def soft_threshold(v, pen):
    """Elementwise soft-threshold (canonical version:
    admm_tpu/core/prox.py; repeated here in plain jnp so every kernel
    traces the same expression)."""
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - pen, 0.0)


def enet_prox(v, pen, alpha):
    """Elastic-net prox (reference: src/ADMMEnet.h:24-40); ``alpha=1``
    reduces to the soft-threshold."""
    denom = 1.0 + pen * (1.0 - alpha)
    return soft_threshold(v, alpha * pen) / denom


def fadmm_momentum(now_done, rho, r_pri, extra_sq, z_new, y_new, z_old,
                   y_old, adj_z, adj_y, adj_a, adj_c, restart_tol):
    """One FADMM momentum/restart step; pure function of the iterates.

    ``now_done`` must be boolean (scalar or per-lane column); the adj_*
    values are HELD on the converging iteration (the reference breaks
    out of the loop before applying acceleration).  Works for both the
    single-lane kernels (scalars + (1, N) rows) and the batched kernels
    ((K, 1) columns + (K, N) blocks) by broadcasting.

    Returns ``(adj_z_new, adj_y_new, adj_a_new, adj_c_new)``.
    """
    c_new = rho * r_pri * r_pri + rho * extra_sq
    accel = c_new < restart_tol * adj_c
    a_acc = 0.5 + 0.5 * jnp.sqrt(1.0 + 4.0 * adj_a * adj_a)
    ratio = (adj_a - 1.0) / a_acc
    adj_z_new = jnp.where(
        now_done, adj_z,
        jnp.where(accel, (1.0 + ratio) * z_new - ratio * z_old, z_old))
    adj_y_new = jnp.where(
        now_done, adj_y,
        jnp.where(accel, (1.0 + ratio) * y_new - ratio * y_old, y_old))
    adj_a_new = jnp.where(accel, a_acc, jnp.ones_like(a_acc))
    adj_a_new = jnp.where(now_done, adj_a, adj_a_new)
    adj_c_new = jnp.where(accel, c_new, adj_c / restart_tol)
    adj_c_new = jnp.where(now_done, adj_c, adj_c_new)
    return adj_z_new, adj_y_new, adj_a_new, adj_c_new
