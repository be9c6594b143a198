"""Pallas TPU kernel: the batched fixed-majorizer GLM path in VMEM.

The XLA batched GLM solver (models/glm.py, hessian="fixed") re-reads the
(n, q) design matrix from HBM four times per ADMM iteration (two Newton
steps x two matmuls) plus the (q, q) majorizer inverse — at 2000 x 200
that is ~6.5 MB of HBM traffic per iteration for ~0.1 MB of state, so
the iteration is bandwidth-bound.  This kernel runs the WHOLE batched
path — every lambda lane, every iteration, the masked elastic-net prox
and the Boyd stopping rule — inside one ``pallas_call`` with the design
matrix, the majorizer inverse, the response and all lane state resident
in VMEM.  HBM traffic drops to one read of the inputs and one write of
the outputs.

Math identical to ``make_batched_solver(make_admm_solver(_glm_ops))``
with the fixed majorizer (models/glm.py; engine:
admm_tpu/core/engine.py).  Families: binomial and huber — the two
bounded-curvature families the fixed majorizer serves (poisson keeps
the exact-Hessian XLA engine).  Matmuls at ``precision=HIGHEST`` (the
bf16 MXU default loses enough digits to break the convergence test —
ops/tall_path.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import LANE, round_up, soft_threshold

_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def supports_glm(n: int, q: int, k: int) -> bool:
    """Whether the (n, q, k)-lane batched GLM solve fits the budget
    (design matrix + majorizer inverse + lane state + the (K, N) linear
    predictor).

    Measured on chip (2026-08-17, 2000x200, 30 lambdas, shipped
    defaults): kernel 0.123 ms vs XLA 0.356 ms for binomial (2.9x) and
    0.189 vs 0.328 ms for huber (1.7x) — the XLA branch re-reads the
    design matrix from HBM four times per iteration; residency removes
    that traffic."""
    N = round_up(max(n, 8), LANE)
    Q = round_up(max(q, 8), LANE)
    K = round_up(max(k, 8), 8)
    need = 4 * (N * Q + Q * Q + 2 * K * N + 5 * K * Q + N + Q + 5 * K)
    return need <= _VMEM_BUDGET_BYTES


def _glm_kernel(xa_ref, minv_ref, ys_ref, mask_ref, lam_ref, scal_ref,
                z_out, niter_out, x_ref, y_ref, sc_ref,
                *, family: str, huber_m: float, newton_steps: int,
                true_q: int, n_total: int, num_real: int):
    """One program: all K lambda lanes of the fixed-majorizer GLM path
    to convergence.  Plain-ADMM engine (no momentum — the GLM engines
    run make_admm_solver, models/glm.py).  Lane scalars in ``sc_ref``
    columns: [done01, niter]."""
    K = lam_ref.shape[0]
    rho = scal_ref[0, 0]
    eps_abs = scal_ref[0, 1]
    eps_rel = scal_ref[0, 2]
    alpha = scal_ref[0, 3]
    maxit = scal_ref[0, 4].astype(jnp.int32)
    sqrt_q = jnp.sqrt(jnp.float32(true_q))
    inv_n = 1.0 / jnp.float32(n_total)
    lam = lam_ref[:].reshape(K, 1)

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))

    def fam_grad(U):
        ys = ys_ref[:]  # (1, N), read at use site (no hoisting)
        if family == "binomial":
            return jax.nn.sigmoid(U) - ys
        # huber: dloss/deta = -clip(y - eta, -M, M)
        return -jnp.clip(ys - U, -huber_m, huber_m)

    def newton(v, B):
        for _ in range(newton_steps):
            U = lax.dot_general(B, xa_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)  # (K,N)
            G = fam_grad(U)
            grad = (jnp.dot(G, xa_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST) * inv_n
                    + rho * (B - v))
            B = B - jnp.dot(grad, minv_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        return B

    for ref in (z_out, x_ref, y_ref):
        ref[:] = jnp.zeros_like(ref)
    pad_done = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                >= num_real).astype(jnp.float32)
    sc_ref[:] = jnp.concatenate(
        [pad_done, jnp.zeros((K, 1), jnp.float32)], axis=1)

    def cond(c):
        all_done, it = c
        return jnp.logical_and(all_done < 0.5, it < maxit)

    def body(c):
        _, it = c
        x, z, y = x_ref[:], z_out[:], y_ref[:]
        sc = sc_ref[:]
        done = sc[:, 0:1]
        niter = sc[:, 1:2]

        eps_pri = (jnp.maximum(rnorm(x), rnorm(z)) * eps_rel
                   + sqrt_q * eps_abs)
        eps_dua = rnorm(y) * eps_rel + sqrt_q * eps_abs
        x_new = newton(z - y / rho, x)
        # Masked elastic-net prox (intercept row unpenalized).
        vv = x_new + y / rho
        pen = lam / rho * mask_ref[:]          # (K, 1) * (1, Q)
        zl1 = soft_threshold(vv, alpha * pen)
        z_new = zl1 / (1.0 + pen * (1.0 - alpha))
        r_dua = rho * rnorm(z_new - z)
        r = x_new - z_new
        r_pri = rnorm(r)
        y_new = y + rho * r
        now_done = jnp.logical_and(r_pri < eps_pri,
                                   r_dua < eps_dua).astype(jnp.float32)

        frozen = done > 0.5
        pick = lambda new, old: jnp.where(frozen, old, new)
        x_ref[:] = pick(x_new, x)
        z_out[:] = pick(z_new, z)
        y_ref[:] = pick(y_new, y)
        done_new = jnp.maximum(done, now_done)
        sc_ref[:] = jnp.concatenate(
            [done_new, niter + (1.0 - done)], axis=1)
        return (jnp.min(done_new), it + 1)

    lax.while_loop(cond, body, (jnp.float32(0.0), jnp.int32(0)))
    niter_out[:] = sc_ref[:, 1:2]


@functools.partial(jax.jit, static_argnames=(
    "family", "huber_m", "newton_steps", "true_q", "n_total",
    "interpret"))
def glm_batch_path_pallas(Xa, Minv, ys, pen_mask, lams, rho, eps_abs,
                          eps_rel, alpha, maxit, *, family: str,
                          huber_m: float, newton_steps: int, true_q: int,
                          n_total: int, interpret: bool = False):
    """Run the K-lane batched fixed-majorizer GLM path in one kernel.

    Args UNPADDED: Xa (n, q) incl. the ones column, Minv (q, q) the
    majorizer inverse, ys (n,), pen_mask (q,), lams (k,) USER-scale.
    Returns ``(z (k, q), niter (k,))`` matching the XLA batch branch of
    models/glm.py::_glm_path.
    """
    n, q = Xa.shape
    k = lams.shape[0]
    N = round_up(max(n, 8), LANE)
    Q = round_up(max(q, 8), LANE)
    K = round_up(max(k, 8), 8)

    xa_pad = jnp.zeros((N, Q), jnp.float32).at[:n, :q].set(
        Xa.astype(jnp.float32))
    minv_pad = jnp.zeros((Q, Q), jnp.float32).at[:q, :q].set(
        Minv.astype(jnp.float32))
    ys_pad = jnp.zeros((1, N), jnp.float32).at[0, :n].set(
        ys.astype(jnp.float32))
    # Padded coordinates carry mask 1 (penalized): with Minv zero there
    # they never move and the prox keeps them at exactly 0.
    mask_pad = jnp.ones((1, Q), jnp.float32).at[0, :q].set(
        pen_mask.astype(jnp.float32))
    lam_pad = jnp.zeros((K,), jnp.float32).at[:k].set(
        lams.astype(jnp.float32))
    scal = jnp.array([[rho, eps_abs, eps_rel, alpha, maxit, 0.0, 0.0,
                       0.0]], jnp.float32)

    kernel = functools.partial(
        _glm_kernel, family=family, huber_m=float(huber_m),
        newton_steps=int(newton_steps), true_q=true_q, n_total=n_total,
        num_real=k)
    z, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((K, Q), jnp.float32),
                   jax.ShapeDtypeStruct((K, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((K, Q), jnp.float32),   # x
                        pltpu.VMEM((K, Q), jnp.float32),   # y
                        pltpu.VMEM((K, 2), jnp.float32)],  # lane scalars
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xa_pad, minv_pad, ys_pad, mask_pad, lam_pad, scal)
    return z[:k, :q], niter[:k, 0].astype(jnp.int32)
