"""Pallas TPU kernel: the whole LAD (median regression) solve in VMEM.

LAD's FADMM iteration is a projection onto Range(X) — two skinny matvecs
against X plus one p x p matvec against (X'X)^{-1}
(reference: src/ADMMLAD.h:62-78; module: admm_tpu/models/lad.py).  In the
XLA solver both matrices are re-read from HBM every iteration; at
n=1000, p=500 that is ~3 MB/iteration of traffic for ~2 MFLOP.  This
kernel keeps X and the Gram inverse resident in VMEM for the entire
solve (hundreds of iterations) — the single-lane analog of the tall-path
kernels in admm_tpu/ops/tall_path.py.

Math identical to ``make_fadmm_solver(_lad_ops, adapt_rho=False)``.
Returns the terminal (adj_y, adj_z) so the caller performs the
coefficient recovery solve (reference: src/ADMMLAD.h:220-225) outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Measured crossover: at n=1000, p=500 the kernel beats the XLA solver
# 1.9 ms vs 3.0 ms, but at n=5000, p=1000 Mosaic's tiling of the huge
# single-row matvecs loses to XLA's gemv (24 ms vs 7 ms) — so the gate
# admits only the small-resident class where VMEM residency wins.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_lad(n: int, p: int) -> bool:
    """Whether the (n, p) LAD problem fits the kernel's VMEM budget."""
    N = _round_up(max(n, 8), 8)
    P = _round_up(max(p, 8), LANE)
    need = 4 * (N * P + P * P + 10 * N + 2 * P)
    return need <= _VMEM_BUDGET_BYTES


def _lad_pallas_kernel(xa_ref, ginv_ref, ys_ref, scal_ref,
                       adjy_out, adjz_out, niter_out,
                       x_ref, z_ref, y_ref,
                       *, true_n: int, restart_tol: float):
    """One program: the full LAD FADMM solve for one problem."""
    rho = scal_ref[0, 0]
    eps_abs = scal_ref[0, 1]
    eps_rel = scal_ref[0, 2]
    maxit = scal_ref[0, 3].astype(jnp.int32)
    ynorm = scal_ref[0, 4]
    sqrt_n = jnp.sqrt(jnp.float32(true_n))

    ys = ys_ref[:]                     # (1, N)

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v))

    def soft(v, pen):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - pen, 0.0)

    def project(v):
        """X (X'X)^{-1} X' v as three resident matmuls.

        The matrices are read from their VMEM refs AT EACH USE: hoisting
        ``xa_ref[:]`` into a value that lives across the while_loop makes
        the register allocator spill the whole matrix (measured: 104 MB
        of spill slots at n=5000), while per-use reads stream from the
        single-buffered VMEM input window.
        """
        t = jnp.dot(v, xa_ref[:], preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)          # (1, P)
        u = jnp.dot(t, ginv_ref[:], preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)          # (1, P)
        return lax.dot_general(u, xa_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)  # (1, N)

    for ref in (x_ref, z_ref, y_ref, adjz_out, adjy_out):
        ref[:] = jnp.zeros_like(ref)

    def cond(c):
        done, it, _, _ = c
        return jnp.logical_and(done < 0.5, it < maxit)

    def body(c):
        _, it, adj_a, adj_c = c
        x, z, y = x_ref[:], z_ref[:], y_ref[:]
        adj_z, adj_y = adjz_out[:], adjy_out[:]

        # c = ys here, so ||c|| enters the primal scale
        # (reference: src/ADMMLAD.h:57-58).
        eps_pri = (jnp.maximum(jnp.maximum(rnorm(x), rnorm(z)), ynorm)
                   * eps_rel + sqrt_n * eps_abs)
        eps_dua = rnorm(y) * eps_rel + sqrt_n * eps_abs

        x_new = project(ys - adj_y / rho + adj_z)
        z_new = soft(x_new - ys + adj_y / rho, 1.0 / rho)
        r_dua = rho * rnorm(z_new - z)
        r = x_new - ys - z_new
        r_pri = rnorm(r)
        y_new = adj_y + rho * r
        now_done = jnp.logical_and(r_pri < eps_pri, r_dua < eps_dua)

        # FADMM momentum with restart (reference: src/FADMMBase.h:240-256),
        # held on the converging iteration.
        c_new = rho * r_pri * r_pri + rho * jnp.sum((z_new - adj_z) ** 2)
        accel = c_new < restart_tol * adj_c
        a_acc = 0.5 + 0.5 * jnp.sqrt(1.0 + 4.0 * adj_a * adj_a)
        ratio = (adj_a - 1.0) / a_acc
        adjz_out[:] = jnp.where(
            now_done, adj_z,
            jnp.where(accel, (1.0 + ratio) * z_new - ratio * z, z))
        adjy_out[:] = jnp.where(
            now_done, adj_y,
            jnp.where(accel, (1.0 + ratio) * y_new - ratio * y, y))
        hold = jnp.logical_or(now_done, jnp.logical_not(accel))
        adj_a_new = jnp.where(hold, 1.0, a_acc)
        adj_a_new = jnp.where(now_done, adj_a, adj_a_new)
        adj_c_new = jnp.where(accel, c_new, adj_c / restart_tol)
        adj_c_new = jnp.where(now_done, adj_c, adj_c_new)

        x_ref[:] = x_new
        z_ref[:] = z_new
        y_ref[:] = y_new
        return (now_done.astype(jnp.float32), it + 1, adj_a_new,
                adj_c_new)

    _, niter, _, _ = lax.while_loop(
        cond, body, (jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0),
                     jnp.float32(9999.0)))
    niter_out[:] = jnp.full_like(niter_out, niter.astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("true_n", "restart_tol", "interpret"))
def lad_solve_pallas(Xa, Ginv, ys, rho, eps_abs, eps_rel, ynorm, maxit, *,
                     true_n: int, restart_tol: float = 0.999,
                     interpret: bool = False):
    """Run the LAD FADMM solve in one Pallas kernel.

    Args UNPADDED: Xa (n, q), Ginv (q, q), ys (n,).  Returns
    ``(adj_y (n,), adj_z (n,), niter)`` for the caller's recovery solve.
    """
    n, q = Xa.shape
    N = _round_up(max(n, 8), 8)
    P = _round_up(max(q, 8), LANE)

    xa_pad = jnp.zeros((N, P), jnp.float32).at[:n, :q].set(
        Xa.astype(jnp.float32))
    ginv_pad = jnp.zeros((P, P), jnp.float32).at[:q, :q].set(
        Ginv.astype(jnp.float32))
    ys_pad = jnp.zeros((1, N), jnp.float32).at[0, :n].set(
        ys.astype(jnp.float32))
    scal = jnp.array([[rho, eps_abs, eps_rel, maxit, ynorm, 0.0, 0.0, 0.0]],
                     jnp.float32)

    kernel = functools.partial(_lad_pallas_kernel, true_n=true_n,
                               restart_tol=restart_tol)
    adjy, adjz, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, LANE), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32),   # x
                        pltpu.VMEM((1, N), jnp.float32),   # z
                        pltpu.VMEM((1, N), jnp.float32)],  # y
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xa_pad, ginv_pad, ys_pad, scal)
    return adjy[0, :n], adjz[0, :n], niter[0, 0].astype(jnp.int32)
