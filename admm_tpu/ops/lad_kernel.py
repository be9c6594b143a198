"""Pallas TPU kernel: the whole LAD (median regression) solve in VMEM.

LAD's FADMM iteration is a projection onto Range(X)
(reference: src/ADMMLAD.h:62-78; module: admm_tpu/models/lad.py).  The
kernel uses the reference's own n <= 2000 trick — the precomputed dense
hat matrix H = X (X'X)^{-1} X' (reference: src/ADMMLAD.h:66-73,
:182-203) — so each iteration is ONE n x n matvec against a VMEM-resident
H instead of three HBM-read matmuls, plus the soft-threshold and the
FADMM bookkeeping.

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

from ._common import LANE, fadmm_momentum, round_up, soft_threshold

# The resident hat matrix is n x n: 4 MB at n = 1000, 36 MB at n = 3000.
# Large single-row matvecs tile worse in Mosaic than XLA's gemv, so the
# gate stays in the regime where VMEM residency wins.
_VMEM_BUDGET_BYTES = 40 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def supports_lad(n: int, p: int) -> bool:
    """Whether the (n, p) LAD problem fits the kernel's VMEM budget
    (the resident buffer is the n x n hat matrix)."""
    N = round_up(max(n, 8), LANE)
    need = 4 * (N * N + 10 * N)
    return need <= _VMEM_BUDGET_BYTES


def _lad_pallas_kernel(hat_ref, ys_ref, scal_ref,
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

    soft = soft_threshold

    def project(v):
        """v @ H (H symmetric).  H is read from its VMEM ref AT THE USE:
        hoisting ``hat_ref[:]`` into a value living across the while_loop
        makes the register allocator spill the whole matrix (measured:
        104 MB of spill slots at n=5000)."""
        return jnp.dot(v, hat_ref[:], preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)       # (1, N)

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

        adj_z_new, adj_y_new, adj_a_new, adj_c_new = fadmm_momentum(
            now_done, rho, r_pri, jnp.sum((z_new - adj_z) ** 2),
            z_new, y_new, z, y, adj_z, adj_y, adj_a, adj_c, restart_tol)
        adjz_out[:] = adj_z_new
        adjy_out[:] = adj_y_new

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
def lad_solve_pallas(H, ys, rho, eps_abs, eps_rel, ynorm, maxit, *,
                     true_n: int, restart_tol: float = 0.999,
                     interpret: bool = False):
    """Run the LAD FADMM solve in one Pallas kernel.

    Args UNPADDED: H (n, n) hat matrix, ys (n,).  Returns
    ``(adj_y (n,), adj_z (n,), niter)`` for the caller's recovery solve.
    """
    n = H.shape[0]
    N = round_up(max(n, 8), LANE)

    hat_pad = jnp.zeros((N, N), jnp.float32).at[:n, :n].set(
        H.astype(jnp.float32))
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
    )(hat_pad, ys_pad, scal)
    return adjy[0, :n], adjz[0, :n], niter[0, 0].astype(jnp.int32)
