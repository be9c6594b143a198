"""Pallas TPU kernel: the whole Basis-Pursuit solve in VMEM.

BP's FADMM iteration is an affine projection — two skinny matvecs
against A plus one n x n matvec against (AA')^{-1}
(reference: src/ADMMBP.h:48-67; module: admm_tpu/models/bp.py).  This
kernel keeps A and (AA')^{-1} resident in VMEM for the whole solve — the
p > n sibling of admm_tpu/ops/lad_kernel.py (same FADMM skeleton,
different projection and state dimension p instead of n).

Math identical to ``make_fadmm_solver(_bp_ops, adapt_rho=False)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import LANE, fadmm_momentum, round_up, soft_threshold

_VMEM_LIMIT = 100 * 1024 * 1024


def supports_bp(n: int, p: int) -> bool:
    """Gate for the BP kernel — currently always False.

    Measured head-to-head at the reference benchmark size (1000 x 2000,
    5-repeat amortized timing): the kernel runs 1.8x SLOWER than the XLA
    solver (2.1 ms vs 1.2 ms).  Unlike LAD — whose hat-matrix iteration
    is one (1, N) x (N, N) matvec that Mosaic tiles well — BP's
    projection needs (1, P) x (P, N) products with p > n, which Mosaic
    tiles poorly at these aspect ratios while XLA's gemv pipeline wins.
    The kernel is kept (and pinned by interpret-mode tests) as the
    starting point if future Mosaic versions close the gap.
    """
    return False


def _bp_pallas_kernel(a_ref, winv_ref, aaab_ref, scal_ref,
                      z_out, niter_out,
                      x_ref, y_ref, adjz_ref, adjy_ref,
                      *, true_n: int, true_p: int, restart_tol: float):
    """One program: the full BP FADMM solve for one problem."""
    rho = scal_ref[0, 0]
    eps_abs = scal_ref[0, 1]
    eps_rel = scal_ref[0, 2]
    maxit = scal_ref[0, 3].astype(jnp.int32)
    sqrt_p = jnp.sqrt(jnp.float32(true_p))

    aaab = aaab_ref[:]                 # (1, P) cached A'(AA')^{-1} b

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v))

    soft = soft_threshold

    def affine_project(v):
        """v + A'(AA')^{-1} b - A'(AA')^{-1} A v, refs read per use
        (hoisting spills — see admm_tpu/ops/lad_kernel.py)."""
        t = lax.dot_general(v, a_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)  # (1, N) = Av
        u = jnp.dot(t, winv_ref[:], preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)          # (1, N)
        corr = jnp.dot(u, a_ref[:], preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)       # (1, P)
        return v + aaab - corr

    for ref in (z_out, x_ref, y_ref, adjz_ref, adjy_ref):
        ref[:] = jnp.zeros_like(ref)

    def cond(c):
        done, it, _, _ = c
        return jnp.logical_and(done < 0.5, it < maxit)

    def body(c):
        _, it, adj_a, adj_c = c
        x, z, y = x_ref[:], z_out[:], y_ref[:]
        adj_z, adj_y = adjz_ref[:], adjy_ref[:]

        eps_pri = (jnp.maximum(rnorm(x), rnorm(z)) * eps_rel
                   + sqrt_p * eps_abs)
        eps_dua = rnorm(y) * eps_rel + sqrt_p * eps_abs

        x_new = affine_project(adj_z - adj_y / rho)
        z_new = soft(x_new + adj_y / rho, 1.0 / rho)
        r_dua = rho * rnorm(z_new - z)
        r = x_new - z_new
        r_pri = rnorm(r)
        y_new = adj_y + rho * r
        now_done = jnp.logical_and(r_pri < eps_pri, r_dua < eps_dua)

        adj_z_new, adj_y_new, adj_a_new, adj_c_new = fadmm_momentum(
            now_done, rho, r_pri, jnp.sum((z_new - adj_z) ** 2),
            z_new, y_new, z, y, adj_z, adj_y, adj_a, adj_c, restart_tol)
        adjz_ref[:] = adj_z_new
        adjy_ref[:] = adj_y_new

        x_ref[:] = x_new
        z_out[:] = z_new
        y_ref[:] = y_new
        return (now_done.astype(jnp.float32), it + 1, adj_a_new,
                adj_c_new)

    _, niter, _, _ = lax.while_loop(
        cond, body, (jnp.float32(0.0), jnp.int32(0), jnp.float32(1.0),
                     jnp.float32(9999.0)))
    niter_out[:] = jnp.full_like(niter_out, niter.astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("true_n", "true_p", "restart_tol",
                                    "interpret"))
def bp_solve_pallas(A, Winv, AAAb, rho, eps_abs, eps_rel, maxit, *,
                    true_n: int, true_p: int, restart_tol: float = 0.999,
                    interpret: bool = False):
    """Run the BP FADMM solve in one Pallas kernel.

    Args UNPADDED: A (n, p), Winv = (AA')^{-1} (n, n), AAAb (p,).
    Returns ``(z (p,), niter)``.
    """
    n, p = A.shape
    N = round_up(max(n, 8), LANE)
    P = round_up(max(p, 8), LANE)

    a_pad = jnp.zeros((N, P), jnp.float32).at[:n, :p].set(
        A.astype(jnp.float32))
    winv_pad = jnp.zeros((N, N), jnp.float32).at[:n, :n].set(
        Winv.astype(jnp.float32))
    aaab_pad = jnp.zeros((1, P), jnp.float32).at[0, :p].set(
        AAAb.astype(jnp.float32))
    scal = jnp.array([[rho, eps_abs, eps_rel, maxit, 0.0, 0.0, 0.0, 0.0]],
                     jnp.float32)

    kernel = functools.partial(_bp_pallas_kernel, true_n=true_n,
                               true_p=true_p, restart_tol=restart_tol)
    z, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, P), jnp.float32),
                   jax.ShapeDtypeStruct((1, LANE), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),   # x
                        pltpu.VMEM((1, P), jnp.float32),   # y
                        pltpu.VMEM((1, P), jnp.float32),   # adj_z
                        pltpu.VMEM((1, P), jnp.float32)],  # adj_y
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(a_pad, winv_pad, aaab_pad, scal)
    return z[0, :p], niter[0, 0].astype(jnp.int32)
