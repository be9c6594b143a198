"""Pallas TPU kernel: batched multi-signal Basis Pursuit in VMEM.

BP's FADMM iteration is an affine projection — products against A plus
one matvec against (AA')^{-1} (reference: src/ADMMBP.h:48-67; module:
admm_tpu/models/bp.py).  Round 1 shipped a SINGLE-RHS kernel and gated
it off: at one lane the (1, P) x (P, N) products are gemvs that Mosaic
tiles poorly and XLA wins 1.8x.  The fix is the same one the wide-Lasso
kernel uses — batch the lanes: this kernel solves M measurement vectors
simultaneously against one resident A and (AA')^{-1}, so every product
is a real (M, ~) x (~, ~) MXU matmul and HBM traffic drops to one read
of the inputs for the WHOLE solve.  It serves ``bp_fit_batch`` — the
compressed-sensing serving workload (m signals, one sensing matrix).

Math identical to ``make_batched_solver(make_fadmm_solver(_bp_ops))``
(lane scalars, freezing, Nesterov restart all as in
admm_tpu/ops/tall_path.py::_kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import LANE, fadmm_momentum, round_up, soft_threshold

# Same calibration as ops/tall_path.py: Mosaic peak ~3-4x resident, cap
# raised to 100 MB.
_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def supports_bp_batch(n: int, p: int, m: int) -> bool:
    """Whether the (n, p, m)-lane batched BP solve fits the budget.

    Round 2 measured a single 1.09x — inside the protocol's noise floor
    — so round 3 re-raced the kernel across four in-gate shapes at the
    shipped defaults (2026-08-17, benchmarks/bp_kernel_recheck.py ->
    bp_kernel_recheck.json):

        1000x2000 m=100  1.11x      500x1500 m=50  1.35x
         800x3000 m=40   1.13x     1000x2000 m=20  1.34x

    The win REPRODUCES and grows at moderate lane counts, where the XLA
    matmuls are bandwidth- rather than compute-bound and VMEM residency
    of A/(AA')^{-1} pays; at m=100 the matmuls approach compute-bound
    and the edge narrows.  Decision: keep (>= 1.15x at two shapes, >1
    everywhere); the single-RHS case still LOSES 1.8x, hence the
    m >= 2 gate."""
    if m < 2:
        return False  # single lane: XLA's gemv pipeline wins (round 1)
    N = round_up(max(n, 8), LANE)
    P = round_up(max(p, 8), LANE)
    M = round_up(max(m, 8), 8)
    need = 4 * (N * P + N * N + 7 * M * P + 2 * M * N + 4 * M)
    return need <= _VMEM_BUDGET_BYTES


def _bp_batch_kernel(a_ref, winv_ref, aaab_ref, scal_ref,
                     z_out, niter_out,
                     x_ref, y_ref, adjz_ref, adjy_ref, sc_ref,
                     *, true_p: int, num_real: int, restart_tol: float):
    """One program: M BP lanes (one per measurement vector) to
    convergence.  Lane scalars in ``sc_ref`` columns:
    [adj_a, adj_c, done01, niter]."""
    M = aaab_ref.shape[0]
    rho = scal_ref[0, 0]
    eps_abs = scal_ref[0, 1]
    eps_rel = scal_ref[0, 2]
    maxit = scal_ref[0, 3].astype(jnp.int32)
    sqrt_p = jnp.sqrt(jnp.float32(true_p))

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))

    def affine_project(v):
        """v + A'(AA')^{-1} b_i - A'(AA')^{-1} A v per lane; refs read
        per use (hoisting spills, see admm_tpu/ops/lad_kernel.py)."""
        t = lax.dot_general(v, a_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)   # (M, N)
        u = jnp.dot(t, winv_ref[:], preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)           # (M, N)
        corr = jnp.dot(u, a_ref[:], preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)        # (M, P)
        return v + aaab_ref[:] - corr

    for ref in (z_out, x_ref, y_ref, adjz_ref, adjy_ref):
        ref[:] = jnp.zeros_like(ref)
    pad_done = (jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
                >= num_real).astype(jnp.float32)
    sc_ref[:] = jnp.concatenate([
        jnp.ones((M, 1), jnp.float32),           # adj_a
        jnp.full((M, 1), 9999.0, jnp.float32),   # adj_c
        pad_done,                                 # done01
        jnp.zeros((M, 1), jnp.float32),          # niter
    ], axis=1)

    def cond(c):
        all_done, it = c
        return jnp.logical_and(all_done < 0.5, it < maxit)

    def body(c):
        _, it = c
        x, z, y = x_ref[:], z_out[:], y_ref[:]
        adj_z, adj_y = adjz_ref[:], adjy_ref[:]
        sc = sc_ref[:]
        adj_a = sc[:, 0:1]
        adj_c = sc[:, 1:2]
        done = sc[:, 2:3]
        niter = sc[:, 3:4]

        eps_pri = (jnp.maximum(rnorm(x), rnorm(z)) * eps_rel
                   + sqrt_p * eps_abs)
        eps_dua = rnorm(y) * eps_rel + sqrt_p * eps_abs

        x_new = affine_project(adj_z - adj_y / rho)
        z_new = soft_threshold(x_new + adj_y / rho, 1.0 / rho)
        r_dua = rho * rnorm(z_new - z)
        r = x_new - z_new
        r_pri = rnorm(r)
        y_new = adj_y + rho * r
        now_done = jnp.logical_and(r_pri < eps_pri,
                                   r_dua < eps_dua).astype(jnp.float32)

        adj_z_new, adj_y_new, adj_a_new, adj_c_new = fadmm_momentum(
            now_done > 0.5, rho, r_pri,
            jnp.sum((z_new - adj_z) ** 2, axis=1, keepdims=True),
            z_new, y_new, z, y, adj_z, adj_y, adj_a, adj_c, restart_tol)

        frozen = done > 0.5
        pick = lambda new, old: jnp.where(frozen, old, new)
        x_ref[:] = pick(x_new, x)
        z_out[:] = pick(z_new, z)
        y_ref[:] = pick(y_new, y)
        adjz_ref[:] = pick(adj_z_new, adj_z)
        adjy_ref[:] = pick(adj_y_new, adj_y)
        done_new = jnp.maximum(done, now_done)
        sc_ref[:] = jnp.concatenate([
            pick(adj_a_new, adj_a), pick(adj_c_new, adj_c), done_new,
            niter + (1.0 - done),
        ], axis=1)
        return (jnp.min(done_new), it + 1)

    lax.while_loop(cond, body, (jnp.float32(0.0), jnp.int32(0)))
    niter_out[:] = sc_ref[:, 3:4]


@functools.partial(jax.jit,
                   static_argnames=("true_p", "restart_tol", "interpret"))
def bp_batch_solve_pallas(A, Winv, AAAB, rho, eps_abs, eps_rel, maxit, *,
                          true_p: int, restart_tol: float = 0.999,
                          interpret: bool = False):
    """Run M batched BP FADMM solves in one Pallas kernel.

    Args UNPADDED: A (n, p), Winv = (AA')^{-1} (n, n), AAAB (m, p) the
    per-signal caches A'(AA')^{-1} b_i.  Returns ``(z (m, p),
    niter (m,))`` matching ``models/bp.py::_bp_fit_batch``.
    """
    n, p = A.shape
    m = AAAB.shape[0]
    N = round_up(max(n, 8), LANE)
    P = round_up(max(p, 8), LANE)
    M = round_up(max(m, 8), 8)

    a_pad = jnp.zeros((N, P), jnp.float32).at[:n, :p].set(
        A.astype(jnp.float32))
    winv_pad = jnp.zeros((N, N), jnp.float32).at[:n, :n].set(
        Winv.astype(jnp.float32))
    aaab_pad = jnp.zeros((M, P), jnp.float32).at[:m, :p].set(
        AAAB.astype(jnp.float32))
    scal = jnp.array([[rho, eps_abs, eps_rel, maxit, 0.0, 0.0, 0.0, 0.0]],
                     jnp.float32)

    kernel = functools.partial(_bp_batch_kernel, true_p=true_p,
                               num_real=m, restart_tol=restart_tol)
    z, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((M, P), jnp.float32),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((M, P), jnp.float32),   # x
                        pltpu.VMEM((M, P), jnp.float32),   # y
                        pltpu.VMEM((M, P), jnp.float32),   # adj_z
                        pltpu.VMEM((M, P), jnp.float32),   # adj_y
                        pltpu.VMEM((M, 4), jnp.float32)],  # lane scalars
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(a_pad, winv_pad, aaab_pad, scal)
    return z[:m, :p], niter[:m, 0].astype(jnp.int32)
