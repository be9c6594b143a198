"""Pallas TPU kernel: the entire tall-Lasso/Enet lambda path in VMEM.

Why this kernel exists: in the XLA batched path solver
(admm_tpu/models/lasso.py), the while_loop state and the cached ridge
inverse live in HBM — every ADMM iteration re-reads the (p, p) inverse
(4 MB at p=1024) from HBM, so the iteration is HBM-bandwidth-bound even
though the MXU could re-use the matrix from on-chip memory.  This kernel
runs the WHOLE batched FADMM path — every lambda lane, every iteration,
the Boyd stopping rule and the Nesterov restart logic — inside one
``pallas_call`` with the inverse, the iterates and the lambda grid
resident in VMEM.  HBM traffic drops to one read of the inputs and one
write of the outputs, and the per-iteration cost approaches pure MXU/VPU
latency.

The math is identical to ``make_fadmm_solver`` + ``make_batched_solver``
over ``_tall_ops`` (engine: admm_tpu/core/engine.py; reference math:
src/ADMMLassoTall.h:70-97, src/FADMMBase.h:219-265).  Matmuls run at
``precision=HIGHEST`` (f32-accurate passes) — DEFAULT MXU precision is
bf16 and loses ~3 digits, enough to break the convergence test.

VMEM budget gates usage: padded P^2 + ~7*K*P floats within the static
budget (see _VMEM_BUDGET_BYTES); ``supports()`` checks this and callers
fall back to the XLA solver.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import LANE, enet_prox, fadmm_momentum, round_up

# Static-estimate budget for the supports() gates.  Mosaic's peak scoped
# allocation runs ~3-4x the sum of resident buffers (live matmul
# temporaries, double-buffered refs) when the x-update reads the WHOLE
# (P, P) inverse in one dot; with the kernel's scoped-vmem cap raised to
# 100 MB (v5e has 128 MB VMEM), a 24 MB static estimate keeps that peak
# safely under the cap (measured empirically: 22 MB estimate compiles,
# 38 MB does not).
#
# Why there is deliberately NO tiled mode past this ceiling: a
# column-block x-update that keeps the inverse resident up to p ~ 4.5k
# was built and raced against the XLA fallback on the real chip
# (benchmarks/tall_ceiling*.json, DESIGN.md "the tall-kernel ceiling").
# It LOST everywhere it activated — batch mode is MXU-compute-bound at
# p >= 2.5k (k = 100 lanes give the XLA matmul full arithmetic
# intensity; residency saves bandwidth nobody is waiting on: 0.60x at
# p=2.5k, 0.95x at p=4k), and scan mode's single-row block dots hit the
# same Mosaic weak spot as the single-RHS BP kernel (0.46-0.61x).  The
# fallback past the ceiling is not a penalty; it is the faster path.
_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def supports(p: int, k: int) -> bool:
    """Whether the (p, k) problem fits the kernel's VMEM budget (the
    measured-crossover gate — see the note above)."""
    P = round_up(max(p, 8), LANE)
    K = round_up(max(k, 8), 8)
    need = 4 * (P * P + 8 * K * P + 4 * K)
    return need <= _VMEM_BUDGET_BYTES


def supports_scan(p: int, k: int) -> bool:
    """VMEM budget for the scan-mode kernel: the inverse plus one lane of
    state plus the (K, P) output."""
    P = round_up(max(p, 8), LANE)
    K = round_up(max(k, 8), 8)
    need = 4 * (P * P + K * P + 8 * P + 2 * K)
    return need <= _VMEM_BUDGET_BYTES and K <= 1024


def _kernel(minv_ref, xty_ref, lam_ref, scal_ref, z_out, niter_out,
            x_ref, y_ref, adjz_ref, adjy_ref, sc_ref,
            *, true_p: int, restart_tol: float, num_real: int):
    """One program: solves all K lambda lanes to convergence.

    All per-lane state lives in VMEM refs (z in the output ref); the
    while_loop carries only two scalars — Mosaic mis-lays-out (K, 1)
    vectors carried through a while_loop, so vector state goes through
    refs instead.  ``sc_ref`` packs the per-lane scalars as columns:
    [adj_a, adj_c, done01, niter].
    """
    K = lam_ref.shape[0]
    rho = scal_ref[0, 0]
    eps_abs = scal_ref[0, 1]
    eps_rel = scal_ref[0, 2]
    alpha = scal_ref[0, 3]
    maxit = scal_ref[0, 4].astype(jnp.int32)
    sqrt_p = jnp.sqrt(jnp.float32(true_p))

    xty = xty_ref[:]                   # (1, P)
    lam = lam_ref[:].reshape(K, 1)     # (K, 1) per-lane internal lambda

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))

    prox = lambda v, pen: enet_prox(v, pen, alpha)

    # Cold start (reference: src/ADMMLassoTall.h:179-216).  Padding lanes
    # (index >= num_real) start frozen at done=1 with x=z=0 so they never
    # run an iteration and never gate the stopping test.
    for ref in (z_out, x_ref, y_ref, adjz_ref, adjy_ref):
        ref[:] = jnp.zeros_like(ref)
    pad_done = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                >= num_real).astype(jnp.float32)
    sc_ref[:] = jnp.concatenate([
        jnp.ones((K, 1), jnp.float32),           # adj_a
        jnp.full((K, 1), 9999.0, jnp.float32),   # adj_c
        pad_done,                                 # done01
        jnp.zeros((K, 1), jnp.float32),          # niter
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
        # x-update: one (K,P)x(P,P) matmul against the resident inverse
        # (reference: src/ADMMLassoTall.h:70-80; Minv is symmetric so the
        # row-vector form equals Minv @ rhs).
        rhs = xty - adj_y + rho * adj_z
        # minv is read from its VMEM ref at the use site: hoisting it out
        # of the while_loop makes the register allocator spill the whole
        # matrix (see admm_tpu/ops/lad_kernel.py).
        x_new = jnp.dot(rhs, minv_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        z_new = prox(x_new + adj_y / rho, lam / rho)
        r_dua = rho * rnorm(z_new - z)
        r = x_new - z_new
        r_pri = rnorm(r)
        y_new = adj_y + rho * r
        now_done = jnp.logical_and(r_pri < eps_pri,
                                   r_dua < eps_dua).astype(jnp.float32)

        # Nesterov acceleration with restart, held on the converging
        # iteration (shared helper, reference: src/FADMMBase.h:240-256).
        adj_z_new, adj_y_new, adj_a_new, adj_c_new = fadmm_momentum(
            now_done > 0.5, rho, r_pri,
            jnp.sum((z_new - adj_z) ** 2, axis=1, keepdims=True),
            z_new, y_new, z, y, adj_z, adj_y, adj_a, adj_c, restart_tol)

        # Freeze lanes that converged on an earlier iteration.
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


def _scan_kernel(minv_ref, xty_ref, lam_ref, scal_ref, z_out, niter_out,
                 x_ref, z_ref, y_ref, adjz_ref, adjy_ref,
                 *, num_lams: int, true_p: int, restart_tol: float,
                 K: int):
    """Sequential warm-started lambda path, one lane, inverse resident.

    The reference's own path protocol (reference: src/Lasso.cpp:97-124 —
    host loop of init_warm + solve) as a single kernel: an outer
    fori_loop over lambdas around an inner while_loop of FADMM
    iterations.  Vector state lives in VMEM scratch refs; the loop
    carries only scalars (Mosaic mis-lays-out small vectors carried
    through while_loop).  Math identical to ``make_fadmm_solver`` over
    ``_tall_ops`` with ``warm_start`` between lambdas.
    """
    rho = scal_ref[0, 0]
    eps_abs = scal_ref[0, 1]
    eps_rel = scal_ref[0, 2]
    alpha = scal_ref[0, 3]
    maxit = scal_ref[0, 4].astype(jnp.int32)
    sqrt_p = jnp.sqrt(jnp.float32(true_p))

    xty = xty_ref[:]                   # (1, P)

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v))

    prox = lambda v, pen: enet_prox(v, pen, alpha)

    # Cold start (reference: src/ADMMLassoTall.h:179-216).
    for ref in (x_ref, z_ref, y_ref, adjz_ref, adjy_ref):
        ref[:] = jnp.zeros_like(ref)
    niter_out[:] = jnp.zeros_like(niter_out)
    lane_ids = lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def lam_body(kk, _):
        lam = lam_ref[0, kk]

        def cond(c):
            done, it, _, _ = c
            return jnp.logical_and(done < 0.5, it < maxit)

        def body(c):
            _, it, adj_a, adj_c = c
            x, z, y = x_ref[:], z_ref[:], y_ref[:]
            adj_z, adj_y = adjz_ref[:], adjy_ref[:]

            eps_pri = (jnp.maximum(rnorm(x), rnorm(z)) * eps_rel
                       + sqrt_p * eps_abs)
            eps_dua = rnorm(y) * eps_rel + sqrt_p * eps_abs
            # x-update against the resident inverse
            # (reference: src/ADMMLassoTall.h:70-80).
            rhs = xty - adj_y + rho * adj_z
            x_new = jnp.dot(rhs, minv_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
            z_new = prox(x_new + adj_y / rho, lam / rho)
            r_dua = rho * rnorm(z_new - z)
            r = x_new - z_new
            r_pri = rnorm(r)
            y_new = adj_y + rho * r
            now_done = jnp.logical_and(r_pri < eps_pri, r_dua < eps_dua)

            adj_z_new, adj_y_new, adj_a_new, adj_c_new = fadmm_momentum(
                now_done, rho, r_pri, jnp.sum((z_new - adj_z) ** 2),
                z_new, y_new, z, y, adj_z, adj_y, adj_a, adj_c,
                restart_tol)
            adjz_ref[:] = adj_z_new
            adjy_ref[:] = adj_y_new

            x_ref[:] = x_new
            z_ref[:] = z_new
            y_ref[:] = y_new
            return (now_done.astype(jnp.float32), it + 1, adj_a_new,
                    adj_c_new)

        # Warm start: keep x/z/y and rho, re-sync momentum
        # (engine: admm_tpu/core/engine.py::warm_start).
        adjz_ref[:] = z_ref[:]
        adjy_ref[:] = y_ref[:]
        _, niter, _, _ = lax.while_loop(
            cond, body, (jnp.float32(0.0), jnp.int32(0),
                         jnp.float32(1.0), jnp.float32(9999.0)))
        z_out[pl.ds(kk, 1), :] = z_ref[:]
        # Mosaic cannot store scalars to VMEM: write niter as a masked
        # full-row VPU update instead.
        niter_out[:] = jnp.where(lane_ids == kk,
                                 niter.astype(jnp.float32), niter_out[:])
        return 0

    lax.fori_loop(0, num_lams, lam_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("true_p", "restart_tol", "interpret"))
def tall_path_scan_pallas(Minv, Xty, ilams, rho, eps_abs, eps_rel, alpha,
                          maxit, *, true_p: int, restart_tol: float = 0.999,
                          interpret: bool = False):
    """Warm-started sequential lambda path in one Pallas kernel.

    Args UNPADDED: Minv (p, p), Xty (p,), ilams (k,).  Returns
    ``(coefs (k, p), niter (k,))`` matching ``_solve_path_tall``.
    """
    p = Minv.shape[0]
    k = ilams.shape[0]
    P = round_up(max(p, 8), LANE)
    K = round_up(max(k, 8), 8)

    minv_pad = jnp.zeros((P, P), jnp.float32).at[:p, :p].set(
        Minv.astype(jnp.float32))
    xty_pad = jnp.zeros((1, P), jnp.float32).at[0, :p].set(
        Xty.astype(jnp.float32))
    lam_pad = jnp.zeros((1, K), jnp.float32).at[0, :k].set(
        ilams.astype(jnp.float32))
    scal = jnp.array([[rho, eps_abs, eps_rel, alpha, maxit, 0.0, 0.0, 0.0]],
                     jnp.float32)

    kernel = functools.partial(_scan_kernel, num_lams=k, true_p=true_p,
                               restart_tol=restart_tol, K=K)
    z, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((K, P), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K), memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),   # x
                        pltpu.VMEM((1, P), jnp.float32),   # z
                        pltpu.VMEM((1, P), jnp.float32),   # y
                        pltpu.VMEM((1, P), jnp.float32),   # adj_z
                        pltpu.VMEM((1, P), jnp.float32)],  # adj_y
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(minv_pad, xty_pad, lam_pad, scal)
    return z[:k, :p], niter[0, :k].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("true_p", "restart_tol", "interpret"))
def tall_path_batch_pallas(Minv, Xty, ilams, rho, eps_abs, eps_rel, alpha,
                           maxit, *, true_p: int, restart_tol: float = 0.999,
                           interpret: bool = False):
    """Solve the batched tall path in one Pallas kernel.

    Args are UNPADDED: Minv (p, p), Xty (p,), ilams (k,).  Returns
    ``(coefs (k, p), niter (k,))`` matching ``_solve_path_tall_batch``.
    """
    p = Minv.shape[0]
    k = ilams.shape[0]
    P = round_up(max(p, 8), LANE)
    K = round_up(max(k, 8), 8)

    minv_pad = jnp.zeros((P, P), jnp.float32).at[:p, :p].set(
        Minv.astype(jnp.float32))
    xty_pad = jnp.zeros((1, P), jnp.float32).at[0, :p].set(
        Xty.astype(jnp.float32))
    # Padding lanes start frozen (done=1 in the kernel); any finite
    # lambda keeps their (discarded) arithmetic NaN-free.
    lam_pad = jnp.full((K,), 1.0, jnp.float32).at[:k].set(
        ilams.astype(jnp.float32))
    scal = jnp.array([[rho, eps_abs, eps_rel, alpha, maxit, 0.0, 0.0, 0.0]],
                     jnp.float32)

    kernel = functools.partial(_kernel, true_p=true_p,
                               restart_tol=restart_tol, num_real=k)
    z, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((K, P), jnp.float32),
                   jax.ShapeDtypeStruct((K, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((K, P), jnp.float32),   # x
                        pltpu.VMEM((K, P), jnp.float32),   # y
                        pltpu.VMEM((K, P), jnp.float32),   # adj_z
                        pltpu.VMEM((K, P), jnp.float32),   # adj_y
                        pltpu.VMEM((K, 4), jnp.float32)],  # lane scalars
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(minv_pad, xty_pad, lam_pad, scal)
    return z[:k, :p], niter[:k, 0].astype(jnp.int32)
