"""Pallas TPU kernel: the batched wide-Lasso/Enet lambda path in VMEM.

The wide regime's linearized x-update reads the (n, p) data matrix twice
per ADMM iteration (X' gradient step + the cached-Ax matmul, reference:
src/ADMMLassoWide.h:129-165).  In the XLA batched solver those reads come
from HBM every iteration; at n=1000, p=2000 that is 16 MB of HBM traffic
per iteration for ~1.7 MFLOP of useful work — purely bandwidth-bound.
This kernel keeps X, every lambda lane's state and the per-lane
adaptive-rho ladder resident in VMEM for the whole path.

Math identical to ``make_admm_solver(ops, adapt_rho=True)`` over
``_wide_ops`` vmapped over lanes (engine: admm_tpu/core/engine.py;
reference math: src/ADMMLassoWide.h:13-25, adaptive ladder
src/ADMMBase.h:85-109).  Matmuls at ``precision=HIGHEST``.

VMEM budget gates usage (``supports_wide``): padded N*P + K*(P + 3N)
floats within the static budget (see _VMEM_BUDGET_BYTES); callers fall
back to the XLA solver.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import LANE, enet_prox, round_up

# See admm_tpu/ops/tall_path.py for the budget/cap calibration.
_VMEM_BUDGET_BYTES = 24 * 1024 * 1024


def supports_wide(n: int, p: int, k: int) -> bool:
    """Whether the (n, p, k) wide problem fits the kernel's VMEM budget."""
    N = round_up(max(n, 8), 8)
    P = round_up(max(p, 8), LANE)
    K = round_up(max(k, 8), 8)
    need = 4 * (N * P + 2 * K * P + 3 * K * N + N + 8 * K)
    return need <= _VMEM_BUDGET_BYTES


def _wide_kernel(x_ref_in, ys_ref, lam_ref, rho_ref, scal_ref,
                 x_out, niter_out,
                 z_ref, y_ref, aux_ref, sc_ref,
                 *, true_n: int, true_p: int, num_real: int,
                 rho_start_iter: int):
    """One program: all K wide-Lasso lambda lanes to convergence.

    ``x_ref_in`` is the resident data matrix X (N, P) — named x for the
    design matrix, not the iterate; the primal iterate lives in x_out.
    Lane scalars in ``sc_ref`` columns: [rho, done01, niter, spare].
    """
    K = lam_ref.shape[0]
    eps_abs = scal_ref[0, 0]
    eps_rel = scal_ref[0, 1]
    alpha = scal_ref[0, 2]
    maxit = scal_ref[0, 3].astype(jnp.int32)
    sprad = scal_ref[0, 4]
    lambda0 = scal_ref[0, 5]
    sqrt_n = jnp.sqrt(jnp.float32(true_n))
    sqrt_p = jnp.sqrt(jnp.float32(true_p))
    sqrt_sprad = jnp.sqrt(sprad)

    ys = ys_ref[:]                     # (1, N)
    lam = lam_ref[:].reshape(K, 1)

    rnorm = lambda v: jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))

    prox = lambda v, pen: enet_prox(v, pen, alpha)

    # Cold start; padding lanes (>= num_real) begin frozen.
    for ref in (x_out, z_ref, y_ref, aux_ref):
        ref[:] = jnp.zeros_like(ref)
    pad_done = (jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                >= num_real).astype(jnp.float32)
    sc_ref[:] = jnp.concatenate([
        rho_ref[:].reshape(K, 1),                # per-lane auto-rho
        pad_done,                                 # done01
        jnp.zeros((K, 2), jnp.float32),          # niter, spare
    ], axis=1)

    def cond(c):
        all_done, it = c
        return jnp.logical_and(all_done < 0.5, it < maxit)

    def body(c):
        _, it = c
        x, z, y, aux = x_out[:], z_ref[:], y_ref[:], aux_ref[:]
        sc = sc_ref[:]
        rho = sc[:, 0:1]
        done = sc[:, 1:2]
        niter = sc[:, 2:3]

        # Tolerances from the pre-update state (engine: _tolerances).
        eps_pri = (jnp.maximum(rnorm(aux), rnorm(z)) * eps_rel
                   + sqrt_n * eps_abs)
        eps_dua = sqrt_sprad * rnorm(y) * eps_rel + sqrt_p * eps_abs

        # Linearized x-update (reference: src/ADMMLassoWide.h:129-155).
        tmp = aux + z + y / rho                       # (K, N)
        # X read from its VMEM ref at each use (hoisting spills, see
        # admm_tpu/ops/lad_kernel.py).
        grad = jnp.dot(tmp, x_ref_in[:],
                       preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)   # (K, P) = tmp X
        v = x - grad / sprad
        x_new = prox(v, lam / (rho * sprad))
        # Early exit: lam >= lambda0 keeps beta = 0; relative slack
        # (see admm_tpu/models/lasso.py::_wide_ops).
        x_new = jnp.where(lam > lambda0 * (1.0 - 1e-5),
                          jnp.zeros_like(x_new), x_new)

        # z-update with cached Ax (reference: src/ADMMLassoWide.h:156-165).
        ax = lax.dot_general(x_new, x_ref_in[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)  # (K, N)
        z_new = -(ys + y + rho * ax) / (1.0 + rho)

        r_dua = rho * sqrt_sprad * rnorm(z_new - z)
        r = ax + z_new
        r_pri = rnorm(r)
        y_new = y + rho * r
        now_done = jnp.logical_and(r_pri < eps_pri,
                                   r_dua < eps_dua).astype(jnp.float32)

        # Adaptive-rho ladder, per lane (reference: src/ADMMBase.h:85-109),
        # gated exactly like the engine: skipped when converging or during
        # the first rho_start_iter iterations.
        ratio_p = r_pri / eps_pri
        ratio_d = r_dua / eps_dua
        rho_a = jnp.where(ratio_p > 10.0 * ratio_d, rho * 2.0, rho)
        rho_a = jnp.where(ratio_d > 10.0 * ratio_p, rho_a * 0.5, rho_a)
        rho_a = jnp.where(r_pri < eps_pri, rho_a / 1.2, rho_a)
        rho_a = jnp.where(r_dua < eps_dua, rho_a * 1.2, rho_a)
        hold_rho = jnp.logical_or(now_done > 0.5, it <= rho_start_iter)
        rho_new = jnp.where(hold_rho, rho, rho_a)

        frozen = done > 0.5
        pick = lambda new, old: jnp.where(frozen, old, new)
        x_out[:] = pick(x_new, x)
        z_ref[:] = pick(z_new, z)
        y_ref[:] = pick(y_new, y)
        aux_ref[:] = pick(ax, aux)
        done_new = jnp.maximum(done, now_done)
        sc_ref[:] = jnp.concatenate([
            pick(rho_new, rho), done_new, niter + (1.0 - done),
            sc[:, 3:4],
        ], axis=1)
        return (jnp.min(done_new), it + 1)

    lax.while_loop(cond, body, (jnp.float32(0.0), jnp.int32(0)))
    niter_out[:] = sc_ref[:, 2:3]


@functools.partial(jax.jit,
                   static_argnames=("true_n", "true_p", "rho_start_iter",
                                    "interpret"))
def wide_path_batch_pallas(X, ys, ilams, rhos, sprad, lambda0, eps_abs,
                           eps_rel, alpha, maxit, *, true_n: int,
                           true_p: int, rho_start_iter: int = 3,
                           interpret: bool = False):
    """Solve the batched wide path in one Pallas kernel.

    Args UNPADDED: X (n, p), ys (n,), ilams/rhos (k,).  Returns
    ``(coefs (k, p), niter (k,))`` matching ``_solve_path_wide_batch``.
    """
    n, p = X.shape
    k = ilams.shape[0]
    N = round_up(max(n, 8), 8)
    P = round_up(max(p, 8), LANE)
    K = round_up(max(k, 8), 8)

    X_pad = jnp.zeros((N, P), jnp.float32).at[:n, :p].set(
        X.astype(jnp.float32))
    ys_pad = jnp.zeros((1, N), jnp.float32).at[0, :n].set(
        ys.astype(jnp.float32))
    lam_pad = jnp.ones((K,), jnp.float32).at[:k].set(
        ilams.astype(jnp.float32))
    rho_pad = jnp.ones((K,), jnp.float32).at[:k].set(
        jnp.broadcast_to(rhos, (k,)).astype(jnp.float32))
    scal = jnp.array([[eps_abs, eps_rel, alpha, maxit, sprad, lambda0,
                       0.0, 0.0]], jnp.float32)

    kernel = functools.partial(_wide_kernel, true_n=true_n, true_p=true_p,
                               num_real=k, rho_start_iter=rho_start_iter)
    x, niter = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((K, P), jnp.float32),
                   jax.ShapeDtypeStruct((K, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((K, N), jnp.float32),   # z
                        pltpu.VMEM((K, N), jnp.float32),   # y
                        pltpu.VMEM((K, N), jnp.float32),   # aux (cache Ax)
                        pltpu.VMEM((K, 4), jnp.float32)],  # lane scalars
        # Mosaic's default scoped-vmem limit is 16 MB; the resident X plus
        # live matmul temporaries peak well above that.  v5e cores have
        # far more physical VMEM — raise the cap for this kernel.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(X_pad, ys_pad, lam_pad, rho_pad, scal)
    return x[:k, :p], niter[:k, 0].astype(jnp.int32)
