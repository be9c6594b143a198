"""Re-verify (or retire) the batched BP Pallas kernel (VERDICT r3 #9).

Round 2 measured the kernel at 1.09x over XLA at ONE shape — within the
noise floor of the two-point amortized protocol.  This harness races the
kernel against the XLA batched solver across several in-gate shapes at
the shipped defaults (eps 2e-5, rho 5); the decision rule from the
verdict: keep the kernel only if the win reproduces >= 1.15x somewhere,
else delete it like the single-RHS variant.

Writes benchmarks/bp_kernel_recheck.json.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.run_baselines import amortized_ms, bp_problem  # noqa: E402


def main():
    import jax.numpy as jnp
    from admm_tpu.core.engine import make_batched_solver, make_fadmm_solver
    from admm_tpu.linalg import chol_inverse, dot, tgram
    from admm_tpu.models.bp import _bp_ops
    from admm_tpu.models.lasso import _batched_cold_states
    from admm_tpu.ops.bp_kernel import (bp_batch_solve_pallas,
                                        supports_bp_batch)

    rho, eps = 5.0, 2e-5
    shapes = [(1000, 2000, 100), (500, 1500, 50), (800, 3000, 40),
              (1000, 2000, 20)]
    results = {}
    for n, p, m in shapes:
        assert supports_bp_batch(n, p, m), (n, p, m)
        A, _, _ = bp_problem(n, p, min(m, n // 2))
        rng = np.random.default_rng(7)
        X0 = np.zeros((m, p), np.float32)
        for i in range(m):
            idx = rng.choice(p, n // 10, replace=False)
            X0[i, idx] = rng.normal(size=n // 10)
        B = (X0 @ A.T).astype(np.float32)
        Aj, Bj = jnp.asarray(A), jnp.asarray(B)

        def kern(i, Aj, Bj):
            BB = Bj * (1.0 + 1e-6 * (i + 1).astype(Bj.dtype))
            AAt = tgram(Aj)
            Winv = chol_inverse(AAt, jitter=1e-6)
            AAAB = dot(BB, dot(Winv, Aj))
            z, niter = bp_batch_solve_pallas(Aj, Winv, AAAB, rho, eps,
                                             eps, 10000, true_p=p)
            return jnp.sum(z) + jnp.sum(niter).astype(jnp.float32)

        def xla(i, Aj, Bj):
            BB = Bj * (1.0 + 1e-6 * (i + 1).astype(Bj.dtype))
            AAt = tgram(Aj)
            Winv = chol_inverse(AAt, jitter=1e-6)
            K = dot(Winv, Aj)
            AAAB = dot(BB, dot(Winv, Aj))
            ops = _bp_ops(Aj, K, n, p, lambda st: st.aux)
            solve = make_batched_solver(make_fadmm_solver(
                ops, adapt_rho=False))
            st = _batched_cold_states(m, p, rho,
                                      jnp.zeros((m,), jnp.float32),
                                      jnp.float32, aux_dim=p)
            st = st._replace(aux=AAAB)
            st = solve(st, 10000, eps, eps)
            return jnp.sum(st.z) + jnp.sum(st.it).astype(jnp.float32)

        ms_k = amortized_ms(kern, 1, 4, args=(Aj, Bj))
        ms_x = amortized_ms(xla, 1, 4, args=(Aj, Bj))
        results[f"{n}x{p}_m{m}"] = dict(
            kernel_ms=round(ms_k, 2), xla_ms=round(ms_x, 2),
            speedup=round(ms_x / ms_k, 3))
        print(f"{n}x{p} m={m}: kernel {ms_k:8.2f} ms  xla {ms_x:8.2f} ms"
              f"  -> {ms_x / ms_k:5.2f}x", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bp_kernel_recheck.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
