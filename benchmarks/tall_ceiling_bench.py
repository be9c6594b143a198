"""Tall kernel around the VMEM ceiling (VERDICT item 5), batch mode.

Measures the Pallas tall kernel vs the XLA fallback at p = 1k (inside
the kernel's one-shot region) and p = 2.5k/4k (past it) on the real TPU
over a 100-lambda batched path.

HISTORY: the recorded tall_ceiling.json rows with ``n_col_blocks > 1``
were produced at commit 5f9bc66 by a TILED x-update variant that kept
the inverse VMEM-resident up to p ~ 4.5k.  It measured SLOWER than the
XLA fallback everywhere it activated (0.60x at p=2.5k, 0.95x at p=4k
batch; 0.46-0.61x scan — see tall_ceiling_scan.json and DESIGN.md "the
tall-kernel ceiling") and was removed; past the ceiling this script now
measures the XLA path only, which IS the shipped behavior.

Run ON THE TPU:  python benchmarks/tall_ceiling_bench.py
Writes benchmarks/tall_ceiling.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_baselines import amortized_ms, regression_problem  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from admm_tpu.data.standardize import standardize
    from admm_tpu.models.lasso import _solve_path_tall_batch
    from admm_tpu.ops.tall_path import supports

    results = {"backend": jax.default_backend(), "sizes": {}}
    k = 100
    for n, p in [(10000, 1000), (12000, 2500), (16000, 4000)]:
        X, y, _ = regression_problem(n, p, p // 10)
        Xs, ys, _ = standardize(jnp.asarray(X), jnp.asarray(y),
                                standardize_x=True, intercept=True)
        lam0 = float(jnp.max(jnp.abs(Xs.T @ ys)))
        ilams = jnp.asarray(np.geomspace(lam0, lam0 * 1e-4, k),
                            jnp.float32)
        row = {"kernel_supported": supports(p, k)}

        # Xs rides through jit arguments, not closures (closed-over
        # arrays become HLO constants; 256 MB overflows remote-compile).
        def one_pallas(i, Xs, ys):
            yy = ys * (1.0 + 1e-6 * (i + 1).astype(ys.dtype))
            c, it, _ = _solve_path_tall_batch(Xs, yy, ilams, -1.0, 10000,
                                              1e-5, 1e-5, 1.0,
                                              pallas_ok=True)
            return jnp.sum(c) + jnp.sum(it).astype(jnp.float32)

        def one_xla(i, Xs, ys):
            yy = ys * (1.0 + 1e-6 * (i + 1).astype(ys.dtype))
            c, it, _ = _solve_path_tall_batch(Xs, yy, ilams, -1.0, 10000,
                                              1e-5, 1e-5, 1.0,
                                              pallas_ok=False)
            return jnp.sum(c) + jnp.sum(it).astype(jnp.float32)

        row["xla_ms"] = amortized_ms(one_xla, 1, 4, args=(Xs, ys))
        if row["kernel_supported"]:
            row["pallas_ms"] = amortized_ms(one_pallas, 1, 4,
                                            args=(Xs, ys))
            row["speedup"] = row["xla_ms"] / row["pallas_ms"]
            # same math: cross-check once
            run = jax.jit(lambda Xs, ys, ok: _solve_path_tall_batch(
                Xs, ys, ilams, -1.0, 10000, 1e-5, 1e-5, 1.0, ok)[:2],
                static_argnums=2)
            cp, ip_ = run(Xs, ys, True)
            cx, ix = run(Xs, ys, False)
            row["coef_gap_vs_xla"] = float(jnp.max(jnp.abs(cp - cx)))
            row["niter_gap"] = int(jnp.max(jnp.abs(ip_ - ix)))
        results["sizes"][f"{n}x{p}"] = row
        print(f"{n}x{p}: {row}", flush=True)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tall_ceiling.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
