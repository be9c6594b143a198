"""Chip race: dense (p,p) minimax vs parallel-pass PAVA sorted-l1 prox
(DESIGN.md "SLOPE isotonic crossover"), plus the p=20,000 SLOPE path
the dense prox cannot run (O(p^2) temporaries).

Run from the repo root: ``python benchmarks/race_slope_isotonic.py``.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.run_baselines import amortized_ms  # noqa: E402
from admm_tpu.models.slope import (bh_sequence, prox_sorted_l1,  # noqa: E402
                                   slope_path)


def main():
    rng = np.random.default_rng(0)
    out = {"prox_crossover": {}}

    for p in (256, 512, 1024, 2048, 4096, 8192):
        v = jnp.asarray(rng.normal(size=p) * 2, jnp.float32)
        lam = jnp.asarray(np.sort(rng.uniform(0.05, 1.0, size=p))[::-1],
                          jnp.float32)
        row = {}
        for method in ("dense", "pava"):
            def one(i, v, lam):
                vv = v * (1.0 + 1e-6 * (i + 1).astype(v.dtype))
                return jnp.sum(prox_sorted_l1(vv, lam, method=method))

            row[method] = amortized_ms(one, 50, 250, args=(v, lam))
        out["prox_crossover"][p] = row
        print(p, row, flush=True)

    # The p=20,000 path: 2000 x 20000 wide regime, 5 scales. The dense
    # prox would need ~4.8 GB of (p,p) f32 temporaries per call.
    n, p = 2000, 20000
    X = rng.normal(size=(n, p)).astype(np.float32)
    b = np.zeros(p, np.float32)
    b[:40] = rng.normal(size=40).astype(np.float32) * 3
    y = X @ b + rng.normal(size=n).astype(np.float32)
    t0 = time.perf_counter()
    res = slope_path(X, y, nlambda=5, lambda_min_ratio=0.1,
                     maxit=2000)
    nnz = [int((np.asarray(c) != 0).sum()) for c in res.coef]
    out["slope_p20000_wall_s"] = time.perf_counter() - t0
    out["slope_p20000_nnz"] = nnz
    out["slope_p20000_niter"] = np.asarray(res.niter).tolist()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
