"""Headline benchmark: full Lasso lambda path on the reference's flagship
problem (n=10000, p=1000, 100 lambdas, seed 123).

Baseline: the reference C++ solver's median wall time of 321.0 ms for the
same path (reference README.md:206-224; see BASELINE.md).  ``vs_baseline``
is the speedup factor (baseline_time / our_time, >1 means faster than the
reference).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = 321.0


def make_problem(n=10000, p=1000, m=100, seed=123):
    rng = np.random.default_rng(seed)
    b = np.zeros(p)
    b[rng.choice(p, m, replace=False)] = rng.uniform(-1, 1, m)
    X = rng.normal(size=(n, p))
    y = 5.0 + X @ b + rng.normal(size=n)
    return X.astype(np.float32), y.astype(np.float32)


def main():
    import jax
    from admm_tpu.models.lasso import lasso_path

    X, y = make_problem()
    dev = jax.devices()[0]
    X = jax.device_put(X, dev)
    y = jax.device_put(y, dev)

    def run():
        res = lasso_path(X, y, nlambda=100)
        jax.block_until_ready(res)
        return res

    res = run()  # compile + warm up
    niter = np.asarray(res.niter)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1e3)
    value = float(np.median(times))

    print(json.dumps({
        "metric": "lasso_path_10000x1000_100lambdas_median_ms",
        "value": round(value, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / value, 3),
    }))
    print(f"# device={dev.platform} times_ms={[round(t, 1) for t in times]}"
          f" total_admm_iters={int(niter.sum())}", file=sys.stderr)


if __name__ == "__main__":
    main()
