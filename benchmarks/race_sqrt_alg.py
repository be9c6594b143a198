"""Race the sqrt-lasso algorithms on the chip (DESIGN.md "sqrt-lasso
algorithm race"): stacked splitting vs concomitant alternation on the
BASELINE 10000 x 500 x 30-lambda row, both protocols for the winner.

Run from the repo root: ``python benchmarks/race_sqrt_alg.py``.
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from benchmarks.run_baselines import amortized_ms  # noqa: E402
from admm_tpu.models.sqrtlasso import _sqrt_path_dev  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n, p = 10000, 500
    X = rng.normal(size=(n, p))
    b = np.zeros(p)
    b[:25] = rng.normal(size=25) * 2
    y = X @ b + rng.normal(size=n)
    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)

    def make(algorithm, path_mode):
        def one(i, Xj, yj):
            yy = yj * (1.0 + 1e-6 * (i + 1).astype(yj.dtype))
            res = _sqrt_path_dev(Xj, yy, 30, 1e-2, None,
                                 jnp.float32(-1.0), 10000, 1e-6, 1e-6,
                                 standardize_x=True, intercept=True,
                                 path_mode=path_mode,
                                 algorithm=algorithm)
            return jnp.sum(res.coef) + jnp.sum(res.niter)
        return one

    out = {}
    for alg, mode, ks in [("stacked", "batch", (1, 3)),
                          ("concomitant", "batch", (2, 10)),
                          ("concomitant", "scan", (2, 10))]:
        key = f"sqrt_{alg}_{mode}_ms"
        out[key] = amortized_ms(make(alg, mode), *ks, args=(Xj, yj))
        print(key, out[key], flush=True)

    # Coefficient agreement between the two algorithms at bench eps.
    ra = _sqrt_path_dev(Xj, yj, 30, 1e-2, None, jnp.float32(-1.0),
                        10000, 1e-6, 1e-6, standardize_x=True,
                        intercept=True, path_mode="batch",
                        algorithm="concomitant")
    rb = _sqrt_path_dev(Xj, yj, 30, 1e-2, None, jnp.float32(-1.0),
                        10000, 1e-6, 1e-6, standardize_x=True,
                        intercept=True, path_mode="batch",
                        algorithm="stacked")
    out["max_coef_gap"] = float(jnp.max(jnp.abs(ra.coef - rb.coef)))
    out["niter_concomitant_total"] = int(jnp.sum(ra.niter))
    out["niter_stacked_total"] = int(jnp.sum(rb.niter))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
