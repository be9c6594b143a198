"""Dantzig selector and checkpoint/resume demos.

The Dantzig selector is exported-but-broken in the reference (its native
solver was never compiled — SURVEY.md section 2.6 caveat 1); here it is
a first-class model.  The checkpoint demo shows crash-safe lambda-path
solves (no analog in the reference).

Run:  python examples/dantzig_checkpoint_demo.py
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import admm_tpu  # noqa: E402
from admm_tpu.diag.checkpoint import checkpointed_lasso_path  # noqa: E402


def main():
    rng = np.random.default_rng(123)
    n, p = 500, 60
    beta = np.zeros(p)
    beta[:6] = [2.0, -1.5, 1.0, -1.0, 0.8, -0.5]
    X = rng.normal(size=(n, p))
    y = X @ beta + 0.5 * rng.normal(size=n)

    # --- Dantzig selector ----------------------------------------------
    fit = admm_tpu.admm_dantzig(X, y).penalty(nlambda=30).fit()
    coef = fit.beta.toarray()[1:, -10]  # an interior path point
    found = set(np.flatnonzero(np.abs(coef) > 0.2))
    print("Dantzig support found:", sorted(found), "(true: 0..5)")

    # --- Crash-safe path solve ------------------------------------------
    lams = np.geomspace(1.0, 0.01, 40)
    ck = os.path.join(tempfile.gettempdir(), "admm_demo_ck.npz")
    if os.path.exists(ck):
        os.unlink(ck)
    # Simulate a crash after the first chunk...
    out = checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                  chunk_size=10, _stop_after_chunks=1)
    assert out is None and os.path.exists(ck)
    print("checkpoint written after 10/40 lambdas; 'crash' simulated")
    # ...and resume: completed chunks are skipped, results identical.
    res = checkpointed_lasso_path(X, y, lambdas=lams, checkpoint=ck,
                                  chunk_size=10)
    print("resumed and finished:", res.coef.shape, "- checkpoint cleaned:",
          not os.path.exists(ck))


if __name__ == "__main__":
    main()
