"""Lasso / Elastic-Net lambda-path demo.

Mirrors the reference README's first example (reference:
/root/reference/README.md:34-123): fit a full regularization path,
compare serial vs consensus-parallel solutions, and draw the solution
path.

Run:  python examples/lasso_path_demo.py  (any backend; saves PNGs here)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import admm_tpu  # noqa: E402


def main():
    rng = np.random.default_rng(123)
    n, p = 1000, 100
    beta = np.zeros(p)
    beta[:10] = rng.uniform(-1, 1, 10)
    X = rng.normal(size=(n, p))
    y = 5.0 + X @ beta + rng.normal(size=n)

    # Serial: the whole warm-started path is one compiled XLA program.
    fit = admm_tpu.admm_lasso(X, y).penalty(nlambda=60).fit()
    print("serial:   niter per lambda:", np.asarray(fit.niter)[:8], "...")

    # Consensus-parallel (the reference's `$parallel(nthread)`), sharded
    # over the visible devices.
    par = admm_tpu.admm_lasso(X, y).penalty(nlambda=60).parallel(4).fit()
    gap = np.abs(fit.beta.toarray() - par.beta.toarray()).max()
    print(f"parallel: max |beta_serial - beta_consensus| = {gap:.2e}")

    # Elastic Net with alpha = 0.6 (reference README's enet example).
    enet = admm_tpu.admm_enet(X, y).penalty(nlambda=60, alpha=0.6).fit()
    print("enet:     nonzeros at smallest lambda:",
          int((enet.beta.toarray()[1:, -1] != 0).sum()))

    # Cross-validated lambda selection (extension beyond the reference).
    cv = admm_tpu.cv_lasso_path(X, y, nfolds=5, nlambda=60)
    print(f"cv:       lambda_min={cv.lambda_min:.4f} "
          f"lambda_1se={cv.lambda_1se:.4f}")

    # Group Lasso (extension): groups enter or leave the model together.
    # Contiguous blocks of 5 features; the signal (features 0..9) lives
    # in groups 0 and 1.
    groups = np.repeat(np.arange(20), p // 20)
    gl = admm_tpu.group_lasso_path(X, y, groups, nlambda=30)
    mid = np.asarray(gl.coef[6])
    active = sorted(int(g) for g in range(20)
                    if np.linalg.norm(mid[groups == g]) > 1e-3)
    print(f"group:    active groups at mid-path: {active} (true: 0, 1)")

    ax = fit.plot()
    ax.figure.savefig(os.path.join(os.path.dirname(__file__),
                                   "lasso_path.png"), dpi=120)
    print("wrote lasso_path.png")


if __name__ == "__main__":
    main()
