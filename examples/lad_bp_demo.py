"""LAD (median regression) and Basis Pursuit demos.

Mirrors the reference README's LAD and BP sections (reference:
/root/reference/README.md:126-182): robust regression under heavy-tailed
noise, and exact sparse recovery from underdetermined measurements.

Run:  python examples/lad_bp_demo.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import admm_tpu  # noqa: E402


def main():
    rng = np.random.default_rng(123)

    # --- LAD: median regression shrugs off heavy-tailed noise ----------
    n, p = 1000, 50
    beta = rng.normal(size=p)
    X = rng.normal(size=(n, p))
    y = 2.0 + X @ beta + rng.standard_cauchy(n)  # Cauchy outliers

    lad = admm_tpu.admm_lad(X, y).fit()
    err_lad = np.abs(lad.beta[1:] - beta).max()
    # OLS for contrast
    ols = np.linalg.lstsq(np.c_[np.ones(n), X], y, rcond=None)[0]
    err_ols = np.abs(ols[1:] - beta).max()
    print(f"LAD  coef error {err_lad:.3f} vs OLS {err_ols:.3f} "
          f"(niter={lad.niter})")
    ax = lad.plot()
    ax.figure.savefig(os.path.join(os.path.dirname(__file__),
                                   "lad_fit.png"), dpi=120)

    # --- Basis Pursuit: recover a sparse signal exactly ----------------
    n, p, k = 100, 300, 15
    x0 = np.zeros(p)
    x0[rng.choice(p, k, replace=False)] = rng.normal(size=k)
    A = rng.normal(size=(n, p)) / np.sqrt(n)
    b = A @ x0

    bp = admm_tpu.admm_bp(A, b).opts(eps_abs=1e-6, eps_rel=1e-6).fit()
    err = np.abs(bp.beta.toarray().ravel() - x0).max()
    print(f"BP   recovery error {err:.2e} from {n} measurements of a "
          f"{k}-sparse, {p}-dim signal (niter={bp.niter})")

    # Consensus-parallel BP (the reference's admm_parbp, working here).
    bp_par = (admm_tpu.admm_bp(A, b).parallel(nthread=4)
              .opts(eps_abs=1e-6, eps_rel=1e-6).fit())
    err_par = np.abs(bp_par.beta.toarray().ravel() - x0).max()
    print(f"BP//  recovery error {err_par:.2e} (consensus, 4 workers)")

    ax = bp.plot()
    ax.figure.savefig(os.path.join(os.path.dirname(__file__),
                                   "bp_stem.png"), dpi=120)
    print("wrote lad_fit.png, bp_stem.png")


if __name__ == "__main__":
    main()
