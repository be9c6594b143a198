"""Round-3 surface tour: weights, penalty factors, quantiles, and the
multi-output families.

Run:  python examples/round3_features_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import admm_tpu
import admm_tpu.models.lasso

rng = np.random.default_rng(7)
n, p = 400, 20
X = rng.normal(size=(n, p))
b = np.zeros(p)
b[:5] = [2.0, -1.5, 1.0, -0.8, 0.6]
y = 1.0 + X @ b + 0.4 * rng.normal(size=n)

# Observation weights (glmnet's `weights`) — here: downweight a
# contaminated block so it cannot drag the fit.
y_bad = y.copy()
y_bad[:40] += 25.0
w = np.ones(n)
w[:40] = 0.05
fit_w = admm_tpu.admm_lasso(X, y_bad).penalty(nlambda=30).fit()
res_w = admm_tpu.models.lasso.lasso_path(X, y_bad, nlambda=30, weights=w)
print(f"weights: unweighted top |coef| err "
      f"{np.abs(np.asarray(res_w.coef)[-1] - b).max():.3f} with w, "
      f"vs contaminated fit available via fit_w")

# Per-coefficient penalty factors (glmnet's `penalty.factor`):
# coordinate 0 unpenalized -> always in the model.
pf = np.ones(p)
pf[0] = 0.0
res_pf = admm_tpu.models.lasso.lasso_path(X, y, nlambda=10,
                                          penalty_factor=pf)
print("penalty_factor: coef[0] active at lambda_max:",
      abs(float(np.asarray(res_pf.coef)[0, 0])) > 0.1)

# Quantile regression at tau = 0.9 (any quantile; tau=0.5 == LAD).
q = admm_tpu.quantile_fit(X, y, tau=0.9)
resid = y - float(q.beta0) - X @ np.asarray(q.coef)
print(f"quantile tau=0.9: {np.mean(resid < 0):.2f} of residuals below "
      "the fitted surface (expect ~0.90)")

# Sparse-group lasso: group selection AND within-group sparsity.
groups = np.arange(p) % 5
sgl = admm_tpu.group_lasso_path(X, y, groups, nlambda=20, l1_ratio=0.5)
mid = np.asarray(sgl.coef)[12]
print("sparse-group lasso: nonzeros at mid-path:",
      int((np.abs(mid) > 1e-6).sum()), "of", p)

# Multi-task Lasso: 3 responses, one shared support.
B = np.zeros((p, 3))
B[:4] = rng.uniform(0.5, 1.5, (4, 3))
Y = X @ B + 0.3 * rng.normal(size=(n, 3))
mt = admm_tpu.multitask_lasso_path(X, Y, nlambda=15)
last = np.asarray(mt.coef)[-1]
print("multitask: active rows:",
      int((np.abs(last).max(axis=1) > 1e-6).sum()), "(true 4)")

# Sparse multinomial (softmax) regression, grouped support.
eta = X @ np.column_stack([b, -b, 0.3 * b])
pr = np.exp(eta - eta.max(axis=1, keepdims=True))
pr /= pr.sum(axis=1, keepdims=True)
labels = np.array([rng.choice(3, p=pi) for pi in pr])
mn = admm_tpu.multinomial_lasso_path(X, labels, nlambda=12, grouped=True)
acc = (np.argmax(np.asarray(mn.beta0)[-1] + X @ np.asarray(mn.coef)[-1],
                 axis=1) == labels).mean()
print(f"multinomial (grouped): train accuracy at path bottom {acc:.2f}")

# Cox survival regression (Breslow partial likelihood, right-censored).
t_surv = rng.exponential(np.exp(-(X @ b)))
d_surv = (rng.uniform(size=n) < 0.7).astype(float)
cox = admm_tpu.cox_lasso_path(X, t_surv, d_surv, nlambda=15)
rr = admm_tpu.predict(cox, X, type="response",
                      lam=float(cox.lambdas[-1]))
print("cox: active coefficients at path bottom:",
      int((np.abs(np.asarray(cox.coef)[-1]) > 1e-6).sum()),
      f"| relative-risk range [{rr.min():.2f}, {rr.max():.2f}]")

# Relaxed lasso: de-bias by blending with the support refit.
rel = admm_tpu.relaxed_lasso_path(X, y, nlambda=20)
print("relaxed: gamma grid", np.asarray(rel.gammas).tolist())

# One-program CV (the whole fold sweep is one compiled program).
cv = admm_tpu.cv_lasso_path(X, y, nfolds=5, nlambda=40)
print(f"one-pass CV: lambda_min={cv.lambda_min:.4f} "
      f"lambda_1se={cv.lambda_1se:.4f}")

# The glmnet front door: one call, any family string.
fit_b = admm_tpu.glmnet(X, (y > np.median(y)).astype(float),
                        family="binomial", nlambda=12)
print("glmnet front door: binomial path of",
      len(np.asarray(fit_b.lambdas)), "lambdas")

# Held-out assessment (glmnet's assess/roc/confusion/Cindex).
Xte = rng.normal(size=(200, p))
yte = (Xte @ b > 0).astype(float)
sc = admm_tpu.assess(fit_b, Xte, yte, family="binomial")
fpr, tpr = admm_tpu.roc(fit_b, Xte, yte)
tab = admm_tpu.confusion(fit_b, Xte, yte)
print(f"assess: test AUC at path bottom {sc['auc'][-1]:.2f}; "
      f"confusion diag {int(tab[0, 0])}+{int(tab[1, 1])} of {tab.sum()}")
ci = admm_tpu.c_index(np.asarray(X @ b), t_surv, d_surv)
print(f"Cindex of the true Cox score: {ci:.2f}")

# coef(): glmnet's accessor for the coefficient matrix at s=lambda.
print("coef at lambda_min:",
      int((np.abs(admm_tpu.coef(cv.fit, lam=cv.lambda_min)[1:])
           > 1e-6).sum()), "nonzeros")

# --- newest surfaces -------------------------------------------------

# predict() straight from a CV result (glmnet's predict.cv.glmnet):
# s defaults to lambda.1se; off-grid s interpolates (lambda.interp).
eta_1se = admm_tpu.predict(cv, X)
print("predict(cv): eta at lambda.1se, shape", eta_1se.shape)

# Stratified Cox (glmnet's stratifySurv): per-stratum risk sets.
strata = rng.integers(0, 2, n)
fit_s = admm_tpu.glmnet(X, np.c_[t_surv, d_surv], family="cox",
                        strata=strata, nlambda=10)
cv_s = admm_tpu.cv_glmnet(X, np.c_[t_surv, d_surv], family="cox",
                          strata=strata, nfolds=4, nlambda=10)
print(f"stratified cox: lambda_min={cv_s.lambda_min:.4f}")

# Survival curves (glmnet's survfit.coxnet): per-stratum Breslow
# baselines, S(t | x) for each row.
sf = admm_tpu.survfit_cox(cv_s, X, t_surv, d_surv, strata=strata)
for sv, f in sorted(sf.items()):
    print(f"  stratum {sv}: {f.time.size} event times, "
          f"median S(t_end|x) = {np.median(f.surv[-1]):.2f}")

# makeX (glmnet's design-matrix builder): one-hot + NA imputation.
Xd, names = admm_tpu.make_x(
    {"age": [31.0, np.nan, 52.0], "city": ["ann arbor", "boston",
                                           "ann arbor"]},
    na_impute=True)
print("make_x columns:", names)

# deviance(): glmnet's deviance.glmnet accessor.
print("residual deviance at path ends:",
      np.round(admm_tpu.deviance(cv.fit, X, y)[[0, -1]], 1).tolist())
