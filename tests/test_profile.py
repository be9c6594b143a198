"""Profiler integration smoke tests (admm_tpu.diag.profile)."""
import os

import numpy as np

from admm_tpu.diag.profile import annotate, device_memory_profile, trace
from admm_tpu.models.lasso import lasso_path


def test_trace_captures_a_solve(tmp_path):
    logdir = str(tmp_path / "prof")
    X = np.random.default_rng(0).normal(size=(80, 10))
    y = X @ np.ones(10)
    with trace(logdir):
        with annotate("tiny-path"):
            res = lasso_path(X, y, nlambda=3)
            np.asarray(res.coef)
    # jax writes plugins/profile/<ts>/*.trace.json.gz etc.
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler trace directory is empty"


def test_device_memory_profile(tmp_path):
    p = str(tmp_path / "mem.pprof")
    device_memory_profile(p)
    assert os.path.getsize(p) > 0
