"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-device (consensus/shard_map) tests emulate a mesh without real TPU
hardware, as described in SURVEY.md section 4.  XLA_FLAGS must be set
before jax initialises its backends; the platform choice must be set via
jax.config because the environment's TPU plugin overrides JAX_PLATFORMS.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 on CPU lets LAD/BP run at the reference's double precision;
# solvers that default to float32 are explicit about it and unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles ~300 distinct XLA programs; with all of
    them kept loaded, the CPU JIT segfaults inside
    ``backend_compile_and_load`` near the end of the run (reproduced
    twice at tests/test_weights.py, the alphabetically last module;
    every module passes in isolation).  Modules share almost no shapes,
    so per-module clearing costs little and bounds live executables."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(123)


def make_regression(rng, n, p, *, noise=1.0, mean=0.0, sd=1.0,
                    intercept=5.0, sparse=False):
    """Seeded test problem in the style of the reference README examples."""
    b = rng.uniform(size=p)
    if sparse:
        mask = rng.uniform(size=p) < 0.3
        b = b * mask
    X = rng.normal(mean, sd, (n, p))
    y = intercept + X @ b + noise * rng.normal(size=n)
    return X, y, b
