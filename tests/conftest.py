"""Test config: force an 8-device virtual CPU platform so sharding/mesh tests
run without TPU hardware, per the driver's multi-chip dry-run contract.

Note: this image pre-imports jax at interpreter startup (axon sitecustomize)
and pins jax_platforms, so plain env vars are too late here — we must update
jax.config before the first backend initialization instead.
"""

import os

if os.environ.get("TUMSEG_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already initialized
        pass

import jax  # noqa: E402

try:  # persistent compile cache: repeated suite runs skip recompiles; on
    # hardware (TUMSEG_TEST_TPU=1) this matters even more — each compile
    # goes through the image's slow remote-compile helper (~1-2 min)
    jax.config.update("jax_compilation_cache_dir", "/tmp/tumseg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # pragma: no cover
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
