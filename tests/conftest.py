"""Test environment: CPU backend with 8 virtual devices, f64 enabled.

Pallas kernels run in interpret mode on CPU (Config auto-detects the
backend), so the full correctness suite needs no TPU — the strategy SURVEY.md
§4 prescribes for upgrading the reference's eyeball-norm validation.
"""

import os

# NOTE: this environment may pre-import jax via sitecustomize (so a
# JAX_PLATFORMS env var set here would be ignored); jax.config.update works
# as long as no backend has been initialized yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def cfg64():
    from tpu_bench.core.config import Config
    import jax.numpy as jnp

    return Config(dtype=jnp.float64, n_tests=2)


@pytest.fixture
def cfg32():
    from tpu_bench.core.config import Config
    import jax.numpy as jnp

    return Config(dtype=jnp.float32, n_tests=2)
