"""Test harness setup: force an 8-device virtual CPU mesh.

Multi-chip sharding (pjit over a Mesh) is exercised on virtual CPU devices —
real multi-chip hardware is not available in CI, and tests must not grab the
single real TPU. The environment pins JAX_PLATFORMS=axon via sitecustomize,
so the env var alone is not enough: we must override via jax.config before
any backend initializes. XLA_FLAGS must be set before the CPU client spins
up (it is lazy, so doing it here at conftest import time is early enough).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is dominated by CPU compiles of
# the full train/shard_map graphs (~9 min cold); warm re-runs skip them so
# the suite stays in the inner loop. Keyed by HLO, so code changes that
# alter a graph recompile exactly that graph.
from dc_tts_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache(os.path.join(os.path.dirname(__file__), "..",
                           ".xla_test_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, (
        "expected 8 virtual CPU devices, got %d" % len(jax.devices()))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _contain_prng_impl():
    """The train CLI sets jax_default_prng_impl (rbg by default, the TPU
    hardware RNG). jax.config updates are process-global, so an in-process
    CLI invocation (test_cli_workflow) would silently flip every later
    test's key generation off threefry — goldens and cross-process
    oracles pin threefry-generated values. Restore around each test."""
    prev = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prev:
        jax.config.update("jax_default_prng_impl", prev)
