"""Test configuration.

Tests run JAX on CPU with 8 virtual devices so the multi-chip sharding path
is exercised without TPU hardware (the driver separately dry-runs it).  Must
be set before the first jax import anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize force-selects the remote TPU backend via
# jax.config before conftest runs; override it back to CPU so the test suite
# doesn't funnel hundreds of tiny compiles through the device tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big device-path graphs (pairing, scalar
# mul) cost minutes of XLA:CPU compile on this 2-core box; cache them across
# test runs.  /tmp survives within a round; safe to lose.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402

import threshold_crypto_tpu as tc  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    XLA:CPU segfaults once the suite accumulates ~70 tests' worth of loaded
    executables in one process (the next large compile/deserialize crashes —
    JIT code-memory exhaustion; reproduced at tests/test_ops.py #71 under
    three different stacks).  Bounding resident executables per module fixes
    it; the persistent on-disk cache keeps recompiles cheap.
    """
    yield
    jax.clear_caches()


@pytest.fixture(params=["mock", "bls12_381"])
def backend(request):
    """Run a test under both backends (mirrors the reference's cfg matrix)."""
    with tc.using(request.param) as b:
        yield b


@pytest.fixture
def mock_backend():
    with tc.using("mock") as b:
        yield b


@pytest.fixture
def bls_backend():
    with tc.using("bls12_381") as b:
        yield b


@pytest.fixture
def rng():
    """Deterministic RNG for reproducible tests."""
    from threshold_crypto_tpu.utils.rng import ChaChaRng

    return ChaChaRng(bytes(range(32)))
