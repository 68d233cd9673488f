"""Test config: run everything on a fake 8-device CPU mesh.

Mirrors the standard JAX technique recommended in SURVEY.md §4.5 so that
data-parallel sharding is exercised without TPU hardware. The axon
sitecustomize forces the TPU platform programmatically, so env vars alone
aren't enough — we must override the config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy model-level tests are dominated by
# XLA compiles of tiny-config train steps; caching them across runs keeps
# the full suite fast (VERDICT r1 ask: suite < 10 min).
_cache_dir = os.environ.get("ANIMALS3D_TEST_XLA_CACHE",
                            "/tmp/animals3d_tpu_test_xla_cache")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # threshold 0: the suite's dominant cost is ~1400 eager-op dispatch
    # compiles per heavy test file (~35 ms each, 47 s/file profiled) that a
    # 2 s threshold would refuse to persist
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_mixed_precision():
    """The mixed-precision policy is a process global set by Trainer /
    build-time config; reset it per test so a bf16 run config in one test
    (e.g. test_visualization's Trainer) can't degrade a later parity test's
    tolerances (seen: test_dino_vit_parity at 1.8e-2 after bf16 leak)."""
    from animals3d_tpu.precision import set_mixed_precision
    set_mixed_precision(None)
    yield
    set_mixed_precision(None)
