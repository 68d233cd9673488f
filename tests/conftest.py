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
