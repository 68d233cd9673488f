"""2-process `jax.distributed` data-path gate, in the suite so it can't rot.

Spawns `scripts/multihost_smoke.py` (a REAL 2-process CPU cluster — not the
single-process simulation in test_loaders_multihost): per-host strided
Loader shards compose into global arrays via
`make_array_from_process_local_data`, every sample is seen exactly once per
epoch across hosts, and the trainer's replicate/shard_batch staging works
multi-process. This script already caught two real multi-host bugs (host
slicing never wired; `device_put` cannot build global arrays) — keeping it
green is the point. Marked `slow` (runs in the full gate, `pytest -m slow`).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "multihost_smoke.py")


def test_two_process_data_path(tmp_path):
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "A3D_SMOKE_ROOT": str(tmp_path / "synth"),
           "A3D_SMOKE_PORT": "9937"}
    # the launcher spawns both workers and asserts their exit codes
    out = subprocess.run([sys.executable, os.path.abspath(_SCRIPT)],
                         env=env, capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "all workers exited 0" in out.stdout, out.stdout
