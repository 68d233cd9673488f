"""Multi-process (multi-host) data-pipeline smoke test on CPU.

The per-host strided sharding in `data.loaders.Loader` (`host_id::num_hosts`,
replacing the reference's DDP samplers, `/root/reference/model/dataloaders.py`)
is exercised here under a REAL 2-process `jax.distributed` cluster — not the
single-process simulation in tests — composing with a global dp mesh:

  1. each process builds the same synthetic dataset and its host-local
     `Loader(host_id=proc, num_hosts=2)`;
  2. per-host batches become one global batch via
     `jax.make_array_from_process_local_data` over a mesh spanning both
     processes (4 fake CPU devices each);
  3. a jitted `psum`-style global histogram of sample indices verifies no
     sample is seen more than once per epoch across hosts (no dups) and that
     `drop_last` drops strictly fewer than one global batch of samples.

Run: `python scripts/multihost_smoke.py` (spawns its two workers).
"""
from __future__ import annotations

import os
import subprocess
import sys

# Workers are spawned as `python <this file> --worker i`, so sys.path[0] is
# scripts/, not the repo root — insert it so `animals3d_tpu` imports.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROC = 2
LOCAL_DEVICES = 4
PORT = int(os.environ.get("A3D_SMOKE_PORT", "9911"))
ROOT = os.environ.get("A3D_SMOKE_ROOT", "/tmp/a3d_multihost_synth")


def worker(pid: int) -> None:
    import jax
    # the axon sitecustomize pins the TPU platform; force a local CPU mesh
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NPROC, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from animals3d_tpu.data.loaders import Loader
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.data.image_dataset import ImageDataset

    assert jax.process_index() == pid and jax.process_count() == NPROC
    devices = np.asarray(jax.devices()).reshape(NPROC * LOCAL_DEVICES)
    mesh = Mesh(devices, ("dp",))
    sharding = NamedSharding(mesh, P("dp"))

    root = ROOT
    done = os.path.join(root, ".done")
    if pid == 0 and not os.path.exists(done):
        write_synth_dataset(root, n=19, size=32)   # odd n: uneven host split
        open(done, "w").write("ok")
    # wait for the writer (the collectives below are the real sync point)
    import time
    for _ in range(600):
        if os.path.exists(done):
            break
        time.sleep(0.1)

    ds = ImageDataset(root, in_image_size=32, out_image_size=32,
                      load_dino_feature=False)
    n = len(ds)
    batch = 4                                    # global batch: 4 per host
    loader = Loader(ds, batch, shuffle=True, num_workers=2, drop_last=True,
                    host_id=pid, num_hosts=NPROC, seed=7)

    @jax.jit
    def histo(idx_global):
        return jnp.zeros((n,), jnp.int32).at[idx_global].add(1)

    counts = np.zeros((n,), np.int64)
    nb = 0
    for b in loader:
        # host-local (4,) sample ids -> global (8,) array over the mesh
        # (ImageDataset sets seq_idx = sample index)
        local = np.asarray(b["seq_idx"]).reshape(-1)[:batch].astype(np.int32)
        glob = jax.make_array_from_process_local_data(
            sharding, local, (batch * NPROC,))
        counts += np.asarray(jax.device_get(histo(glob)))
        nb += 1
    assert nb == len(loader), (nb, len(loader))

    seen = int((counts > 0).sum())
    dups = int((counts > 1).sum())
    dropped = n - seen
    # drop_last can drop < global-batch-size samples per epoch, never more
    assert dups == 0, f"duplicated samples: {dups}"
    assert dropped < batch * NPROC, f"dropped {dropped} of {n}"
    if pid == 0:
        print(f"multihost_smoke: ok — {seen}/{n} samples exactly once "
              f"across {NPROC} processes x {LOCAL_DEVICES} devices "
              f"(dropped {dropped} by drop_last)")

    # ---- trainer staging path: replicate + shard_batch over the global
    # mesh (multi-process branches of parallel.mesh) --------------------
    from animals3d_tpu.parallel import mesh as meshlib
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": np.float32(pid * 0.0 + 1.5)}      # identical on hosts
    params = meshlib.replicate(params, mesh)
    hb = {"x": np.full((4, 2), pid, np.float32),     # per-host shard
          "scalar_like": np.float32(3.0), "none": None}
    gb = meshlib.shard_batch(hb, mesh)
    assert gb["x"].shape == (8, 2), gb["x"].shape

    @jax.jit
    def use(params, b):
        return jnp.sum(params["w"]) + params["b"] + jnp.sum(b["x"], (0, 1))

    got = float(jax.device_get(use(params, gb)))
    want = 15.0 + 1.5 + (0 * 8 + 1 * 8)              # host shards 0s and 1s
    assert abs(got - want) < 1e-5, (got, want)
    if pid == 0:
        print("multihost_smoke: trainer staging (replicate+shard_batch) ok")


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
        for i in range(NPROC)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print("multihost_smoke: all workers exited 0")


if __name__ == "__main__":
    main()
