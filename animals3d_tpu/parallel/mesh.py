"""Device mesh + sharding layer — the whole "distributed backend".

The reference's only parallelism is DDP via HF Accelerate over NCCL
(SURVEY.md §2.12: `Trainer.py:169-180`, gradient allreduce inside
`accelerator.backward`). TPU-native equivalent: one `jax.sharding.Mesh`
with a `dp` axis; the batch is sharded over `dp`, parameters are replicated,
and the gradient `psum` is inserted by XLA when jit partitions the
mean-over-batch loss — collectives ride ICI with zero explicit backend code.

The reference's DDP warts (dummy `p.sum()*0` grads for unused params,
`wait_for_everyone` barriers, main-process-only guards) have no equivalent
here: unused params get zero grads by construction and jit is SPMD.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def enable_compilation_cache(path: Optional[str] = None):
    """Persistent XLA compilation cache — full-model compiles take minutes
    through a remote compile service; cache them across processes."""
    import os
    path = path or os.path.join(os.path.expanduser("~"), ".cache",
                                "animals3d_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # honor an explicit env override (e.g. =0 for cache experiments);
        # jax reads the env only at import, so config.update would
        # silently stomp it here otherwise
        thresh = float(os.environ.get(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          thresh)
    except Exception as e:      # older jax: silently skip
        print(f"compilation cache unavailable: {e}")


def get_mesh(mesh_shape: Optional[dict] = None, devices=None) -> Mesh:
    """Build (or fetch the cached) 1-D dp mesh over local devices.

    mesh_shape: e.g. {'dp': 8}; None = all devices on one dp axis.
    """
    global _MESH
    if _MESH is not None and mesh_shape is None and devices is None:
        return _MESH
    devices = devices if devices is not None else jax.devices()
    if mesh_shape:
        (axis, n), = mesh_shape.items()
        assert axis == "dp", "only a dp axis is meaningful for this workload"
        devices = devices[:n]
    mesh = Mesh(np.asarray(devices), ("dp",))
    if mesh_shape is None:
        _MESH = mesh
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, allow_uneven: bool = False) -> dict:
    """Stage a host batch dict with the leading axis sharded over dp.

    Single-process: plain `device_put`. Multi-process: each host holds its
    1/num_hosts slice of the global batch (the Loader's `host_id::num_hosts`
    stride) and the global array is assembled with
    `jax.make_array_from_process_local_data` — per-host leading axes concat
    to the global batch, which must divide the (global) dp mesh size.

    Every ≥1-D entry must have a dp-divisible (global) leading axis — a
    mis-sized *training* batch is a data-pipeline bug and silently
    replicating it would train on duplicated samples, so it raises.
    Eval/test loops with `drop_last=False` pass `allow_uneven=True`: their
    final partial batch is replicated (duplicated compute, correct
    per-sample results).
    """
    sharding = batch_sharding(mesh)
    rep = replicated(mesh)
    nproc = jax.process_count()

    def put(k, x):
        if x is None:
            return None
        if getattr(x, "ndim", 0) >= 1:
            n_global = x.shape[0] * nproc
            if n_global % mesh.size != 0:
                if allow_uneven:
                    if nproc > 1:
                        # replicating host-LOCAL values multi-process would
                        # give each process a different "replica" — refuse
                        # rather than silently diverge (eval loaders should
                        # pad/drop to host-equal batches in multi-host runs)
                        raise ValueError(
                            f"batch['{k}']: uneven eval batches are not "
                            f"supported multi-process (host-local "
                            f"{x.shape[0]} x {nproc} hosts vs mesh "
                            f"{mesh.size})")
                    return _replicate_value(x, rep)
                raise ValueError(
                    f"batch['{k}'] global leading axis {n_global} is not "
                    f"divisible by the dp mesh size {mesh.size}")
            if nproc > 1:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x), (n_global, *x.shape[1:]))
            return jax.device_put(x, sharding)
        return _replicate_value(x, rep)

    return {k: put(k, v) for k, v in batch.items()}


def _replicate_value(x, rep: NamedSharding):
    """Fully replicate one array over a (possibly multi-process) mesh."""
    if jax.process_count() == 1:
        return jax.device_put(x, rep)
    x = np.asarray(x)
    # every host passes the same value; callback serves any requested index
    return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    return jax.tree_util.tree_map(
        lambda x: _replicate_value(x, rep), tree)
