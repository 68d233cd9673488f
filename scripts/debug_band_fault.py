"""Minimal device repro / bisection harness for the banded-SDF train fault.

The banded *recon* (eval) graph runs fine on v5e, but the banded *train*
graph (grad through `ops.dmtet.sdf_lattice_banded`) kills the TPU worker
(`UNAVAILABLE: TPU device error`) — with BOTH merge formulations (scatter
r3, gather-merge r4). This script builds the smallest graph that shares the
banded grad structure and toggles its suspects one at a time:

    python scripts/debug_band_fault.py MODE [--res 128] [--nf 256]

MODE:
    band                 grad through the full production path
                         (lax.cond + remat + gather-merge)
    band-noremat         same without jax.checkpoint
    band-nocond          banded branch called directly (no lax.cond)
    band-nocond-noremat  neither
    band-fwd             forward only (control: known-good on device)
    band-mt              grad through banded + marching_tets (closer to the
                         real consumer)
    dense                grad through the plain dense sweep (control)

Each run prints `OK <mode> loss=... |g|=... (t s)` or dies with the fault —
run the modes in separate processes (a faulted worker poisons the client).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=[
        "band", "band-noremat", "band-nocond", "band-nocond-noremat",
        "band-fwd", "band-mt", "dense"])
    ap.add_argument("--compile-only", action="store_true",
                    help="stop after lowering+compile (separates a compile "
                         "hang from an execution hang)")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--nf", type=int, default=256)
    ap.add_argument("--layers", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from animals3d_tpu.geometry.tets import (DeviceTetGrid, default_capacity,
                                             load_tet_grid)
    from animals3d_tpu.networks.mlp import CoordMLP
    from animals3d_tpu.ops import dmtet

    res = args.res
    grid = DeviceTetGrid(load_tet_grid(res))
    pos = grid.verts * 0.1                      # ~production spatial scale

    net = CoordMLP(cin=3, cout=1, num_layers=args.layers, nf=args.nf)
    params = net.init(jax.random.PRNGKey(0), pos[:8])

    def sdf_fn(variables):
        # small MLP perturbation on a sphere field: the band is a thin
        # shell (like the production ellipsoid init), grads flow through
        # the net, and the lax.cond reliably takes the banded branch
        def f(p):
            return (net.apply(variables, p)[..., 0] * 0.01
                    + jnp.linalg.norm(p, axis=-1) - 0.05)
        return f

    remat = "noremat" not in args.mode
    force = "banded" if "nocond" in args.mode else None

    def field(variables, pos):
        if args.mode == "dense":
            return sdf_fn(variables)(pos)
        s, _ = dmtet.sdf_lattice_banded(sdf_fn(variables), pos, res,
                                        remat=remat, force_branch=force)
        return s

    if args.mode == "band-fwd":
        fn = jax.jit(lambda v, p: jnp.sum(field(v, p) ** 2))
    elif args.mode == "band-mt":
        v_cap, f_cap = default_capacity(res)

        def loss(variables, pos, grid):
            s = field(variables, pos)
            out = dmtet.marching_tets(pos, s, grid, v_cap, f_cap)
            return jnp.sum(out.verts ** 2 * out.v_valid[:, None])

        fn = jax.jit(lambda v, p: jax.grad(loss)(v, p, grid))
    else:
        fn = jax.jit(jax.grad(
            lambda v, p: jnp.sum(field(v, p) ** 2) / pos.shape[0]))

    t0 = time.time()
    compiled = fn.lower(params, pos).compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)
    if args.compile_only:
        return
    t0 = time.time()
    out = compiled(params, pos)
    out = jax.block_until_ready(out)
    tc = time.time() - t0
    if args.mode == "band-fwd":
        print(f"OK {args.mode} loss={float(out):.6f} ({tc:.1f}s)")
    else:
        gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                          for x in jax.tree.leaves(out)))
        print(f"OK {args.mode} |g|={float(gn):.6f} ({tc:.1f}s)")
    # steady-state timing (3 reps)
    t0 = time.time()
    for _ in range(3):
        out = fn(params, pos)
    jax.block_until_ready(out)
    print(f"steady {(time.time() - t0) / 3 * 1000:.1f} ms/call")


if __name__ == "__main__":
    main()
