"""Kernel perf harness — the reference's `renderutils/tests/test_perf.py`
pattern: wallclock for each hot kernel at production-ish sizes, printed one
line per kernel. Honest timing: fresh inputs per call + scalar device reads
(repeated identical calls are served from remote-execution caches).

Usage: `python bench_kernels.py [--grid 128] [--res 256] [--batch 10]`.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else
                         list(x)[0] if hasattr(x, "_fields") else x)
                 if not hasattr(x, "verts") else jnp.sum(x.verts))


def bench(name, fn, inputs, n=5):
    out = fn(*inputs[0])
    _sync(out)
    t0 = time.time()
    for i in range(n):
        _sync(fn(*inputs[i % len(inputs)]))
    print(f"{name:<46s} {(time.time() - t0) / n * 1000:8.1f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke: interpret-mode Pallas, tiny n")
    args = ap.parse_args()
    if args.interpret:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from animals3d_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    from animals3d_tpu.geometry import tets as tetlib
    from animals3d_tpu.geometry.mesh import make_mesh
    from animals3d_tpu.geometry.tets import DeviceTetGrid
    from animals3d_tpu.ops import dmtet, shading
    from animals3d_tpu.ops.antialias import antialias
    from animals3d_tpu.ops.rasterize_pallas import rasterize_pallas

    print(f"device={jax.devices()[0].device_kind} grid={args.grid} "
          f"res={args.res} batch={args.batch}")
    rng = np.random.default_rng(0)

    grid = DeviceTetGrid(tetlib.load_tet_grid(args.grid))
    v_cap, f_cap = tetlib.default_capacity(args.grid)
    pos = grid.verts * 7.0
    sdfs = [jnp.asarray(
        (7 * 0.15 - np.linalg.norm(
            np.asarray(pos) * np.array([1, 1, 0.5]) + rng.normal(0, 0.01, 3),
            axis=-1)).astype(np.float32)) for _ in range(3)]

    mt = jax.jit(lambda s, g: dmtet.marching_tets(pos, s, g, v_cap, f_cap))
    bench(f"marching_tets grid{args.grid} (lattice)", mt,
          [(s, grid) for s in sdfs])

    out = mt(sdfs[0], grid)
    mesh = make_mesh(out.verts[None], out.faces, out.v_valid, out.f_valid,
                     out.num_verts, out.num_faces)
    B, H = args.batch, args.res
    vc = [jnp.asarray(np.concatenate(
        [np.asarray(mesh.v_pos).repeat(B, 0) * 0.5
         + rng.normal(0, 1e-3, (B, v_cap, 3)).astype(np.float32),
         np.full((B, v_cap, 1), 5.0, np.float32)], -1)) for _ in range(3)]

    itp = args.interpret
    rz = jax.jit(lambda v: rasterize_pallas(
        v, mesh.t_pos_idx, mesh.f_valid, (H, H), num_faces=mesh.num_faces,
        interpret=itp).face_id.astype(jnp.float32))
    bench(f"rasterize_pallas {H}x{H} x{B}", rz, [(v,) for v in vc],
          n=1 if itp else 5)

    # production path: struct-of-arrays fv_rows + fused resolve (the MXU
    # one-hot fwd/bwd when bw_aux is threaded) — what render_mesh runs
    from animals3d_tpu.ops.rasterize import resolve
    V = vc[0].shape[1]

    def full(v, attr):
        vp = v[..., :3]
        tab = jnp.concatenate([vp, v], -1).transpose(1, 0, 2) \
            .reshape(V, B * 7)
        fvr = tab[mesh.t_pos_idx]
        rast = rasterize_pallas(v, mesh.t_pos_idx, mesh.f_valid, (H, H),
                                num_faces=mesh.num_faces, interpret=itp,
                                fv_rows=fvr)
        uv, out = resolve(attr, rast, v, mesh.t_pos_idx)
        return jnp.sum(out) + jnp.sum(uv)

    attrs = [jnp.asarray(rng.uniform(0, 1, (B, v_cap, 16))
                         .astype(np.float32)) for _ in range(3)]
    import os
    if not itp or os.environ.get("A3D_FORCE_MXU") == "1":
        fr = jax.jit(full)
        bench(f"raster+resolve fwd {H}x{H} x{B}", fr,
              [(vc[i], attrs[i]) for i in range(3)])
        fb = jax.jit(jax.grad(full, argnums=(0, 1)))
        bench(f"raster+resolve fwd+bwd {H}x{H} x{B}", fb,
              [(vc[i], attrs[i]) for i in range(3)])

    rast_fn = jax.jit(lambda v: rasterize_pallas(
        v, mesh.t_pos_idx, mesh.f_valid, (H, H), num_faces=mesh.num_faces,
        interpret=itp))
    rasts = [rast_fn(v) for v in vc]
    colors = [jnp.asarray(rng.uniform(0, 1, (B, H, H, 4)).astype(np.float32))
              for _ in range(3)]
    aa = jax.jit(antialias)
    bench(f"antialias {H}x{H} x{B}", aa,
          [(colors[i], rasts[i], vc[i], mesh.t_pos_idx) for i in range(3)])

    shp = (B, H, H, 3)
    mats = [tuple(jnp.asarray(rng.uniform(0, 1, shp).astype(np.float32))
                  for _ in range(6)) for _ in range(3)]
    pb = jax.jit(lambda kd, arm, p, n, v, l: shading.pbr_bsdf(
        kd, arm, p, n, v, l))
    bench(f"pbr_bsdf {H}x{H} x{B}", pb, mats)


if __name__ == "__main__":
    main()
