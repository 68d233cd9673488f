"""Texture2D sampling + mesh regularizer tests."""
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.render import regularizer, texture


def test_bilinear_sampling_exact_at_centers():
    tex = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 8, 3))
                      .astype(np.float32))
    ys, xs = np.mgrid[0:8, 0:8]
    uv = jnp.asarray(np.stack([(xs + 0.5) / 8, (ys + 0.5) / 8], -1)
                     .astype(np.float32))
    out = texture.sample_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tex), atol=1e-6)


def test_mips_preserve_mean():
    tex = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (16, 16, 3))
                      .astype(np.float32))
    mips = texture.build_mips(tex)
    assert mips[-1].shape[:2] == (1, 1)
    np.testing.assert_allclose(float(mips[-1].mean()), float(tex.mean()),
                               atol=1e-5)


def test_latlong_cubemap_roundtrip():
    ll = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (32, 64, 3))
                     .astype(np.float32))
    cube = texture.latlong_to_cubemap(ll, 32)
    back = texture.cubemap_to_latlong(cube, (32, 64))
    # nearest-texel cubemap lookup: coarse agreement away from the poles
    mid = np.asarray(back)[10:22]
    ref = np.asarray(ll)[10:22]
    assert np.abs(mid - ref).mean() < 0.12


def _sphere():
    import jax
    from animals3d_tpu.geometry import tets as tetlib
    from animals3d_tpu.geometry.mesh import make_mesh
    from animals3d_tpu.ops import dmtet
    grid = tetlib.load_tet_grid(8, data_dir="/tmp/tets_cache")
    sdf = (0.3 - np.linalg.norm(grid.verts, axis=-1)).astype(np.float32)
    out = dmtet.marching_tets(jnp.asarray(grid.verts), jnp.asarray(sdf),
                              grid, 1024, 2048)
    return make_mesh(out.verts[None], out.faces, out.v_valid, out.f_valid,
                     out.num_verts, out.num_faces)


def test_regularizers_on_sphere():
    mesh = _sphere()
    lap = float(regularizer.laplace_regularizer_const(mesh))
    nc = float(regularizer.normal_consistency(mesh))
    assert np.isfinite(lap) and lap > 0
    assert np.isfinite(nc) and 0 <= nc < 0.2   # a sphere is smooth
    # a noisy mesh scores worse
    import dataclasses
    noisy = dataclasses.replace(
        mesh, v_pos=mesh.v_pos +
        np.random.default_rng(0).normal(0, 0.02, mesh.v_pos.shape)
        .astype(np.float32))
    from animals3d_tpu.geometry.mesh import auto_normals
    noisy = dataclasses.replace(
        noisy, v_nrm=auto_normals(noisy.v_pos, noisy.t_pos_idx,
                                  noisy.v_valid, noisy.f_valid))
    assert float(regularizer.laplace_regularizer_const(noisy)) > lap
    assert float(regularizer.normal_consistency(noisy)) > nc
