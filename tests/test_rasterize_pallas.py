"""Pallas rasterizer parity vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.ops import rasterize as rz
from animals3d_tpu.ops.rasterize_pallas import rasterize_pallas


def test_pallas_matches_xla_random_scene():
    rng = np.random.default_rng(0)
    v = rng.uniform(-0.9, 0.9, (2, 12, 3)).astype(np.float32)
    w = rng.uniform(2, 4, (2, 12, 1)).astype(np.float32)
    v_clip = jnp.asarray(np.concatenate([v * w, w], -1))
    faces = jnp.asarray(rng.integers(0, 12, (9, 3)).astype(np.int32))
    f_valid = np.ones(9, bool)
    f_valid[7] = False
    f_valid = jnp.asarray(f_valid)

    ref = rz.rasterize(v_clip, faces, f_valid, (32, 32), chunk=4)
    got = rasterize_pallas(v_clip, faces, f_valid, (32, 32), chunk=4,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got.face_id),
                                  np.asarray(ref.face_id))
    m = np.asarray(ref.face_id) > 0
    np.testing.assert_allclose(np.asarray(got.z)[m], np.asarray(ref.z)[m],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.uv)[m], np.asarray(ref.uv)[m],
                               atol=1e-5)


def test_pallas_sphere_mesh_capacity_padding():
    """Capacity-padded (prefix-compacted) mesh: padding must never win."""
    from animals3d_tpu.geometry import tets as tetlib
    from animals3d_tpu.ops import dmtet
    grid = tetlib.load_tet_grid(8, data_dir="/tmp/tets_cache")
    sdf = (0.3 - np.linalg.norm(grid.verts, axis=-1)).astype(np.float32)
    out = dmtet.marching_tets(jnp.asarray(grid.verts), jnp.asarray(sdf),
                              grid, 1024, 2048)
    scale = 2.0
    v_clip = jnp.concatenate([out.verts * scale,
                              jnp.full((1024, 1), 2.0)], -1)[None]
    ref = rz.rasterize(v_clip, out.faces, out.f_valid, (64, 64))
    got = rasterize_pallas(v_clip, out.faces, out.f_valid, (64, 64),
                           chunk=128, interpret=True)
    fa = np.asarray(ref.face_id)
    fb = np.asarray(got.face_id)
    # shared-edge pixels can flip between the two adjacent faces on fp
    # rounding (z within ~1e-6) — require coverage identity + z agreement
    np.testing.assert_array_equal(fa > 0, fb > 0)
    assert (fa == fb).mean() > 0.99
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                               atol=1e-4)


def test_pallas_fv_rows_path_matches_xla():
    """Struct-of-arrays fast path (fv_rows, shared 3-D-Morton sort) parity."""
    rng = np.random.default_rng(5)
    B, V, Fn = 3, 40, 30
    v = rng.uniform(-0.9, 0.9, (B, V, 3)).astype(np.float32)
    w = rng.uniform(2, 4, (B, V, 1)).astype(np.float32)
    v_clip = jnp.asarray(np.concatenate([v * w, w], -1))
    v_pos = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (Fn, 3)).astype(np.int32))
    f_valid = np.ones(Fn, bool)
    f_valid[11] = False
    f_valid = jnp.asarray(f_valid)

    tab = jnp.concatenate([v_pos, v_clip], -1).transpose(1, 0, 2) \
        .reshape(V, B * 7)
    fvr = tab[faces]

    ref = rz.rasterize(v_clip, faces, f_valid, (32, 32), chunk=8)
    got = rasterize_pallas(v_clip, faces, f_valid, (32, 32), chunk=8,
                           interpret=True, fv_rows=fvr)
    fa = np.asarray(ref.face_id)
    fb = np.asarray(got.face_id)
    np.testing.assert_array_equal(fa > 0, fb > 0)
    # z ties between distinct faces can flip ids; require coverage identity
    # plus z agreement everywhere and ~exact id agreement
    assert (fa == fb).mean() > 0.99
    m = fa > 0
    np.testing.assert_allclose(np.asarray(got.z)[m], np.asarray(ref.z)[m],
                               atol=1e-4)
