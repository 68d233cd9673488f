"""OBJ/MTL export round-trip tests."""
import os

import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry import tets as tetlib
from animals3d_tpu.geometry.mesh import make_mesh
from animals3d_tpu.ops import dmtet
from animals3d_tpu.render import export


def _sphere_mesh():
    grid = tetlib.load_tet_grid(8, data_dir="/tmp/tets_cache")
    sdf = (0.3 - np.linalg.norm(grid.verts, axis=-1)).astype(np.float32)
    out = dmtet.marching_tets(jnp.asarray(grid.verts), jnp.asarray(sdf),
                              grid, 1024, 2048)
    return make_mesh(out.verts[None], out.faces, out.v_valid, out.f_valid,
                     out.num_verts, out.num_faces, face_gidx=out.face_gidx)


def test_obj_roundtrip(tmp_path):
    mesh = _sphere_mesh()
    path = export.save_obj_with_mtl(str(tmp_path / "sphere.obj"), mesh)
    verts, faces, _, _ = export.load_obj(path)
    assert len(verts) == int(mesh.num_verts)
    assert len(faces) == int(mesh.num_faces)
    assert faces.min() >= 0 and faces.max() < len(verts)
    # geometry preserved
    np.testing.assert_allclose(np.linalg.norm(verts, axis=-1), 0.3, atol=0.05)


def test_obj_with_baked_texture(tmp_path):
    mesh = _sphere_mesh()

    def texture_fn(pos):   # color = position-derived, checks plumbing
        return jnp.clip(pos * 0.5 + 0.5, 0, 1)

    path = export.save_obj_with_mtl(str(tmp_path / "tex.obj"), mesh,
                                    texture_fn=texture_fn, atlas_res=128)
    base = path[:-4]
    assert os.path.exists(base + ".mtl")
    assert os.path.exists(base + "_kd.png")
    verts, faces, uvs, uv_idx = export.load_obj(path)
    assert uvs is not None and uv_idx is not None
    assert len(uv_idx) == len(faces)
    assert (uvs >= 0).all() and (uvs <= 1).all()
    # atlas pixels hold position-derived colors in range
    from PIL import Image
    atlas = np.asarray(Image.open(base + "_kd.png"))
    assert atlas.shape == (128, 128, 3)
    assert atlas.std() > 1.0     # non-constant
