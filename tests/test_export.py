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


def test_map_uv_reference_parity():
    """Our analytic map_uv vs a literal transcription of the reference
    (`dmtet.py:69-98`) evaluated with torch."""
    import torch

    from animals3d_tpu.render.export import map_uv_reference

    def ref_map_uv(face_gidx, max_idx):
        N = int(np.ceil(np.sqrt((max_idx + 1) // 2)))
        tex_y, tex_x = torch.meshgrid(
            torch.linspace(0, 1 - (1 / N), N), torch.linspace(0, 1 - (1 / N), N),
            indexing="ij")
        pad = 0.9 / N
        uvs = torch.stack([
            tex_x, tex_y,
            tex_x + pad, tex_y,
            tex_x + pad, tex_y + pad,
            tex_x, tex_y + pad], dim=-1).view(-1, 2)
        tet_idx = torch.div(face_gidx, 2, rounding_mode="trunc")
        x = tet_idx % N
        y = torch.div(tet_idx, N, rounding_mode="trunc")
        tet_idx = y * N + x
        tri_idx = face_gidx % 2
        uv_idx = torch.stack((tet_idx * 4, tet_idx * 4 + tri_idx + 1,
                              tet_idx * 4 + tri_idx + 2), dim=-1).view(-1, 3)
        return uvs[uv_idx]                       # (F, 3, 2) per-face triples

    rng = np.random.default_rng(0)
    max_idx = 2 * 900
    gids = np.unique(rng.integers(0, max_idx, 64)).astype(np.int64)
    ours, N = map_uv_reference(gids, max_idx)
    want = ref_map_uv(torch.from_numpy(gids), max_idx).numpy()
    assert N == int(np.ceil(np.sqrt((max_idx + 1) // 2)))
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_obj_export_reference_uv_layout(tmp_path):
    """OBJ export with the reference per-tet atlas layout round-trips."""
    from animals3d_tpu.render.export import load_obj, save_obj_with_mtl

    mesh = _sphere_mesh()
    from animals3d_tpu.geometry import tets as tetlib
    grid = tetlib.load_tet_grid(8, data_dir="/tmp/tets_cache")
    n_tets = grid.tets.shape[0]
    tex = lambda tp: jnp.ones((*tp.shape[:-1], 9)) * 0.5
    p = save_obj_with_mtl(str(tmp_path / "ref.obj"), mesh, texture_fn=tex,
                          atlas_res=64, uv_layout="reference",
                          max_gidx=2 * n_tets)
    verts, faces, uvs, uv_idx = load_obj(p)
    assert uvs is not None and uv_idx is not None
    nv_valid = int(np.asarray(mesh.v_valid).sum())
    nf_valid = int(np.asarray(mesh.f_valid).sum())
    assert verts.shape[0] == nv_valid and faces.shape[0] == nf_valid
    # all uvs inside [0, 1]
    assert (uvs >= -1e-6).all() and (uvs <= 1 + 1e-6).all()


def test_load_mtl_roundtrip(tmp_path):
    """load_mtl parses what save_obj_with_mtl writes, plus constants and
    ks-occlusion clearing (reference `material.py:54-102`)."""
    import numpy as np
    from PIL import Image
    from animals3d_tpu.render.export import load_mtl
    from animals3d_tpu.ops.shading import srgb_to_rgb

    tex = (np.linspace(0, 1, 8 * 8 * 3).reshape(8, 8, 3) * 255).astype("uint8")
    Image.fromarray(tex).save(tmp_path / "m_kd.png")
    ks = (np.full((4, 4, 3), 128)).astype("uint8")
    Image.fromarray(ks).save(tmp_path / "m_ks.png")
    (tmp_path / "m.mtl").write_text(
        "newmtl material_0\n"
        "bsdf   pbr\n"
        "map_Kd m_kd.png\n"
        "map_Ks m_ks.png\n"
        "bump   m_ks.png\n"
        "newmtl flat\n"
        "Kd 0.5 0.25 0.125\n"
        "Ks 0.0 0.4 0.2\n")
    mats = load_mtl(str(tmp_path / "m.mtl"))
    assert [m["name"] for m in mats] == ["material_0", "flat"]
    m0, m1 = mats
    assert m0["kd"].shape == (8, 8, 3) and m0["ks"].shape == (4, 4, 3)
    # kd is sRGB->linear of the stored image
    want = np.asarray(srgb_to_rgb(tex.astype(np.float32) / 255.0))
    np.testing.assert_allclose(np.asarray(m0["kd"]), want, atol=1e-5)
    # occlusion channel cleared, others kept
    np.testing.assert_allclose(np.asarray(m0["ks"][..., 0]), 0.0)
    np.testing.assert_allclose(np.asarray(m0["ks"][..., 1]), 128 / 255.0,
                               atol=1e-5)
    # bump maps to [-1, 1]
    np.testing.assert_allclose(np.asarray(m0["normal"]),
                               2 * (128 / 255.0) - 1, atol=1e-5)
    # constant material becomes 1x1 maps
    assert m1["kd"].shape == (1, 1, 3) and m1["ks"].shape == (1, 1, 3)
    np.testing.assert_allclose(
        np.asarray(m1["kd"])[0, 0],
        np.asarray(srgb_to_rgb(jnp.asarray([0.5, 0.25, 0.125]))), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1["ks"])[0, 0], [0.0, 0.4, 0.2],
                               atol=1e-6)
