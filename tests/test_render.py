"""End-to-end render-path test: SDF → marching tets → mesh → render."""
import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry import tets as tetlib
from animals3d_tpu.geometry.mesh import make_mesh
from animals3d_tpu.ops import dmtet
from animals3d_tpu.render import camera
from animals3d_tpu.render.render import render_mesh

SCALE = 7.0


def _camera(B=1, fov_deg=25.0, z_offset=10.0):
    proj = camera.perspective(np.deg2rad(fov_deg))
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = -z_offset
    mvp = (proj @ w2c).astype(np.float32)
    campos = np.array([0.0, 0.0, z_offset], np.float32)
    return (jnp.asarray(np.tile(mvp, (B, 1, 1))),
            jnp.asarray(np.tile(w2c, (B, 1, 1))),
            jnp.asarray(np.tile(campos, (B, 1))))


def _sphere_mesh(grid_res=16, radius=0.25):
    grid = tetlib.load_tet_grid(grid_res, data_dir="/tmp/tets_cache")
    pos = grid.verts * SCALE
    sdf = (radius * SCALE - np.linalg.norm(pos, axis=-1)).astype(np.float32)
    v_cap, f_cap = tetlib.default_capacity(grid_res)
    out = dmtet.marching_tets(jnp.asarray(pos), jnp.asarray(sdf), grid,
                              v_cap, f_cap)
    return make_mesh(out.verts[None], out.faces, out.v_valid, out.f_valid,
                     out.num_verts, out.num_faces, face_gidx=out.face_gidx), grid


def test_sphere_render_mask_and_shading():
    mesh, _ = _sphere_mesh()
    mvp, w2c, campos = _camera()
    out = render_mesh(mesh, mvp, w2c, campos, (64, 64),
                      render_modes=("shaded", "geo_normal", "depth"))
    shaded = np.asarray(out["shaded"][0])            # (4, H, W)
    mask = shaded[3]
    # a centered disk: sphere radius 1.75 world at distance 10, fov 25
    # → angular radius atan(1.75/10) ≈ 9.93deg → ~0.8 of half-image
    frac = mask.mean()
    want_frac = np.pi * 0.8 ** 2 / 4                  # disk area / image
    assert abs(frac - want_frac) < 0.05, frac
    # centered: centroid near center
    ys, xs = np.mgrid[0:64, 0:64]
    cy = (ys * mask).sum() / mask.sum()
    cx = (xs * mask).sum() / mask.sum()
    assert abs(cy - 31.5) < 1.0 and abs(cx - 31.5) < 1.0
    # without a light, shaded == kd == ones strictly inside the mask
    # (erode by one pixel: AA legitimately blends rim-adjacent pixels)
    hard = mask > 0.99
    interior = hard[1:-1, 1:-1] & hard[:-2, 1:-1] & hard[2:, 1:-1] & \
        hard[1:-1, :-2] & hard[1:-1, 2:]
    assert np.allclose(shaded[0][1:-1, 1:-1][interior], 1.0, atol=1e-5)
    # geo normals: center pixel faces camera (+z) → encoded (n+1)/2 → z ~ 1
    geo = np.asarray(out["geo_normal"][0])
    assert geo[2, 32, 32] > 0.95
    # depth is normalized camera-space z (GL: negative, nearer = larger):
    # sphere center is nearest → depth ~ 1, rim farther
    depth = np.asarray(out["depth"][0, 0])
    assert depth[32, 32] > depth[32, 8] or mask[32, 8] == 0


def test_mask_loss_gradients_reach_sdf():
    """The full silhouette-gradient chain: mask L2 → antialias → verts → sdf."""
    grid = tetlib.load_tet_grid(8, data_dir="/tmp/tets_cache")
    pos = jnp.asarray(grid.verts * SCALE)
    base_sdf = jnp.asarray(
        (0.25 * SCALE - np.linalg.norm(grid.verts * SCALE, axis=-1)).astype(np.float32))
    mvp, w2c, campos = _camera()
    v_cap, f_cap = 1024, 2048

    # target mask: a smaller disk → loss should want to shrink the sphere
    target = np.zeros((32, 32), np.float32)
    ys, xs = np.mgrid[0:32, 0:32]
    target[(ys - 15.5) ** 2 + (xs - 15.5) ** 2 < 8 ** 2] = 1.0
    target = jnp.asarray(target)

    def loss_fn(dsdf):
        out = dmtet.marching_tets(pos, base_sdf + dsdf, grid, v_cap, f_cap)
        mesh = make_mesh(out.verts[None], out.faces, out.v_valid, out.f_valid,
                         out.num_verts, out.num_faces)
        rendered = render_mesh(mesh, mvp, w2c, campos, (32, 32),
                               render_modes=("shaded",))
        mask_pred = rendered["shaded"][0, 3]
        return jnp.mean((mask_pred - target) ** 2)

    g = jax.grad(loss_fn)(jnp.zeros_like(base_sdf))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    # shrinking the sphere (negative sdf perturbation) must reduce the loss
    d = -g / (np.linalg.norm(g) + 1e-9) * 0.05
    l0 = float(loss_fn(jnp.zeros_like(base_sdf)))
    l1 = float(loss_fn(jnp.asarray(d)))
    assert l1 < l0, (l0, l1)


def test_render_batched_and_background():
    mesh, _ = _sphere_mesh(grid_res=8)
    B = 3
    mesh2 = mesh.extend(B)
    mvp, w2c, campos = _camera(B)
    bg = jnp.ones((B, 32, 32, 3)) * 0.5
    out = render_mesh(mesh2, mvp, w2c, campos, (32, 32), background=bg,
                      render_modes=("shaded", "kd"))
    shaded = np.asarray(out["shaded"])
    assert shaded.shape == (B, 4, 32, 32)
    # background pixels = 0.5, alpha 0
    assert abs(shaded[0, 0, 0, 0] - 0.5) < 1e-5
    assert shaded[0, 3, 0, 0] < 1e-5
    # batch entries identical
    np.testing.assert_allclose(shaded[0], shaded[1], atol=1e-6)


def test_spp_msaa_low_res_shading():
    """spp>1 + msaa: supersampled visibility, base-res shading
    (`render.py:170-173,218-220`); both paths agree closely on a sphere."""
    mesh, _ = _sphere_mesh()
    mvp, w2c, campos = _camera()
    out_msaa = render_mesh(mesh, mvp, w2c, campos, (32, 32), spp=2,
                           msaa=True, render_modes=("shaded",))
    out_full = render_mesh(mesh, mvp, w2c, campos, (32, 32), spp=2,
                           msaa=False, render_modes=("shaded",))
    out_1spp = render_mesh(mesh, mvp, w2c, campos, (32, 32), spp=1,
                           render_modes=("shaded",))
    a = np.asarray(out_msaa["shaded"][0])
    b = np.asarray(out_full["shaded"][0])
    c = np.asarray(out_1spp["shaded"][0])
    assert a.shape == b.shape == c.shape == (4, 32, 32)
    # identical where shading is flat (kd = 1, no light): only silhouette
    # sub-sampling can differ
    assert np.abs(a - b).mean() < 0.01
    # supersampled mask is smoother than 1-spp at the rim: fractional
    # coverage values strictly between 0 and 1 appear more often
    frac_pix = lambda m: ((m > 0.1) & (m < 0.9)).sum()
    assert frac_pix(a[3]) >= frac_pix(c[3])


def test_env_light_render_path():
    """End-to-end render with a trainable environment cubemap: gradients
    reach the cubemap through the pbr shading branch."""
    mesh, _ = _sphere_mesh()
    mvp, w2c, campos = _camera()
    env = jnp.ones((6, 16, 16, 3)) * jnp.asarray([0.6, 0.4, 0.2])

    def loss(env):
        out = render_mesh(mesh, mvp, w2c, campos, (32, 32), env_light=env,
                          render_modes=("shaded",))
        return jnp.sum(out["shaded"][:, :3] ** 2), out

    (val, out), g = jax.value_and_grad(loss, has_aux=True)(env)
    shaded = np.asarray(out["shaded"][0])
    mask = shaded[3] > 0.5
    # lit pixels carry the env color (kd = 1 -> diffuse = env color + spec)
    assert shaded[0][mask].mean() > shaded[2][mask].mean()
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_compute_tangents_oracle_and_render_buffer():
    """compute_tangents vs a literal numpy transcription of the reference
    (`/root/reference/model/render/mesh.py:310-350`), then the `tangent`
    render buffer end-to-end."""
    import dataclasses
    from animals3d_tpu.geometry.mesh import compute_tangents
    from animals3d_tpu.render.export import face_cell_uvs

    mesh, _ = _sphere_mesh(grid_res=8)
    F = mesh.t_pos_idx.shape[0]
    uvs, _ = face_cell_uvs(F)

    tng = np.asarray(compute_tangents(
        mesh.v_pos, mesh.t_pos_idx, jnp.asarray(uvs), mesh.v_nrm,
        mesh.v_valid, mesh.f_valid))

    # --- numpy oracle (reference semantics, valid faces only) ---
    v = np.asarray(mesh.v_pos[0])
    n = np.asarray(mesh.v_nrm[0])
    fidx = np.asarray(mesh.t_pos_idx)
    fval = np.asarray(mesh.f_valid)
    acc = np.zeros_like(v)
    cnt = np.zeros((v.shape[0], 1))
    for f in np.nonzero(fval)[0]:
        i0, i1, i2 = fidx[f]
        uve1 = uvs[f, 1] - uvs[f, 0]
        uve2 = uvs[f, 2] - uvs[f, 0]
        pe1 = v[i1] - v[i0]
        pe2 = v[i2] - v[i0]
        nom = pe1 * uve2[1] - pe2 * uve1[1]
        den = uve1[0] * uve2[1] - uve1[1] * uve2[0]
        den = max(den, 1e-6) if den > 0 else min(den, -1e-6)
        t = nom / den
        for i in (i0, i1, i2):
            acc[i] += t
            cnt[i] += 1
    vv = np.asarray(mesh.v_valid) & (cnt[:, 0] > 0)
    t = acc / np.maximum(cnt, 1)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-10)
    t = t - (t * n).sum(-1, keepdims=True) * n
    resid = np.linalg.norm(t, axis=-1, keepdims=True)
    # exclude tangent-parallel-to-normal degeneracies: there the oracle
    # normalizes numerical noise while the kernel picks its [1,0,0] fallback
    vv &= resid[:, 0] > 1e-5
    t /= np.maximum(resid, 1e-10)

    np.testing.assert_allclose(tng[0][vv], t[vv], atol=1e-4)
    # unit length + orthogonal to normals on valid verts
    np.testing.assert_allclose(
        np.linalg.norm(tng[0][vv], axis=-1), 1.0, atol=1e-4)
    assert np.abs((tng[0][vv] * n[vv]).sum(-1)).max() < 1e-3

    # --- render buffer ---
    mesh_t = dataclasses.replace(
        mesh, v_tng=jnp.asarray(compute_tangents(
            mesh.v_pos, mesh.t_pos_idx, jnp.asarray(uvs), mesh.v_nrm,
            mesh.v_valid, mesh.f_valid)))
    mvp, w2c, campos = _camera()
    out = render_mesh(mesh_t, mvp, w2c, campos, (32, 32),
                      render_modes=("shaded", "tangent"))
    assert out["tangent"].shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out["tangent"])).all()
    assert float(jnp.abs(out["tangent"]).sum()) > 0
