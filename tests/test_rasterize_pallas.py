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


def test_resolve_grad_pallas_matches_scatter():
    """The MXU one-hot-matmul backward equals the dense scatter-add
    transpose exactly (interpret mode)."""
    import numpy as np
    from animals3d_tpu.ops.rasterize_pallas import resolve_grad_pallas

    B, H, W, R = 2, 64, 64, 10
    chunk, nch = 64, 2
    Fp = chunk * nch
    F = 100
    n_pix = H * W
    r = np.random.default_rng(0)

    blk = 32
    perm = r.permutation(Fp // blk)
    ids_sorted = (perm[:, None] * blk
                  + np.arange(blk)[None]).reshape(nch, chunk).astype(np.int32)

    sel = r.integers(0, F, (B, n_pix)).astype(np.int32)
    g = r.normal(0, 1, (B, n_pix, R)).astype(np.float32)
    # background rows: sel 0 with zero cotangent (resolve's contract)
    bg = r.uniform(size=(B, n_pix)) < 0.3
    sel[bg] = 0
    g[bg] = 0.0

    # ground-truth overlap: tile t ↔ chunk c iff some pixel's face is in c
    from animals3d_tpu.ops.rasterize_pallas import TILE_H, TILE_W
    nty, ntx = H // TILE_H, W // TILE_W
    T = nty * ntx
    sel_t = sel.reshape(B, nty, TILE_H, ntx, TILE_W) \
        .transpose(0, 1, 3, 2, 4).reshape(B, T, TILE_H * TILE_W)
    inv = np.zeros(Fp, np.int64)
    inv[ids_sorted.reshape(-1)] = np.arange(Fp)
    overlap = np.zeros((B, T, nch), bool)
    for b in range(B):
        for t in range(T):
            overlap[b, t, np.unique(inv[sel_t[b, t]] // chunk)] = True

    d = np.asarray(resolve_grad_pallas(
        jnp.asarray(g), jnp.asarray(sel), jnp.asarray(ids_sorted),
        jnp.asarray(overlap), (H, W), F, interpret=True))

    want = np.zeros((B, F, R), np.float32)
    for b in range(B):
        np.add.at(want[b], sel[b], g[b])
    np.testing.assert_allclose(d, want, atol=1e-5, rtol=1e-5)


def test_resolve_rows_cm_fwd_and_vjp():
    """The channel-major one-hot-matmul resolve rows equal the plain gather
    (re-laid out), and jax.grad through the custom_vjp equals the
    plain-gather gradient (both interpret mode)."""
    import numpy as np
    from animals3d_tpu.ops.rasterize import _resolve_rows_cm
    from animals3d_tpu.ops.rasterize_pallas import TILE_H, TILE_W

    B, H, W, R = 2, 32, 64, 8         # R multiple of 8 (kernel contract)
    chunk, nch = 64, 2
    Fp = chunk * nch
    F = 90
    n_pix = H * W
    r = np.random.default_rng(3)

    blk = 32
    perm = r.permutation(Fp // blk)
    ids_sorted = (perm[:, None] * blk
                  + np.arange(blk)[None]).reshape(nch, chunk).astype(np.int32)
    sel = jnp.asarray(r.integers(0, F, (B, n_pix)), dtype=jnp.int32)
    pf = jnp.asarray(r.normal(0, 1, (B, F, R)).astype(np.float32))
    nty, ntx = H // TILE_H, W // TILE_W
    won = jnp.ones((B, nty * ntx, nch), bool)

    def to_cm_tile(rows):                       # (B, HW, R) -> (B, R, T*TP)
        t = rows.reshape(B, nty, TILE_H, ntx, TILE_W, R) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(B, n_pix, R)
        return t.transpose(0, 2, 1)

    rT = _resolve_rows_cm(pf, sel, jnp.asarray(ids_sorted), won, (H, W))
    want = to_cm_tile(jax.vmap(lambda p, s: p[s])(pf, sel))
    np.testing.assert_allclose(np.asarray(rT), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    w = (jnp.arange(rT.size, dtype=jnp.float32) % 13).reshape(rT.shape)

    def loss_mxu(pf):
        rT = _resolve_rows_cm(pf, sel, jnp.asarray(ids_sorted), won, (H, W))
        return jnp.sum(rT * w)

    def loss_ref(pf):
        return jnp.sum(to_cm_tile(jax.vmap(lambda p, s: p[s])(pf, sel)) * w)

    ga = jax.grad(loss_mxu)(pf)
    gb = jax.grad(loss_ref)(pf)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               atol=1e-4, rtol=1e-4)


def test_resolve_kernel_path_matches_gather_path(monkeypatch):
    """Full `resolve` on a real rasterized scene: the Pallas kernel path
    (A3D_FORCE_MXU, interpret) matches the XLA gather path, values + grads,
    including background masking (kernel emits zeros, gather emits pf[0])."""
    import numpy as np
    from animals3d_tpu.ops.rasterize import resolve
    from animals3d_tpu.ops.rasterize_pallas import rasterize_pallas

    r = np.random.default_rng(7)
    B, V, F = 2, 60, 40
    H = W = 32
    v = r.normal(0, 0.4, (B, V, 3)).astype(np.float32)
    v[..., 2] += 3.0
    w = np.ones((B, V, 1), np.float32) * v[..., 2:3]
    v_clip = jnp.asarray(np.concatenate([v[..., :2] * 2, v[..., 2:] * 0.5,
                                         w], -1))
    faces = jnp.asarray(r.integers(0, V, (F, 3)), dtype=jnp.int32)
    f_valid = jnp.ones((F,), bool)
    attr = jnp.asarray(r.normal(0, 1, (B, V, 5)).astype(np.float32))
    fattr = jnp.asarray(r.normal(0, 1, (B, F, 3)).astype(np.float32))

    pv = jnp.concatenate([jnp.asarray(v), v_clip], -1)
    tab = pv.transpose(1, 0, 2).reshape(V, B * 7)
    fvr = tab[faces]
    rast = rasterize_pallas(v_clip, faces, f_valid, (H, W), chunk=32,
                            interpret=True, fv_rows=fvr)
    assert rast.bw_aux is not None
    assert int(jnp.sum(rast.face_id > 0)) > 50    # scene actually covers

    def run(mode):
        monkeypatch.delenv("A3D_FORCE_MXU", raising=False)
        monkeypatch.delenv("A3D_MXU_FWD", raising=False)
        monkeypatch.delenv("A3D_NO_MXU_BWD", raising=False)
        if mode == "mxu":           # one-hot matmul fwd + bwd
            monkeypatch.setenv("A3D_FORCE_MXU", "1")
            monkeypatch.setenv("A3D_MXU_FWD", "1")
        elif mode == "hybrid":      # gather fwd + Pallas bwd (TPU default)
            monkeypatch.setenv("A3D_FORCE_MXU", "1")
        else:                       # pure XLA gather/scatter autodiff
            monkeypatch.setenv("A3D_NO_MXU_BWD", "1")

        def f(v_clip, attr, fattr):
            uv, out, fa = resolve(attr, rast, v_clip, faces, face_attr=fattr)
            q = (jnp.arange(out.size, dtype=jnp.float32) % 7).reshape(out.shape)
            q2 = (jnp.arange(fa.size, dtype=jnp.float32) % 5).reshape(fa.shape)
            q3 = (jnp.arange(uv.size, dtype=jnp.float32) % 3).reshape(uv.shape)
            return (jnp.sum(out * q) + jnp.sum(fa * q2) + jnp.sum(uv * q3),
                    (uv, out, fa))

        (loss, outs), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(v_clip, attr, fattr)
        monkeypatch.delenv("A3D_NO_MXU_BWD", raising=False)
        return loss, outs, grads

    l1, o1, g1 = run("mxu")
    l2, o2, g2 = run("gather")
    l3, o3, g3 = run("hybrid")
    for oa, ga in ((o1, g1), (o3, g3)):
        for a, b in zip(oa, o2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
        for a, b in zip(ga, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, rtol=2e-3)


def test_pallas_depth_stack_early_out_parity():
    """Occlusion early-out stress: 8 full-screen quads stacked in z (every
    tile fully covered by the front quad, all behind chunks skippable) plus
    an exact-z duplicate of the front quad (tie must resolve to the
    smallest original face id, skip must not fire on equal z). Parity vs
    the XLA path on both list orders (chunk=2 -> one quad per chunk)."""
    import os
    quads = []
    faces = []
    # front quad twice (exact z tie), then 7 more behind
    depths = [1.0, 1.0] + [1.0 + 0.2 * i for i in range(1, 8)]
    for qi, z in enumerate(depths):
        i0 = 4 * qi
        s = 1.0 if qi != 3 else 0.3          # one partial quad mid-stack
        quads += [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]]
        faces += [[i0, i0 + 1, i0 + 2], [i0, i0 + 2, i0 + 3]]
    v = np.asarray(quads, np.float32)[None]
    w = np.full((1, v.shape[1], 1), 2.0, np.float32)
    v_clip = jnp.asarray(np.concatenate([v * w, w], -1))
    f = jnp.asarray(np.asarray(faces, np.int32))
    f_valid = jnp.ones((f.shape[0],), bool)

    ref = rz.rasterize(v_clip, f, f_valid, (32, 32), chunk=2)
    got = rasterize_pallas(v_clip, f, f_valid, (32, 32), chunk=2,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got.face_id),
                                  np.asarray(ref.face_id))
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                               atol=1e-5)
    # the winner everywhere must be the FIRST of the two tied front faces
    assert set(np.unique(np.asarray(got.face_id))) <= {1, 2}

    # fv_rows struct-of-arrays path under the same stack
    B, V = 1, v.shape[1]
    v_pos = jnp.asarray(v)
    tab = jnp.concatenate([v_pos, v_clip], -1).transpose(1, 0, 2) \
        .reshape(V, B * 7)
    got_t = rasterize_pallas(v_clip, f, f_valid, (32, 32), chunk=2,
                             interpret=True, fv_rows=tab[f])
    np.testing.assert_array_equal(np.asarray(got_t.face_id),
                                  np.asarray(ref.face_id))


def test_pallas_v6_dense_lists_parity(monkeypatch):
    """v6 (dense per-tile unit lists + gathered slabs) parity vs the XLA
    path on the fv_rows fast path, including the overflow fallback
    (A3D_V6_CAP=2 forces count > S for interior tiles)."""
    from animals3d_tpu.ops.rasterize_pallas import rasterize_pallas as rp
    rng = np.random.default_rng(7)
    B, V, Fn = 2, 48, 40
    v = rng.uniform(-0.9, 0.9, (B, V, 3)).astype(np.float32)
    w = rng.uniform(2, 4, (B, V, 1)).astype(np.float32)
    v_clip = jnp.asarray(np.concatenate([v * w, w], -1))
    v_pos = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (Fn, 3)).astype(np.int32))
    f_valid = np.ones(Fn, bool)
    f_valid[5] = False
    f_valid = jnp.asarray(f_valid)
    tab = jnp.concatenate([v_pos, v_clip], -1).transpose(1, 0, 2) \
        .reshape(V, B * 7)
    fvr = tab[faces]
    ref = rz.rasterize(v_clip, faces, f_valid, (32, 32), chunk=8)

    def run():
        rp.clear_cache()          # env levers are trace-time; force retrace
        return rp(v_clip, faces, f_valid, (32, 32), chunk=8,
                  interpret=True, fv_rows=fvr)

    for cap in ("128", "2"):      # dense path, then overflow fallback
        monkeypatch.setenv("A3D_RASTER_V", "6")
        monkeypatch.setenv("A3D_V6_CAP", cap)
        got = run()
        fa, fb = np.asarray(ref.face_id), np.asarray(got.face_id)
        np.testing.assert_array_equal(fa > 0, fb > 0)
        assert (fa == fb).mean() > 0.99, f"cap={cap}"
        m = fa > 0
        np.testing.assert_allclose(np.asarray(got.z)[m],
                                   np.asarray(ref.z)[m], atol=1e-4)
        # winner-chunk flags stay a superset of true winners (resolve
        # kernels rely on this): every winning chunk must be flagged
        ids_sorted, won = got.bw_aux
        fid = np.asarray(got.face_id)
        srt = np.asarray(ids_sorted)      # (nch, chunk) original ids
        wonr = np.asarray(won)            # (B, T, nch)
        nty, ntx = 2, 1                   # 32/16, 32/32 tiles
        for b in range(B):
            for fidv in np.unique(fid[b])[1:]:
                ch = int(np.argwhere(srt == fidv - 1)[0][0])
                ys, xs = np.nonzero(fid[b] == fidv)
                for y, x in zip(ys[:3], xs[:3]):
                    t = (y // 16) * ntx + (x // 32)
                    assert wonr[b, t, ch], (b, fidv, t, ch, cap)
    monkeypatch.delenv("A3D_RASTER_V", raising=False)
    monkeypatch.delenv("A3D_V6_CAP", raising=False)
    rp.clear_cache()


def test_pallas_v6_depth_stack(monkeypatch):
    """v6 under the occlusion/exact-z-tie stress stack."""
    from animals3d_tpu.ops.rasterize_pallas import rasterize_pallas as rp
    quads, faces = [], []
    depths = [1.0, 1.0] + [1.0 + 0.2 * i for i in range(1, 8)]
    for qi, z in enumerate(depths):
        i0 = 4 * qi
        s = 1.0 if qi != 3 else 0.3
        quads += [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]]
        faces += [[i0, i0 + 1, i0 + 2], [i0, i0 + 2, i0 + 3]]
    v = np.asarray(quads, np.float32)[None]
    w = np.full((1, v.shape[1], 1), 2.0, np.float32)
    v_clip = jnp.asarray(np.concatenate([v * w, w], -1))
    f = jnp.asarray(np.asarray(faces, np.int32))
    f_valid = jnp.ones((f.shape[0],), bool)
    ref = rz.rasterize(v_clip, f, f_valid, (32, 32), chunk=2)
    tab = jnp.concatenate([jnp.asarray(v), v_clip], -1).transpose(1, 0, 2) \
        .reshape(v.shape[1], 7)
    monkeypatch.setenv("A3D_RASTER_V", "6")
    monkeypatch.setenv("A3D_NSUB", "2")   # chunk=2: v6 needs nsub>1
    rp.clear_cache()
    got = rp(v_clip, f, f_valid, (32, 32), chunk=2, interpret=True,
             fv_rows=tab[f])
    np.testing.assert_array_equal(np.asarray(got.face_id),
                                  np.asarray(ref.face_id))
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                               atol=1e-5)
    assert set(np.unique(np.asarray(got.face_id))) <= {1, 2}
    monkeypatch.delenv("A3D_RASTER_V", raising=False)
    rp.clear_cache()
