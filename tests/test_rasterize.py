import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.ops import rasterize as rz


def rasterize_np(v_clip, faces, f_valid, hw):
    """Per-pixel brute-force oracle with the same conventions."""
    H, W = hw
    ndc = v_clip[..., :3] / v_clip[..., 3:4]
    sx = (ndc[..., 0] + 1) * 0.5 * W
    sy = (ndc[..., 1] + 1) * 0.5 * H
    z = ndc[..., 2]
    iw = 1.0 / v_clip[..., 3]
    fid = np.zeros((H, W), np.int32)
    zbuf = np.full((H, W), np.inf)
    uv = np.zeros((H, W, 2), np.float32)
    for f, (i0, i1, i2) in enumerate(faces):
        if not f_valid[f]:
            continue
        x0, x1, x2 = sx[[i0, i1, i2]]
        y0, y1, y2 = sy[[i0, i1, i2]]
        det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        if abs(det) < 1e-12:
            continue
        for i in range(H):
            for j in range(W):
                px, py = j + 0.5, i + 0.5
                l1 = ((px - x0) * (y2 - y0) - (x2 - x0) * (py - y0)) / det
                l2 = ((x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)) / det
                l0 = 1 - l1 - l2
                if l0 < 0 or l1 < 0 or l2 < 0:
                    continue
                zp = l0 * z[i0] + l1 * z[i1] + l2 * z[i2]
                if zp < zbuf[i, j]:
                    zbuf[i, j] = zp
                    fid[i, j] = f + 1
                    den = l0 * iw[i0] + l1 * iw[i1] + l2 * iw[i2]
                    uv[i, j] = [l1 * iw[i1] / den, l2 * iw[i2] / den]
    return fid, zbuf, uv


def _random_scene(rng, n_verts=12, n_faces=8, w_range=(2.0, 4.0)):
    v = rng.uniform(-0.9, 0.9, (n_verts, 3)).astype(np.float32)
    w = rng.uniform(*w_range, (n_verts, 1)).astype(np.float32)
    v_clip = np.concatenate([v * w, w], -1)  # ndc in (-0.9, 0.9)
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    f_valid = np.ones(n_faces, bool)
    return v_clip, faces, f_valid


def test_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    H = W = 32
    v_clip, faces, f_valid = _random_scene(rng)
    want_fid, want_z, want_uv = rasterize_np(v_clip, faces, f_valid, (H, W))
    rast = rz.rasterize(jnp.asarray(v_clip)[None], jnp.asarray(faces),
                        jnp.asarray(f_valid), (H, W), chunk=4)
    got_fid = np.asarray(rast.face_id[0])
    # edge pixels can legitimately tie; require > 99% agreement
    agree = (got_fid == want_fid).mean()
    assert agree > 0.99, f"only {agree:.3f} agreement"
    m = (got_fid == want_fid) & (want_fid > 0)
    np.testing.assert_allclose(np.asarray(rast.z[0])[m], want_z[m], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rast.uv[0])[m], want_uv[m], atol=1e-4)


def test_single_triangle_coverage_and_interp():
    # orthographic-like (w=1): triangle covering the left half
    v_clip = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [-1, 1, 0.5, 1]],
                      np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    rast = rz.rasterize(jnp.asarray(v_clip)[None], jnp.asarray(faces),
                        jnp.ones(1, bool), (16, 16))
    fid = np.asarray(rast.face_id[0])
    assert fid[0, 0] == 1 and fid[15, 15] == 0
    assert 0.4 < (fid > 0).mean() < 0.6
    # interpolating vertex positions reproduces NDC xy at pixel centers
    attr = jnp.asarray(v_clip[:, :2])[None]
    out = np.asarray(rz.interpolate(attr, rast, jnp.asarray(faces))[0])
    i, j = 4, 2  # interior pixel
    want_x = (j + 0.5) / 16 * 2 - 1
    want_y = (i + 0.5) / 16 * 2 - 1
    np.testing.assert_allclose(out[i, j], [want_x, want_y], atol=1e-5)


def test_depth_ordering():
    # two stacked quads; nearer (smaller z) must win
    def quad(zval, base):
        return np.array([[-1, -1, zval, 1], [1, -1, zval, 1],
                         [1, 1, zval, 1], [-1, 1, zval, 1]], np.float32), \
            np.array([[base, base + 1, base + 2], [base, base + 2, base + 3]],
                     np.int32)
    vA, fA = quad(0.8, 0)
    vB, fB = quad(0.2, 4)
    v = np.concatenate([vA, vB])
    f = np.concatenate([fA, fB])
    rast = rz.rasterize(jnp.asarray(v)[None], jnp.asarray(f),
                        jnp.ones(4, bool), (8, 8))
    fid = np.asarray(rast.face_id[0])
    assert (fid >= 3).all()  # only the near quad's faces visible
    np.testing.assert_allclose(np.asarray(rast.z[0]), 0.2, atol=1e-5)


def test_position_gradients_via_barycentrics():
    # gradient of an interpolated attribute w.r.t. vertex positions exists
    # and matches finite differences at a pixel with stable coverage
    v_clip = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [0, 1, 0.5, 1]],
                      np.float32)
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    attr = jnp.asarray(np.array([[1.0], [0.0], [0.0]], np.float32))
    fvalid = jnp.ones(1, bool)

    def loss(vc):
        rast = rz.rasterize(vc[None], faces, fvalid, (16, 16))
        out = rz.interpolate(attr[None], rast, faces)
        return jnp.sum(out[0, 8, 7])  # interior pixel

    vc = jnp.asarray(v_clip)
    g = jax.grad(loss)(vc)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-3
    for (vi, ci) in [(0, 0), (0, 1), (2, 1)]:
        dv = np.zeros_like(v_clip)
        dv[vi, ci] = eps
        fd = (float(loss(jnp.asarray(v_clip + dv))) -
              float(loss(jnp.asarray(v_clip - dv)))) / (2 * eps)
        np.testing.assert_allclose(float(g[vi, ci]), fd, rtol=2e-2, atol=1e-4)


def test_batch_and_background():
    v1 = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [0, 1, 0.5, 1]], np.float32)
    v2 = v1.copy()
    v2[:, 0] += 10  # offscreen
    v = np.stack([v1, v2])
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    rast = rz.rasterize(jnp.asarray(v), faces, jnp.ones(1, bool), (8, 8))
    assert np.asarray(rast.face_id[0]).sum() > 0
    assert np.asarray(rast.face_id[1]).sum() == 0
    assert np.asarray(rast.uv[1]).sum() == 0


def test_resolve_matches_barycentrics_plus_interpolate():
    """Fused resolve == compute_barycentrics + interpolate (values + grads)."""
    rng = np.random.default_rng(3)
    v = rng.uniform(-0.9, 0.9, (2, 24, 3)).astype(np.float32)
    w = rng.uniform(2, 4, (2, 24, 1)).astype(np.float32)
    v_clip = jnp.asarray(np.concatenate([v * w, w], -1))
    faces = jnp.asarray(rng.integers(0, 24, (16, 3)).astype(np.int32))
    f_valid = jnp.ones(16, bool)
    attr = jnp.asarray(rng.normal(size=(2, 24, 5)).astype(np.float32))

    rast = rz.rasterize(v_clip, faces, f_valid, (32, 32))
    uv_f, out_f = rz.resolve(attr, rast, v_clip, faces)
    np.testing.assert_allclose(np.asarray(uv_f), np.asarray(rast.uv),
                               atol=1e-5)
    ref = rz.interpolate(attr, rast, faces)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref), atol=1e-5)

    def loss_fused(vc, a):
        r = rz.rasterize(vc, faces, f_valid, (32, 32))
        _, o = rz.resolve(a, r, vc, faces)
        return jnp.sum(o * o)

    def loss_ref(vc, a):
        r = rz.rasterize(vc, faces, f_valid, (32, 32))
        o = rz.interpolate(a, r, faces)
        return jnp.sum(o * o)

    gv_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(v_clip, attr)
    gv_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(v_clip, attr)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r),
                               rtol=1e-3, atol=1e-4)
