import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.ops import rasterize as rz
from animals3d_tpu.ops.antialias import antialias


def _square(x_right, H=16, W=16):
    """A square with its right edge at NDC x=x_right, occupying left part."""
    x_right = jnp.asarray(x_right, jnp.float32)
    base = jnp.asarray(np.array([
        [-2.0, -2.0, 0.5, 1.0],
        [0.0, -2.0, 0.5, 1.0],
        [0.0, 2.0, 0.5, 1.0],
        [-2.0, 2.0, 0.5, 1.0],
    ], np.float32))
    shift = jnp.zeros((4, 4)).at[1, 0].set(x_right).at[2, 0].set(x_right)
    v = base + shift
    f = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    return v, f


def _coverage(x_right, H=16, W=16):
    v, f = _square(x_right, H, W)
    rast = rz.rasterize(v[None], f, jnp.ones(2, bool), (H, W))
    alpha = (rast.face_id > 0).astype(jnp.float32)[..., None]
    aa = antialias(alpha, rast, v[None], f)
    return aa, rast, v, f


def test_forward_subpixel_coverage():
    # total antialiased alpha should track the true covered area linearly,
    # while the hard mask staircases
    H = W = 16
    areas = []
    for x in np.linspace(-0.01, 0.11, 7):
        aa, _, _, _ = _coverage(float(x), H, W)
        areas.append(float(jnp.sum(aa)))
    areas = np.array(areas)
    # true area of the covered half-plane in pixels: (x+1)/2*W per row * H
    want = (np.linspace(-0.01, 0.11, 7) + 1) / 2 * W * H
    np.testing.assert_allclose(areas, want, atol=0.75)
    # strictly increasing (no staircase plateaus)
    assert (np.diff(areas) > 0.1).all()


def test_silhouette_gradient_matches_area_derivative():
    H = W = 16

    def total_alpha(x_right):
        v, f = _square(x_right, H, W)
        rast = rz.rasterize(v[None], f, jnp.ones(2, bool), (H, W))
        alpha = (rast.face_id > 0).astype(jnp.float32)[..., None]
        # re-inject differentiable v into antialias (rasterize stop-grads it)
        return jnp.sum(antialias(alpha, rast, v[None], f))

    g = jax.grad(lambda x: total_alpha(x))(jnp.asarray(0.037))
    # moving the right edge by dx in NDC adds dx/2*W pixels per row × H rows
    want = 0.5 * W * H
    np.testing.assert_allclose(float(g), want, rtol=0.05)


def test_interior_shared_edges_untouched():
    # a flat two-triangle quad: the shared diagonal must NOT be blended
    v = jnp.asarray(np.array([
        [-0.8, -0.8, 0.5, 1.0], [0.8, -0.8, 0.5, 1.0],
        [0.8, 0.8, 0.5, 1.0], [-0.8, 0.8, 0.5, 1.0]], np.float32))
    f = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    rast = rz.rasterize(v[None], f, jnp.ones(2, bool), (16, 16))
    # color differs per face id so interior blending would be visible
    color = (rast.face_id.astype(jnp.float32))[..., None]
    aa = antialias(color, rast, v[None], f)
    inside = np.asarray(rast.face_id[0]) > 0
    # erode: pixels whose 4-neighborhood is fully inside
    core = inside[1:-1, 1:-1] & inside[:-2, 1:-1] & inside[2:, 1:-1] & \
        inside[1:-1, :-2] & inside[1:-1, 2:]
    diff = np.abs(np.asarray(aa[0, 1:-1, 1:-1, 0]) -
                  np.asarray(color[0, 1:-1, 1:-1, 0]))
    assert diff[core].max() < 1e-6


def test_color_gradient_passthrough():
    aa, rast, v, f = _coverage(0.0)

    def loss(c):
        return jnp.sum(antialias(c, rast, v[None], f) ** 2)

    alpha = (rast.face_id > 0).astype(jnp.float32)[..., None]
    g = jax.grad(loss)(alpha)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_compact_matches_dense():
    # an articulated-ish scene: two overlapping squares at different depths
    # produces background silhouettes AND depth-gap internal silhouettes
    from animals3d_tpu.ops.antialias import antialias_dense

    v1, f1 = _square(0.037)
    v2, f2 = _square(0.53)
    v2 = v2.at[:, 2].set(0.8).at[:, 1].mul(0.4)
    v = jnp.concatenate([v1, v2], 0)
    f = jnp.concatenate([f1, f2 + 4], 0)
    rast = rz.rasterize(v[None], f, jnp.ones(4, bool), (16, 16))
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 5)).astype(np.float32))

    dense = antialias_dense(color, rast, v[None], f)
    compact = antialias(color, rast, v[None], f)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense),
                               atol=1e-5)

    # gradients agree too (color and vertex paths)
    gd = jax.grad(lambda vv: jnp.sum(
        antialias_dense(color, rast, vv, f) ** 2))(v[None])
    gc = jax.grad(lambda vv: jnp.sum(
        antialias(color, rast, vv, f) ** 2))(v[None])
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd), atol=1e-4)


def _two_quads(x_front_right, H=32, W=32):
    """A front quad (z=0.3) whose right edge x_front_right lies OVER a back
    quad (z=0.7) — the silhouette is interior (object-over-object), so pair
    detection relies on the depth-gap criterion, not background."""
    x = jnp.asarray(x_front_right, jnp.float32)
    front = jnp.asarray(np.array([
        [-2.0, -2.0, 0.3, 1.0],
        [0.0, -2.0, 0.3, 1.0],
        [0.0, 2.0, 0.3, 1.0],
        [-2.0, 2.0, 0.3, 1.0],
    ], np.float32))
    front = front + jnp.zeros((4, 4)).at[1, 0].set(x).at[2, 0].set(x)
    back = jnp.asarray(np.array([
        [-3.0, -3.0, 0.7, 1.0],
        [3.0, -3.0, 0.7, 1.0],
        [3.0, 3.0, 0.7, 1.0],
        [-3.0, 3.0, 0.7, 1.0],
    ], np.float32))
    v = jnp.concatenate([front, back], 0)
    f = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3],
                              [4, 5, 6], [4, 6, 7]], np.int32))
    return v, f


def test_self_occlusion_silhouette_gradient_fd():
    """Finite-difference validation of the depth-gap silhouette gradient
    (VERDICT r1 weak #4): front-over-back edge, colors 1.0 vs 0.3 →
    d(sum)/dx = H·(W/2)·Δcolor, for dense AND compacted AA."""
    from animals3d_tpu.ops.antialias import antialias_dense

    H = W = 32

    def total(x, compacted):
        v, f = _two_quads(x, H, W)
        rast = rz.rasterize(v[None], f, jnp.ones(4, bool), (H, W))
        color = jnp.where((rast.face_id <= 2) & (rast.face_id > 0), 1.0, 0.3)
        color = jnp.where(rast.face_id > 0, color, 0.0)[..., None]
        fn = antialias if compacted else antialias_dense
        return jnp.sum(fn(color, rast, v[None], f))

    x0 = 0.013
    want = H * (W / 2) * (1.0 - 0.3)          # d(covered front px)/dx · Δc
    for compacted in (False, True):
        g = float(jax.grad(total)(jnp.asarray(x0), compacted))
        np.testing.assert_allclose(g, want, rtol=0.05)
        h = 0.004
        fd = (float(total(jnp.asarray(x0 + h), compacted))
              - float(total(jnp.asarray(x0 - h), compacted))) / (2 * h)
        np.testing.assert_allclose(g, fd, rtol=0.08)


def test_pair_count_diagnostic_and_cap_headroom():
    from animals3d_tpu.ops.antialias import (default_pair_cap,
                                             silhouette_pair_count)

    H = W = 32
    v, f = _two_quads(0.0, H, W)
    rast = rz.rasterize(v[None], f, jnp.ones(4, bool), (H, W))
    n = int(silhouette_pair_count(rast)[0])
    # the back quad covers the whole frame, so the ONLY silhouette is the
    # front quad's right edge over it: exactly H depth-gap pairs — without
    # the depth-gap criterion this would be 0
    assert n == H
    assert n < default_pair_cap(H, W), "training-like scene must fit cap"
