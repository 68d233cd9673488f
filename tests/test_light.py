"""Split-sum environment light: parity with the reference's brute-force
cubemap convolutions (`/root/reference/model/render/renderutils/c_src/
cubemap.cu:110-345`) and the Karis FG integral behind its
`bsdf_256_256.bin` LUT (`light.py:117-120`)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animals3d_tpu.render import light


def test_cube_texel_dirs_unit_and_coverage():
    d = light.cube_texel_dirs(8)
    assert d.shape == (6, 8, 8, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    # all six axis directions are hit by some texel (face centers)
    center = d[:, 3:5, 3:5].reshape(6, -1, 3).mean(1)
    center /= np.linalg.norm(center, axis=-1, keepdims=True)
    want = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    np.testing.assert_allclose(center, want, atol=1e-6)


def test_texel_areas_cover_sphere():
    """The reference's separable atan pixel_area (`cubemap.cu:17-29`)
    misestimates the sphere by a few percent by construction — assert
    we reproduce that approximation, not the exact 4π."""
    res = 16
    total = 6 * light.cube_texel_areas(res).sum()
    np.testing.assert_allclose(total, 4 * np.pi, rtol=0.12)


def test_diffuse_cubemap_matches_bruteforce_oracle():
    """Against a literal numpy transcription of DiffuseCubemapFwdKernel."""
    res = 8
    r = np.random.default_rng(0)
    cube = r.uniform(0, 1, (6, res, res, 3)).astype(np.float32)

    dirs = light.cube_texel_dirs(res)
    area = np.broadcast_to(light.cube_texel_areas(res), (6, res, res))
    want = np.zeros_like(cube)
    flat_d = dirs.reshape(-1, 3)
    flat_c = cube.reshape(-1, 3)
    flat_a = area.reshape(-1)
    for p in range(flat_d.shape[0]):
        cos = np.clip(flat_d @ flat_d[p], 0.0, 0.999)
        want.reshape(-1, 3)[p] = (flat_c * (cos * flat_a / np.pi)[:, None]).sum(0)

    got = np.asarray(light.diffuse_cubemap(jnp.asarray(cube)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_diffuse_cubemap_constant_energy():
    """Cosine-convolving a constant environment must return (almost) the
    same constant: ∫ cosθ dω / π = 1 over the hemisphere."""
    cube = jnp.ones((6, 16, 16, 3)) * 0.7
    out = np.asarray(light.diffuse_cubemap(cube))
    # rtol tracks the reference pixel_area approximation (see above)
    np.testing.assert_allclose(out, 0.7, rtol=0.12)


def test_specular_prefilter_low_roughness_identity():
    res = 16
    r = np.random.default_rng(1)
    cube = r.uniform(0, 1, (6, res, res, 3)).astype(np.float32)
    out = np.asarray(light.specular_prefilter(jnp.asarray(cube), 0.0))
    np.testing.assert_allclose(out, cube, atol=1e-6)


def test_specular_prefilter_smooths_and_preserves_constants():
    res = 16
    cube = jnp.ones((6, res, res, 3)) * 0.3
    out = np.asarray(light.specular_prefilter(cube, 0.5, num_samples=64))
    np.testing.assert_allclose(out, 0.3, rtol=1e-5)  # weights normalize

    # a single bright texel spreads: max drops, stays positive around it
    spiky = np.zeros((6, res, res, 3), np.float32)
    spiky[4, res // 2, res // 2] = 100.0
    blur = np.asarray(light.specular_prefilter(jnp.asarray(spiky), 0.6,
                                               num_samples=128))
    assert blur.max() < 100.0
    assert (blur[4] > 0).sum() > 3 * (spiky[4] > 0).sum()


def test_fg_lut_against_dense_resample():
    lut = light._fg_lut_np(res=32, num_samples=128)
    assert np.isfinite(lut).all()
    assert (lut >= 0).all() and (lut <= 1.5).all()
    # smooth surface, head-on view: A (scale) near 1, B (bias) small
    a_smooth = lut[-1, 0, 0]
    assert a_smooth > 0.9
    assert lut[-1, 0, 1] < 0.1
    # rougher surfaces lose scale monotonically at fixed n·v
    col = lut[-1, :, 0]
    assert col[-1] < col[0]


def test_get_mip_two_segment_map():
    n = 5
    lv = light.get_mip(jnp.asarray([0.0, light.MIN_ROUGHNESS,
                                    light.MAX_ROUGHNESS, 1.0]), n)
    got = np.asarray(lv)
    np.testing.assert_allclose(got[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[2], n - 2, atol=1e-6)
    np.testing.assert_allclose(got[3], n - 1, atol=1e-6)


def test_sample_cubemap_bilinear_roundtrip():
    """Sampling exactly at texel-center directions reproduces texels."""
    res = 8
    r = np.random.default_rng(2)
    cube = r.uniform(0, 1, (6, res, res, 3)).astype(np.float32)
    dirs = light.cube_texel_dirs(res)
    got = np.asarray(light.sample_cubemap(jnp.asarray(cube),
                                          jnp.asarray(dirs)))
    np.testing.assert_allclose(got, cube, atol=1e-4)


def test_environment_shade_end_to_end_and_grads():
    """Full split-sum shade is finite, responds to the env map, and is
    differentiable wrt the base cubemap (it is a trainable parameter in the
    reference, `light.py:57`)."""
    H = W = 8
    r = np.random.default_rng(3)
    base = jnp.asarray(r.uniform(0.2, 1.0, (6, 16, 16, 3)).astype(np.float32))
    pos = jnp.asarray(r.normal(0, 1, (1, H, W, 3)).astype(np.float32))
    nrm = jnp.asarray(r.normal(0, 1, (1, H, W, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    kd = jnp.asarray(r.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    ks = jnp.asarray(
        np.stack([r.uniform(0, 0.5, (1, H, W)),      # occlusion
                  r.uniform(0.1, 1.0, (1, H, W)),    # roughness
                  r.uniform(0, 1.0, (1, H, W))], -1).astype(np.float32))
    view = pos + jnp.asarray([[0.0, 0.0, 5.0]])

    def f(base):
        return jnp.sum(light.environment_shade(base, pos, nrm, kd, ks, view,
                                               num_samples=32))

    val, g = jax.value_and_grad(f)(base)
    assert np.isfinite(float(val))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    # doubling the environment doubles the shaded output (linearity in L)
    out1 = light.environment_shade(base, pos, nrm, kd, ks, view,
                                   num_samples=32)
    out2 = light.environment_shade(base * 2, pos, nrm, kd, ks, view,
                                   num_samples=32)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out1),
                               rtol=1e-4, atol=1e-5)
