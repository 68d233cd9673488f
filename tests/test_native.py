"""Native C++ preprocessing: parity vs the python/cv2 reference paths."""
import numpy as np
import pytest

from animals3d_tpu import native
from animals3d_tpu.data import util as dutil


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_distance_transform_matches_cv2(lib):
    import cv2
    rng = np.random.default_rng(0)
    mask = (rng.uniform(0, 1, (64, 64)) > 0.7).astype(np.float32)
    mask[20:40, 10:30] = 1.0
    got = native.mask_distance_transform(mask)
    m = (mask > 0.5).astype(np.uint8)
    want_dt = cv2.distanceTransform(m, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    want_inv = cv2.distanceTransform(1 - m, cv2.DIST_L2,
                                     cv2.DIST_MASK_PRECISE)
    np.testing.assert_allclose(got[0], want_dt, atol=1e-3)
    np.testing.assert_allclose(got[1], want_inv, atol=1e-3)


def test_packed_feat_decode_matches_python(lib):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 6 * 32, 3)).astype(np.uint8)
    got = native.decode_packed_feat(img, 16)
    want = dutil.decode_feat_from_img(img, 16)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_bilinear_matches_jax(lib):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    arr = rng.uniform(0, 1, (3, 17, 23)).astype(np.float32)
    got = native.resize_bilinear(arr, 32, 40)
    want = np.asarray(jax.image.resize(jnp.asarray(arr), (3, 32, 40),
                                       "bilinear"))
    np.testing.assert_allclose(got, want, atol=1e-4)
