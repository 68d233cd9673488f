"""Parity tests for the shading op family.

Mirrors the reference's dual-implementation test pattern
(`renderutils/tests/test_bsdf.py`): every op is checked against the
reference's pure-python spec, loaded directly from the mounted reference tree
(torch-cpu). Skipped if the reference isn't mounted.
"""
import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from animals3d_tpu.ops import shading as sh

_REF = "/root/reference/model/render/renderutils/bsdf.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_bsdf", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


pytestmark = pytest.mark.skipif(not os.path.exists(_REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref():
    return _load_ref()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _t(x):
    import torch
    return torch.tensor(x)


def test_lambert_parity(ref, rng):
    n = rng.normal(size=(64, 3)).astype(np.float32)
    wi = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(sh.lambert(jnp.asarray(n), jnp.asarray(wi)))
    want = ref.bsdf_lambert(_t(n), _t(wi)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fresnel_ndf_lambda_masking_parity(ref, rng):
    c = rng.uniform(-0.2, 1.2, (128, 1)).astype(np.float32)
    c2 = rng.uniform(0.0, 1.0, (128, 1)).astype(np.float32)
    a = rng.uniform(0.01, 1.0, (128, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sh.fresnel_shlick(0.04, 1.0, jnp.asarray(c))),
        ref.bsdf_fresnel_shlick(_t(np.float32(0.04)), _t(np.float32(1.0)), _t(c)).numpy(),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh.ndf_ggx(jnp.asarray(a), jnp.asarray(c))),
        ref.bsdf_ndf_ggx(_t(a), _t(c)).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sh.lambda_ggx(jnp.asarray(a), jnp.asarray(c))),
        # rtol, not just atol: lambda_ggx is unbounded (values of O(10) at
        # grazing angles), so a pure atol comparison flakes at f32 ulp level
        ref.bsdf_lambda_ggx(_t(a), _t(c)).numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sh.masking_smith(jnp.asarray(a), jnp.asarray(c), jnp.asarray(c2))),
        ref.bsdf_masking_smith_ggx_correlated(_t(a), _t(c), _t(c2)).numpy(),
        atol=1e-5)


def test_pbr_bsdf_parity(ref, rng):
    shp = (2, 8, 8, 3)
    kd = rng.uniform(0, 1, shp).astype(np.float32)
    arm = rng.uniform(0, 1, shp).astype(np.float32)
    pos = rng.normal(size=shp).astype(np.float32)
    nrm = rng.normal(size=shp).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    view = rng.normal(size=shp).astype(np.float32) * 3
    light = rng.normal(size=shp).astype(np.float32) * 3
    got = np.asarray(sh.pbr_bsdf(*(jnp.asarray(x) for x in
                                   (kd, arm, pos, nrm, view, light))))
    want = ref.bsdf_pbr(_t(kd), _t(arm), _t(pos), _t(nrm), _t(view), _t(light),
                        0.08, 0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_prepare_shading_normal_parity(ref, rng):
    shp = (2, 8, 8, 3)
    pos = rng.normal(size=shp).astype(np.float32)
    view = rng.normal(size=shp).astype(np.float32) * 3
    smooth = rng.normal(size=shp).astype(np.float32)
    geo = rng.normal(size=shp).astype(np.float32)
    geo /= np.linalg.norm(geo, axis=-1, keepdims=True)
    got = np.asarray(sh.prepare_shading_normal(
        jnp.asarray(pos), jnp.asarray(view), None, jnp.asarray(smooth), None,
        jnp.asarray(geo), two_sided_shading=True))
    # perturbed_nrm=None means identity perturbation (0,0,1) — the wrapper in
    # renderutils/ops.py substitutes that constant before calling the kernel
    ident = np.zeros(shp, np.float32)
    ident[..., 2] = 1.0
    want = ref.bsdf_prepare_shading_normal(
        _t(pos), _t(view), _t(ident), _t(smooth), _t(smooth), _t(geo), True, True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_image_loss_parity(rng):
    spec = importlib.util.spec_from_file_location(
        "ref_loss", "/root/reference/model/render/renderutils/loss.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    img = rng.uniform(0, 4, (2, 16, 16, 3)).astype(np.float32)
    tgt = rng.uniform(0, 4, (2, 16, 16, 3)).astype(np.float32)
    for loss in ("l1", "mse", "smape", "relmse"):
        for tm in ("none", "log_srgb"):
            got = float(sh.image_loss(jnp.asarray(img), jnp.asarray(tgt), loss, tm))
            want = float(mod.image_loss_fn(_t(img), _t(tgt), loss, tm))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
