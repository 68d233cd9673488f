"""Shading math: normal preparation, BSDFs, sRGB, fused image losses.

TPU-native replacement for the renderutils CUDA kernel family
(`/root/reference/model/render/renderutils/c_src/*.cu`, python specs in
`renderutils/bsdf.py` / `loss.py`). On TPU these are bandwidth-bound
elementwise chains that XLA fuses into neighbors automatically, so they are
expressed as plain jnp; autodiff supplies the VJPs the CUDA versions
hand-coded. Parity is enforced against the reference formulas by
`tests/test_shading.py` (mirroring `renderutils/tests/test_bsdf.py`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_SPEC_EPS = 1e-4
_NORMAL_THRESHOLD = 0.1


def dot(a, b):
    return jnp.sum(a * b, -1, keepdims=True)


def reflect(x, n):
    return 2 * dot(x, n) * n - x


def safe_normalize(x, eps=1e-20):
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))


def prepare_shading_normal(pos, view_pos, perturbed_nrm, smooth_nrm,
                           smooth_tng, geom_nrm, two_sided_shading=True,
                           opengl=True):
    """Bent shading normal (`bsdf.py:28-55`). With `perturbed_nrm=None` (the
    training path, `render.py:71`) this is: flip for backfacing surfaces, then
    blend geometric→smooth normal by how much the smooth normal faces the
    viewer (threshold 0.1)."""
    smooth_nrm = safe_normalize(smooth_nrm)
    view_vec = safe_normalize(view_pos - pos)
    if perturbed_nrm is not None:
        smooth_tng = safe_normalize(smooth_tng)
        bitng = safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
        sgn = -1.0 if opengl else 1.0
        smooth_nrm = safe_normalize(
            smooth_tng * perturbed_nrm[..., 0:1]
            + sgn * bitng * perturbed_nrm[..., 1:2]
            + smooth_nrm * jnp.maximum(perturbed_nrm[..., 2:3], 0.0))
    if two_sided_shading:
        front = dot(geom_nrm, view_vec) > 0
        smooth_nrm = jnp.where(front, smooth_nrm, -smooth_nrm)
        geom_nrm = jnp.where(front, geom_nrm, -geom_nrm)
    t = jnp.clip(dot(view_vec, smooth_nrm) / _NORMAL_THRESHOLD, 0.0, 1.0)
    return geom_nrm + t * (smooth_nrm - geom_nrm)


# ---------------------------------------------------------------------------
# BSDFs (specs: renderutils/bsdf.py:57-160)
# ---------------------------------------------------------------------------

def lambert(nrm, wi):
    return jnp.maximum(dot(nrm, wi), 0.0) / math.pi


def fresnel_shlick(f0, f90, cos_theta):
    c = jnp.clip(cos_theta, _SPEC_EPS, 1.0 - _SPEC_EPS)
    return f0 + (f90 - f0) * (1.0 - c) ** 5.0


def frostbite_diffuse(nrm, wi, wo, linear_roughness):
    wi_n = dot(wi, nrm)
    wo_n = dot(wo, nrm)
    h = safe_normalize(wo + wi)
    wi_h = dot(wi, h)
    f90 = 0.5 * linear_roughness + 2.0 * wi_h * wi_h * linear_roughness
    energy = 1.0 - (0.51 / 1.51) * linear_roughness
    res = fresnel_shlick(1.0, f90, wi_n) * fresnel_shlick(1.0, f90, wo_n) * energy
    return jnp.where((wi_n > 0.0) & (wo_n > 0.0), res, 0.0)


def ndf_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, _SPEC_EPS, 1.0 - _SPEC_EPS)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * math.pi)


def lambda_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, _SPEC_EPS, 1.0 - _SPEC_EPS)
    tan_sqr = (1.0 - c * c) / (c * c)
    return 0.5 * (jnp.sqrt(1.0 + alpha_sqr * tan_sqr) - 1.0)


def masking_smith(alpha_sqr, cos_theta_i, cos_theta_o):
    return 1.0 / (1.0 + lambda_ggx(alpha_sqr, cos_theta_i)
                  + lambda_ggx(alpha_sqr, cos_theta_o))


def pbr_specular(col, nrm, wo, wi, alpha, min_roughness=0.08):
    a = jnp.clip(alpha, min_roughness * min_roughness, 1.0)
    a2 = a * a
    h = safe_normalize(wo + wi)
    wo_n, wi_n = dot(wo, nrm), dot(wi, nrm)
    w = (fresnel_shlick(col, 1.0, dot(wo, h)) * ndf_ggx(a2, dot(nrm, h))
         * masking_smith(a2, wo_n, wi_n) * 0.25
         / jnp.maximum(wo_n, _SPEC_EPS))
    return jnp.where((wo_n > _SPEC_EPS) & (wi_n > _SPEC_EPS), w, 0.0)


def pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos, min_roughness=0.08,
             bsdf="lambert"):
    wo = safe_normalize(view_pos - pos)
    wi = safe_normalize(light_pos - pos)
    spec_str, roughness, metallic = arm[..., 0:1], arm[..., 1:2], arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1.0 - spec_str)
    kd_eff = kd * (1.0 - metallic)
    if bsdf == "lambert":
        diffuse = kd_eff * lambert(nrm, wi)
    else:
        diffuse = kd_eff * frostbite_diffuse(nrm, wi, wo, roughness)
    return diffuse + pbr_specular(ks, nrm, wo, wi, roughness * roughness,
                                  min_roughness=min_roughness)


# ---------------------------------------------------------------------------
# sRGB conversions (specs: render/util.py sRGB helpers)
# ---------------------------------------------------------------------------

def rgb_to_srgb(f):
    return jnp.where(f > 0.0031308,
                     jnp.power(jnp.clip(f, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
                     12.92 * f)


def srgb_to_rgb(f):
    return jnp.where(f > 0.04045,
                     jnp.power((jnp.clip(f, 0.04045, None) + 0.055) / 1.055, 2.4),
                     f / 12.92)


# ---------------------------------------------------------------------------
# Fused HDR image losses (specs: renderutils/loss.py)
# ---------------------------------------------------------------------------

def image_loss(img, target, loss="l1", tonemapper="none"):
    if tonemapper == "log_srgb":
        img = rgb_to_srgb(jnp.log(jnp.clip(img, 0.0, 65535.0) + 1.0))
        target = rgb_to_srgb(jnp.log(jnp.clip(target, 0.0, 65535.0) + 1.0))
    diff = img - target
    if loss == "mse":
        return jnp.mean(diff * diff)
    if loss == "smape":
        return jnp.mean(jnp.abs(diff) / (jnp.abs(img) + jnp.abs(target) + 0.01))
    if loss == "relmse":
        return jnp.mean(diff * diff / (img * img + target * target + 0.1))
    return jnp.mean(jnp.abs(diff))


def mse_to_psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
