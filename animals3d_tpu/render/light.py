"""Light models.

The training path uses `DirectionalLight` — an MLP predicting a light
direction confined to the upper hemisphere plus ambient/diffuse intensities
(`/root/reference/model/render/light.py:169-193`). `FixedDirectionLight` is
the visualization-time variant (`visualization/visualize_results.py:59-83`).
EnvironmentLight split-sum shading is provided in functional form for the
pbr path (`light.py:27-157`); its cubemap pipeline is pure jnp (XLA fuses
the mip chain — no custom kernels needed at these resolutions).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from animals3d_tpu.networks.mlp import MLP
from animals3d_tpu.ops import shading


class DirectionalLight(nn.Module):
    """MLP(feat) → (light_dir ∈ upper hemisphere, ambient, diffuse)."""
    mlp_layers: int = 5
    mlp_hidden_size: int = 256
    intensity_min_max: Optional[Sequence] = None   # ((amb_min, amb_max), (diff_min, diff_max))

    @nn.compact
    def __call__(self, feat):
        out = MLP(4, self.mlp_layers, self.mlp_hidden_size,
                  activation="sigmoid", name="mlp")(feat)
        direction = jnp.concatenate([
            out[..., 0:1] * 2 - 1,
            jnp.full_like(out[..., :1], 0.5),
            out[..., 1:2] * 2 - 1,
        ], -1)
        direction = shading.safe_normalize(direction)
        intensity = out[..., 2:]
        if self.intensity_min_max is not None:
            mm = jnp.asarray(self.intensity_min_max, out.dtype)   # (2, 2)
            intensity = intensity * (mm[:, 1] - mm[:, 0]) + mm[:, 0]
        return jnp.concatenate([direction, intensity], -1)        # (B, 5)

    def shade(self, feat, kd, normal):
        """kd, normal: (B, H, W, 3); normal in camera space. Returns
        (shaded, shading)."""
        params = self(feat)
        return directional_shade(params, kd, normal)


def directional_shade(light_params: jax.Array, kd: jax.Array,
                      normal: jax.Array):
    """shaded = (amb + diff·max(l·n, 0)) · kd, given (B, 5) light params."""
    light_dir = light_params[..., None, None, 0:3]
    amb = light_params[..., None, None, 3:4]
    diff = light_params[..., None, None, 4:5]
    shade = amb + diff * jnp.maximum(shading.dot(light_dir, normal), 0.0)
    return shade * kd, shade


def fixed_direction_light(direction: jax.Array, amb: float, diff: float,
                          batch: int) -> jax.Array:
    """Constant light params for relighting at visualization time."""
    d = shading.safe_normalize(direction.reshape(1, 3))
    d = jnp.broadcast_to(d, (batch, 3))
    intens = jnp.broadcast_to(jnp.asarray([[amb, diff]], d.dtype), (batch, 2))
    return jnp.concatenate([d, intens], -1)


# ---------------------------------------------------------------------------
# Environment (split-sum) lighting — pbr path
#
# TPU redesign of the reference's CUDA cubemap pipeline
# (`render/renderutils/c_src/cubemap.cu:110-345`, `render/light.py:74-130`):
#   * diffuse irradiance = the reference's exact brute-force cosine
#     convolution, phrased as ONE matmul over texels (the deepest mip is
#     16² so the weight matrix is (1536, 1536) — MXU food, not a kernel);
#   * GGX specular prefilter = fixed-pattern importance sampling (Karis
#     split-sum) instead of the reference's per-texel bounded-cone brute
#     force — same integral, gather-shaped instead of sparse-loop-shaped;
#   * FG LUT = integrated on host at first use (the reference ships
#     `bsdf_256_256.bin`; zero-egress here, so we integrate the identical
#     Karis sum ourselves) and sampled bilinearly.
# ---------------------------------------------------------------------------

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


def cube_texel_dirs(res: int):
    """Per-texel outward directions, GL face order (+x,-x,+y,-y,+z,-z) —
    numpy, matches `cubemap.cu:32-45` (cube_to_dir)."""
    import numpy as np
    fx = 2.0 * ((np.arange(res) + 0.5) / res) - 1.0
    gx, gy = np.meshgrid(fx, fx, indexing="xy")        # gy indexes rows (y)
    one = np.ones_like(gx)
    faces = [
        np.stack([one, -gy, -gx], -1), np.stack([-one, -gy, gx], -1),
        np.stack([gx, one, gy], -1), np.stack([gx, -one, -gy], -1),
        np.stack([gx, -gy, one], -1), np.stack([-gx, -gy, -one], -1),
    ]
    d = np.stack(faces, 0).astype(np.float32)          # (6, res, res, 3)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def cube_texel_areas(res: int):
    """Per-texel solid angles (`cubemap.cu:17-29` pixel_area), numpy."""
    import numpy as np
    if res == 1:
        return np.ones((1, 1), np.float32)
    h = res // 2
    x = np.abs(np.arange(res) - h)
    da = np.arctan((x + 1) / h) - np.arctan(x / h)
    return (da[None, :] * da[:, None]).astype(np.float32)


def cubemap_mip_chain(base: jax.Array, min_res: int = LIGHT_MIN_RES) -> list[jax.Array]:
    """Build a mip chain by 2x2 average pooling each face
    (spec: `light.py:74-84` / `cubemap_mip`)."""
    mips = [base]
    while mips[-1].shape[1] > min_res:
        m = mips[-1]
        m = m.reshape(6, m.shape[1] // 2, 2, m.shape[2] // 2, 2, 3).mean((2, 4))
        mips.append(m)
    return mips


def diffuse_cubemap(cubemap: jax.Array) -> jax.Array:
    """Cosine-convolved irradiance cubemap — the reference's
    DiffuseCubemapFwdKernel (`cubemap.cu:110-139`) as one matmul:
    out[p] = Σ_t L[t] · clamp(n_p·d_t, 0, 0.999) · ω_t / π."""
    import numpy as np
    res = cubemap.shape[1]
    dirs = cube_texel_dirs(res).reshape(-1, 3)          # (P, 3)
    area = np.broadcast_to(cube_texel_areas(res), (6, res, res)).reshape(-1)
    w = np.clip(dirs @ dirs.T, 0.0, 0.999) * (area[None, :] / np.pi)
    out = jnp.asarray(w) @ cubemap.reshape(-1, 3)
    return out.reshape(6, res, res, 3)


def _hammersley(n: int):
    import numpy as np
    i = np.arange(n, dtype=np.uint32)
    bits = i.copy()
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    return np.stack([i / n, bits / 2**32], -1)          # (n, 2) in [0,1)


def specular_prefilter(cubemap: jax.Array, roughness: float,
                       num_samples: int = 64) -> jax.Array:
    """GGX-prefiltered cubemap (reference SpecularCubemapFwdKernel,
    `cubemap.cu:246-301`, n=v=r assumption), via fixed-pattern GGX
    importance sampling: per texel dir n, L_out = Σ_s L(l_s)·(n·l_s) /
    Σ_s (n·l_s) with l_s the reflected GGX half-vector samples."""
    import numpy as np
    res = cubemap.shape[1]
    if roughness <= 1e-4:
        return cubemap
    alpha = roughness * roughness
    uv = _hammersley(num_samples)
    phi = 2.0 * np.pi * uv[:, 0]
    ct = np.sqrt((1.0 - uv[:, 1]) / (1.0 + (alpha * alpha - 1.0) * uv[:, 1]))
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    h_t = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)  # tangent
    h_t = jnp.asarray(h_t.astype(np.float32))           # (S, 3)

    n = jnp.asarray(cube_texel_dirs(res)).reshape(-1, 3)  # (P, 3)
    # orthonormal basis per texel
    up = jnp.where(jnp.abs(n[:, 2:3]) < 0.9,
                   jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[1.0, 0.0, 0.0]]))
    tx = shading.safe_normalize(jnp.cross(up, n))
    ty = jnp.cross(n, tx)
    h = (h_t[None, :, 0:1] * tx[:, None] + h_t[None, :, 1:2] * ty[:, None]
         + h_t[None, :, 2:3] * n[:, None])              # (P, S, 3)
    l = 2.0 * jnp.sum(n[:, None] * h, -1, keepdims=True) * h - n[:, None]
    w = jnp.maximum(jnp.sum(n[:, None] * l, -1), 0.0)   # (P, S)
    col = sample_cubemap(cubemap, l)                    # (P, S, 3)
    out = jnp.sum(col * w[..., None], 1) / jnp.maximum(
        jnp.sum(w, 1, keepdims=True), 1e-8)
    return out.reshape(6, res, res, 3)


def build_env_mips(base_cubemap: jax.Array, num_samples: int = 64):
    """Reference `EnvironmentLight.build_mips` (`light.py:74-84`): avg-pool
    chain → GGX-prefilter each level at its mapped roughness; cosine-convolve
    the deepest level for diffuse. Returns (specular_mips, diffuse)."""
    chain = cubemap_mip_chain(base_cubemap)
    diffuse = diffuse_cubemap(chain[-1])
    n = len(chain)
    spec = []
    for idx, m in enumerate(chain):
        if idx < n - 1:
            r = (idx / max(n - 2, 1)) * (MAX_ROUGHNESS - MIN_ROUGHNESS) \
                + MIN_ROUGHNESS
        else:
            r = 1.0
        spec.append(specular_prefilter(m, r, num_samples))
    return spec, diffuse


def get_mip(roughness: jax.Array, n_mips: int) -> jax.Array:
    """Roughness → fractional mip level, the reference's two-segment map
    (`light.py:70-73`)."""
    lo = (jnp.clip(roughness, MIN_ROUGHNESS, MAX_ROUGHNESS) - MIN_ROUGHNESS) \
        / (MAX_ROUGHNESS - MIN_ROUGHNESS) * (n_mips - 2)
    hi = (jnp.clip(roughness, MAX_ROUGHNESS, 1.0) - MAX_ROUGHNESS) \
        / (1.0 - MAX_ROUGHNESS) + n_mips - 2
    return jnp.where(roughness < MAX_ROUGHNESS, lo, hi)


import functools as _functools


@_functools.lru_cache(maxsize=2)
def _fg_lut_np(res: int = 64, num_samples: int = 256):
    """Karis split-sum FG LUT over (n·v, roughness) — the integral behind
    the reference's `data/irrmaps/bsdf_256_256.bin` (`light.py:117-120`),
    integrated here on host (zero-egress: the binary isn't downloadable).
    Smith-GGX visibility with the IBL k = α²/2 convention."""
    import numpy as np
    uv = _hammersley(num_samples)
    ndv = np.linspace(1e-2, 1.0, res)[:, None]          # rows: n·v
    rough = np.linspace(1e-2, 1.0, res)[None, :]        # cols: roughness
    A = np.zeros((res, res)); B = np.zeros((res, res))
    v = np.stack([np.sqrt(1 - ndv**2), np.zeros_like(ndv), ndv], -1)  # (res,1,3)
    for u1, u2 in uv:
        a = rough * rough
        phi = 2.0 * np.pi * u1
        ct = np.sqrt((1.0 - u2) / (1.0 + (a * a - 1.0) * u2))        # (1,res)
        st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
        h = np.stack([np.broadcast_to(st * np.cos(phi), ndv.shape[:1] + (res,)),
                      np.broadcast_to(st * np.sin(phi), ndv.shape[:1] + (res,)),
                      np.broadcast_to(ct, ndv.shape[:1] + (res,))], -1)
        vdh = np.sum(v * h, -1)
        l = 2.0 * vdh[..., None] * h - v
        ndl = l[..., 2]
        ndh = h[..., 2]
        mask = ndl > 0
        k = a * a / 2.0
        g = (ndl / (ndl * (1 - k) + k)) * (ndv / (ndv * (1 - k) + k))
        g_vis = np.where(mask, g * np.maximum(vdh, 0.0)
                         / np.maximum(ndh * ndv, 1e-8), 0.0)
        fc = (1.0 - np.clip(vdh, 0.0, 1.0)) ** 5
        A += (1.0 - fc) * g_vis
        B += fc * g_vis
    lut = np.stack([A, B], -1) / num_samples
    # analytic bound: A, B ∈ [0, 1] (split-sum scale/bias of a Fresnel
    # term ≤ 1); finite-sample variance at grazing n·v overshoots it
    return np.clip(lut, 0.0, 1.0).astype(np.float32)


def sample_fg_lut(ndotv: jax.Array, roughness: jax.Array) -> jax.Array:
    """Bilinear FG LUT lookup → (..., 2)."""
    lut = jnp.asarray(_fg_lut_np())
    res = lut.shape[0]
    def bil(coord, size):
        c = jnp.clip(coord, 0.0, 1.0) * (size - 1)
        i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, size - 1)
        i1 = jnp.minimum(i0 + 1, size - 1)
        return i0, i1, c - i0
    r0, r1, rf = bil(ndotv[..., 0], res)
    c0, c1, cf = bil(roughness[..., 0], res)
    out = (lut[r0, c0] * (1 - rf)[..., None] * (1 - cf)[..., None]
           + lut[r1, c0] * rf[..., None] * (1 - cf)[..., None]
           + lut[r0, c1] * (1 - rf)[..., None] * cf[..., None]
           + lut[r1, c1] * rf[..., None] * cf[..., None])
    return out


def _cube_face_st(directions: jax.Array):
    """Face id + in-face (s, t) ∈ [0, 1] per GL cubemap conventions."""
    d = shading.safe_normalize(directions)
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(is_x, jnp.where(d[..., 0] > 0, 0, 1),
                     jnp.where(is_y, jnp.where(d[..., 1] > 0, 2, 3),
                               jnp.where(d[..., 2] > 0, 4, 5)))
    major = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-9)
    s = jnp.where(is_x, jnp.where(d[..., 0] > 0, -d[..., 2], d[..., 2]),
                  jnp.where(is_y, d[..., 0],
                            jnp.where(d[..., 2] > 0, d[..., 0], -d[..., 0])))
    t = jnp.where(is_y, jnp.where(d[..., 1] > 0, d[..., 2], -d[..., 2]),
                  -d[..., 1])
    return face, (s / major + 1) * 0.5, (t / major + 1) * 0.5


def sample_cubemap(cubemap: jax.Array, directions: jax.Array) -> jax.Array:
    """Bilinear (within-face, clamped) cubemap lookup:
    (6, R, R, 3) × (..., 3) → (..., 3). The reference samples through
    nvdiffrast's `boundary_mode='cube'` (seamless); face-clamped bilinear
    differs only on the 1-texel border ring."""
    face, s, t = _cube_face_st(directions)
    res = cubemap.shape[1]
    u = s * res - 0.5
    v = t * res - 0.5
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, res - 1)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, res - 1)
    u1 = jnp.minimum(u0 + 1, res - 1)
    v1 = jnp.minimum(v0 + 1, res - 1)
    uf = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    vf = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    c00 = cubemap[face, v0, u0]
    c01 = cubemap[face, v0, u1]
    c10 = cubemap[face, v1, u0]
    c11 = cubemap[face, v1, u1]
    return ((c00 * (1 - uf) + c01 * uf) * (1 - vf)
            + (c10 * (1 - uf) + c11 * uf) * vf)


def environment_shade(base_cubemap: jax.Array, pos: jax.Array, nrm: jax.Array,
                      kd: jax.Array, ks: jax.Array, view_pos: jax.Array,
                      specular: bool = True, num_samples: int = 64) -> jax.Array:
    """Split-sum environment shading — reference `EnvironmentLight.shade`
    (`light.py:87-130`): cosine-convolved diffuse irradiance, GGX-prefiltered
    specular chain with linear-mipmap-linear lookup, FG LUT reflectance,
    (1−ks.x) hemisphere-visibility modulation."""
    spec_mips, diffuse_env = build_env_mips(base_cubemap, num_samples)
    wo = shading.safe_normalize(view_pos - pos)
    roughness = ks[..., 1:2]
    metallic = ks[..., 2:3]
    if specular:
        spec_col = (1.0 - metallic) * 0.04 + kd * metallic
        diff_col = kd * (1.0 - metallic)
    else:
        diff_col = kd
    out = sample_cubemap(diffuse_env, nrm) * diff_col
    if specular:
        refl = shading.safe_normalize(shading.reflect(wo, nrm))
        n_mips = len(spec_mips)
        level = jnp.clip(get_mip(roughness[..., 0], n_mips), 0, n_mips - 1)
        lo = jnp.clip(jnp.floor(level).astype(jnp.int32), 0, n_mips - 1)
        frac = (level - lo)[..., None]
        # all mips sampled then blended pairwise (n_mips ≤ ~5; each sample
        # is a gather — XLA keeps this fused and static-shaped)
        samples = jnp.stack([sample_cubemap(m, refl) for m in spec_mips], 0)
        oh = jax.nn.one_hot(lo, n_mips, dtype=samples.dtype)       # (..., M)
        oh_hi = jax.nn.one_hot(jnp.minimum(lo + 1, n_mips - 1), n_mips,
                               dtype=samples.dtype)
        mv = jnp.moveaxis(samples, 0, -1)                          # (..., 3, M)
        spec = (mv @ oh[..., None])[..., 0] * (1 - frac) \
            + (mv @ oh_hi[..., None])[..., 0] * frac
        ndotv = jnp.maximum(shading.dot(wo, nrm), 1e-4)
        fg = sample_fg_lut(ndotv, roughness)
        reflectance = spec_col * fg[..., 0:1] + fg[..., 1:2]
        out = out + spec * reflectance
    return out * (1.0 - ks[..., 0:1])
