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
# ---------------------------------------------------------------------------

def cubemap_mip_chain(base: jax.Array, min_res: int = 16) -> list[jax.Array]:
    """Build a mip chain by 2x2 average pooling each face
    (spec: `light.py:74-84` / `cubemap_mip`)."""
    mips = [base]
    while mips[-1].shape[1] > min_res:
        m = mips[-1]
        m = m.reshape(6, m.shape[1] // 2, 2, m.shape[2] // 2, 2, 3).mean((2, 4))
        mips.append(m)
    return mips


def sample_cubemap(cubemap: jax.Array, directions: jax.Array) -> jax.Array:
    """Nearest-texel cubemap lookup: (6, R, R, 3) × (..., 3) → (..., 3)."""
    d = shading.safe_normalize(directions)
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    # face ids follow GL order: +x, -x, +y, -y, +z, -z
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(is_x, jnp.where(d[..., 0] > 0, 0, 1),
                     jnp.where(is_y, jnp.where(d[..., 1] > 0, 2, 3),
                               jnp.where(d[..., 2] > 0, 4, 5)))
    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-9)
    # (s, t) per GL cubemap conventions
    s = jnp.where(is_x, jnp.where(d[..., 0] > 0, -d[..., 2], d[..., 2]),
                  jnp.where(is_y, d[..., 0],
                            jnp.where(d[..., 2] > 0, d[..., 0], -d[..., 0])))
    t = jnp.where(is_y, jnp.where(d[..., 1] > 0, d[..., 2], -d[..., 2]),
                  -d[..., 1])
    res = cubemap.shape[1]
    u = jnp.clip(((s / major + 1) * 0.5 * res).astype(jnp.int32), 0, res - 1)
    v = jnp.clip(((t / major + 1) * 0.5 * res).astype(jnp.int32), 0, res - 1)
    return cubemap[face, v, u]


def environment_shade(base_cubemap: jax.Array, pos: jax.Array, nrm: jax.Array,
                      kd: jax.Array, ks: jax.Array, view_pos: jax.Array,
                      specular: bool = True) -> jax.Array:
    """Split-sum-style environment shading (diffuse irradiance from a deep
    mip; specular from a roughness-selected mip). Functional analogue of
    `EnvironmentLight.shade` (`light.py:87-157`)."""
    mips = cubemap_mip_chain(base_cubemap)
    diffuse_env = mips[-1]
    diff = sample_cubemap(diffuse_env, nrm)
    out = kd * diff
    if specular:
        wo = shading.safe_normalize(view_pos - pos)
        refl = shading.reflect(wo, nrm)
        roughness = ks[..., 1:2]
        n_mips = len(mips)
        level = jnp.clip(roughness[..., 0] * (n_mips - 1), 0, n_mips - 1)
        lo = jnp.floor(level).astype(jnp.int32)
        spec_lo = jnp.stack([sample_cubemap(m, refl) for m in mips], 0)
        idx = jnp.clip(lo, 0, n_mips - 1)
        spec = jnp.take_along_axis(
            spec_lo, idx[None, ..., None].repeat(3, -1), axis=0)[0]
        f = shading.fresnel_shlick(0.04 * (1 - ks[..., 2:3]) + kd * ks[..., 2:3],
                                   1.0, shading.dot(wo, nrm))
        out = out + spec * f
    return out
