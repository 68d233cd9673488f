"""2-D textures with mip chains and bilinear/trilinear sampling.

Reference: `Texture2D` (`/root/reference/model/render/texture.py:65-186`,
mipmapped `dr.texture` sampling). Used for obj/mtl-loaded materials and
export paths — the training material is the texture MLP. Pure jnp: mips are
2×2 average pools; sampling is bilinear with a level-of-detail blend.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_mips(tex: jax.Array, min_res: int = 1) -> list[jax.Array]:
    """(H, W, C) → list of mips down to min_res (2x2 average pooling)."""
    mips = [tex]
    while min(mips[-1].shape[:2]) > min_res:
        t = mips[-1]
        h, w, c = t.shape
        t = t[: h - h % 2, : w - w % 2]
        mips.append(t.reshape(h // 2, 2, w // 2, 2, c).mean((1, 3)))
    return mips


def sample_bilinear(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """tex (H, W, C), uv (..., 2) in [0,1] → (..., C); clamped edges."""
    H, W, C = tex.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def at(ix, iy):
        ix = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        return tex[iy, ix]

    return (at(x0, y0) * ((1 - tx) * (1 - ty))[..., None]
            + at(x0 + 1, y0) * (tx * (1 - ty))[..., None]
            + at(x0, y0 + 1) * ((1 - tx) * ty)[..., None]
            + at(x0 + 1, y0 + 1) * (tx * ty)[..., None])


def sample_texture(tex: jax.Array, uv: jax.Array, lod=None) -> jax.Array:
    """Mipmapped sampling: `lod` (scalar or per-sample) blends adjacent mips;
    None = base level only."""
    if lod is None:
        return sample_bilinear(tex, uv)
    mips = build_mips(tex)
    n = len(mips)
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0, n - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = lod - lo
    samples = jnp.stack([sample_bilinear(m if m.shape == mips[0].shape else
                                         jax.image.resize(m, mips[0].shape,
                                                          "nearest"), uv)
                         for m in mips], 0)
    a = samples[jnp.clip(lo, 0, n - 1)]
    b = samples[jnp.clip(lo + 1, 0, n - 1)]
    return a + (b - a) * frac


def checkerboard(res: tuple[int, int], checker_size: int = 8) -> np.ndarray:
    """(H, W, 3) checkerboard (reference `util.checkerboard`)."""
    H, W = res
    ys = (np.arange(H) // checker_size)[:, None]
    xs = (np.arange(W) // checker_size)[None, :]
    c = ((ys + xs) % 2).astype(np.float32) * 0.5 + 0.25
    return np.repeat(c[:, :, None], 3, 2)


def latlong_to_cubemap(latlong: jax.Array, res: int) -> jax.Array:
    """(H, W, 3) equirect → (6, res, res, 3) GL-order cubemap
    (reference `util.latlong_to_cubemap`)."""
    faces = []
    g = (jnp.arange(res) + 0.5) / res * 2 - 1
    a, b = jnp.meshgrid(g, g)
    one = jnp.ones_like(a)
    dirs = [
        jnp.stack([one, -b, -a], -1), jnp.stack([-one, -b, a], -1),
        jnp.stack([a, one, b], -1), jnp.stack([a, -one, -b], -1),
        jnp.stack([a, -b, one], -1), jnp.stack([-a, -b, -one], -1),
    ]
    for d in dirs:
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        theta = jnp.arccos(jnp.clip(d[..., 1], -1, 1))       # [0, pi]
        phi = jnp.arctan2(d[..., 0], -d[..., 2])             # [-pi, pi]
        uv = jnp.stack([(phi / (2 * jnp.pi)) % 1.0, theta / jnp.pi], -1)
        faces.append(sample_bilinear(latlong, uv))
    return jnp.stack(faces)


def cubemap_to_latlong(cubemap: jax.Array, res: tuple[int, int]) -> jax.Array:
    """(6, R, R, 3) → (H, W, 3) equirect (reference `util.cubemap_to_latlong`)."""
    from animals3d_tpu.render.light import sample_cubemap
    H, W = res
    theta = (jnp.arange(H) + 0.5) / H * jnp.pi
    # u = phi / 2π with phi = atan2(x, −z): keep the same zero so the
    # round trip with latlong_to_cubemap is offset-free
    phi = (jnp.arange(W) + 0.5) / W * 2 * jnp.pi
    t, p = jnp.meshgrid(theta, phi, indexing="ij")
    d = jnp.stack([jnp.sin(t) * jnp.sin(p), jnp.cos(t),
                   -jnp.sin(t) * jnp.cos(p)], -1)
    return sample_cubemap(cubemap, d)
