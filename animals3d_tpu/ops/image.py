"""Image sampling/resizing ops used across the pipeline."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(feat: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling with torch `F.grid_sample(..., align_corners=False,
    padding_mode='zeros')` semantics.

    feat: (B, C, H, W); coords: (B, ..., 2) in [-1, 1] (x, y order).
    Returns (B, ..., C).
    """
    B, C, H, W = feat.shape
    lead = coords.shape[1:-1]
    xy = coords.reshape(B, -1, 2)
    # align_corners=False: -1 → -0.5, +1 → size-0.5 (pixel centers at i+0.5)
    x = (xy[..., 0] + 1.0) * (W / 2.0) - 0.5
    y = (xy[..., 1] + 1.0) * (H / 2.0) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def gather(ix, iy):
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        # (B, N, C) gather
        v = jax.vmap(lambda f, yy, xx: f[:, yy, xx].T)(feat, iyc, ixc)
        return jnp.where(inb[..., None], v, 0.0)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    out = (v00 * ((1 - tx) * (1 - ty))[..., None]
           + v01 * (tx * (1 - ty))[..., None]
           + v10 * ((1 - tx) * ty)[..., None]
           + v11 * (tx * ty)[..., None])
    return out.reshape(B, *lead, C)


def resize_nchw(x: jax.Array, size: tuple[int, int],
                method: str = "bilinear") -> jax.Array:
    """Resize (B, C, H, W) → (B, C, h, w)."""
    B, C = x.shape[:2]
    return jax.image.resize(x, (B, C, *size), method=method)
