"""Camera math: GL-style projection and clip transforms.

Reference: `util.perspective` (`/root/reference/model/render/util.py:189-194`,
note the baked-in y flip) and `ru.xfm_points` (`renderutils/ops.py:525`,
called with use_python=True at `render.py:278` — a plain matmul).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def perspective(fovy: float = 0.7854, aspect: float = 1.0, n: float = 0.1,
                f: float = 1000.0) -> np.ndarray:
    """GL projection with flipped y (reference convention)."""
    y = np.tan(fovy / 2)
    return np.array([
        [1 / (y * aspect), 0, 0, 0],
        [0, -1 / y, 0, 0],
        [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
        [0, 0, -1, 0],
    ], np.float32)


def xfm_points(points: jax.Array, mtx: jax.Array) -> jax.Array:
    """Transform (B, V, 3) points by (B, 4, 4) matrices → (B, V, 4)."""
    hom = jnp.concatenate([points, jnp.ones_like(points[..., :1])], -1)
    return jnp.einsum("bij,bvj->bvi", mtx, hom)


def xfm_vectors(vectors: jax.Array, mtx: jax.Array) -> jax.Array:
    """Transform (B, V, 3) direction vectors (w=0) → (B, V, 3)."""
    return jnp.einsum("bij,bvj->bvi", mtx[:, :3, :3], vectors)
