"""Mesh smoothness regularizers.

Reference: `/root/reference/model/render/regularizer.py` (90 LoC — uniform
Laplacian smoothing and normal-consistency terms; available API, unused in
the training path). Capacity-aware: invalid vertices/faces contribute zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from animals3d_tpu.geometry.mesh import Mesh, face_normals


def laplace_regularizer_const(mesh: Mesh) -> jax.Array:
    """Mean squared uniform-Laplacian magnitude: ||Σ_j (v_j − v_i)||² / deg²
    per vertex, averaged over valid vertices."""
    v = mesh.v_pos                                    # (B, V, 3)
    f = mesh.t_pos_idx                                # (F, 3)
    V = v.shape[1]
    w = mesh.f_valid.astype(v.dtype)

    def accum(vb):
        acc = jnp.zeros((V, 3), v.dtype)
        deg = jnp.zeros((V,), v.dtype)
        for a, b in ((0, 1), (1, 2), (2, 0)):
            va, vb_ = f[:, a], f[:, b]
            d = (vb[vb_] - vb[va]) * w[:, None]
            acc = acc.at[va].add(d)
            acc = acc.at[vb_].add(-d)
            deg = deg.at[va].add(w)
            deg = deg.at[vb_].add(w)
        return acc, deg

    acc, deg = jax.vmap(accum)(v)
    lap = acc / jnp.maximum(deg, 1.0)[..., None]
    sq = jnp.sum(lap * lap, -1)
    valid = mesh.v_valid[None].astype(v.dtype)
    return jnp.sum(sq * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def normal_consistency(mesh: Mesh) -> jax.Array:
    """1 − cos between vertex-adjacent face normals, approximated through
    shared-vertex pairs along each face's edges (matches the prior-normal
    regularizer family in `AnimalModel.compute_regularizers:317-328`)."""
    f = mesh.t_pos_idx
    n = mesh.v_nrm                                    # (B, V, 3)
    adj = jnp.concatenate([f[:, 0:2], f[:, 1:3], f[:, ::2]], 0)  # (3F, 2)
    w = jnp.concatenate([mesh.f_valid] * 3).astype(n.dtype)

    def one(nb):
        pair = nb[adj]                                # (3F, 2, 3)
        d = 1.0 - jnp.sum(pair[:, 0] * pair[:, 1], -1)
        return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)

    return jnp.mean(jax.vmap(one)(n))
