"""Batched triangle mesh pytree with capacity-bounded validity masks.

Reference: the `Mesh` class + `make_mesh`/`auto_normals`/`compute_tangents`
(`/root/reference/model/render/mesh.py:21-375`). Differences by design:

  * vertices are batched (B, V, 3) with *shared* connectivity (F, 3), exactly
    like the reference (`make_mesh` asserts faces batch == 1,
    `mesh.py:369-371`), but V and F here are static capacities with validity
    masks (`v_valid`, `f_valid`) coming from the static-shape marching tets;
  * invalid faces are (0,0,0)-degenerate and contribute nothing to normals or
    rasterization;
  * tangents are opt-in (`compute_tangents` + `Mesh.v_tng`): the training
    path hard-sets `perturbed_nrm = None` (`render.py:71`), so tangent
    frames are never consumed there; they exist for the `tangent` render
    buffer and any future normal-map perturbation.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def safe_normalize(x: jax.Array, eps: float = 1e-20) -> jax.Array:
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mesh:
    v_pos: jax.Array                 # (B, V, 3)
    t_pos_idx: jax.Array             # (F, 3) int32, shared across batch
    v_valid: jax.Array               # (V,) bool
    f_valid: jax.Array               # (F,) bool
    num_verts: jax.Array             # () int32
    num_faces: jax.Array             # () int32
    v_nrm: Optional[jax.Array] = None        # (B, V, 3)
    v_tex: Optional[jax.Array] = None        # (B, V, 3) canonical-space pos
    face_gidx: Optional[jax.Array] = None    # (F,) int32 static global face id
    v_tng: Optional[jax.Array] = None        # (B, V, 3) mikktspace tangents

    @property
    def batch_size(self) -> int:
        return self.v_pos.shape[0]

    def deform(self, deformation: jax.Array) -> "Mesh":
        """Apply a per-vertex offset (B, V, 3); masked to valid vertices."""
        offs = jnp.where(self.v_valid[None, :, None], deformation, 0.0)
        return dataclasses.replace(self, v_pos=self.v_pos + offs)

    def with_positions(self, v_pos: jax.Array) -> "Mesh":
        return dataclasses.replace(self, v_pos=v_pos)

    def _map_batched(self, fn) -> "Mesh":
        app = lambda a: (fn(a) if a is not None and a.ndim == 3 else a)
        return dataclasses.replace(
            self, v_pos=app(self.v_pos), v_nrm=app(self.v_nrm),
            v_tex=app(self.v_tex), v_tng=app(self.v_tng))

    def extend(self, n: int) -> "Mesh":
        """Repeat batch entries n times (B → B*n), like mesh.extend."""
        return self._map_batched(lambda a: jnp.repeat(a, n, axis=0))

    def first_n(self, n: int) -> "Mesh":
        return self._map_batched(lambda a: a[:n])

    def get_n(self, i: int) -> "Mesh":
        return self._map_batched(lambda a: a[i:i + 1])


def face_normals(v_pos: jax.Array, t_pos_idx: jax.Array, f_valid: jax.Array,
                 normalize: bool = True) -> jax.Array:
    """(B, F, 3) face normals; zero for invalid faces."""
    v0 = v_pos[:, t_pos_idx[:, 0]]
    v1 = v_pos[:, t_pos_idx[:, 1]]
    v2 = v_pos[:, t_pos_idx[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    if normalize:
        fn = safe_normalize(fn)
    return jnp.where(f_valid[None, :, None], fn, 0.0)


def auto_normals(v_pos: jax.Array, t_pos_idx: jax.Array, v_valid: jax.Array,
                 f_valid: jax.Array) -> jax.Array:
    """Area-weighted smooth vertex normals (reference `auto_normals`,
    `mesh.py:276-304`): splat unnormalized face normals to vertices, then
    normalize with a [0,0,1] fallback for degenerate/invalid vertices.

    TPU gather/scatter cost is per indexed row, independent of row width,
    and the topology is shared across the batch — so both the face-corner
    gather and the splat scatter-add run on (V, B*3) batch-in-row tables:
    F rows per corner instead of B*F (traced at 61 ms/iter the naive way).
    """
    B, V, _ = v_pos.shape
    F = t_pos_idx.shape[0]
    tab = v_pos.transpose(1, 0, 2).reshape(V, B * 3)
    c0 = tab[t_pos_idx[:, 0]].reshape(F, B, 3)       # (F, B, 3)
    c1 = tab[t_pos_idx[:, 1]].reshape(F, B, 3)
    c2 = tab[t_pos_idx[:, 2]].reshape(F, B, 3)
    fn = jnp.cross(c1 - c0, c2 - c0)                 # (F, B, 3)
    fn = jnp.where(f_valid[:, None, None], fn, 0.0).reshape(F, B * 3)
    acc = jnp.zeros((V, B * 3), v_pos.dtype)
    for k in range(3):
        acc = acc.at[t_pos_idx[:, k]].add(fn)
    v_nrm = acc.reshape(V, B, 3).transpose(1, 0, 2)  # (B, V, 3)
    dot = jnp.sum(v_nrm * v_nrm, -1, keepdims=True)
    fallback = jnp.asarray([0.0, 0.0, 1.0], v_pos.dtype)
    v_nrm = jnp.where(dot > 1e-20, v_nrm, fallback)
    return safe_normalize(v_nrm)


def compute_tangents(v_pos: jax.Array, t_pos_idx: jax.Array,
                     face_uvs: jax.Array, v_nrm: jax.Array,
                     v_valid: jax.Array, f_valid: jax.Array) -> jax.Array:
    """Per-vertex mikktspace tangents (reference `compute_tangents`,
    `mesh.py:310-350`): per-face tangent from the UV edge system, averaged
    over incident faces, then Gram-Schmidt-orthogonalized against `v_nrm`.

    `face_uvs` is (F, 3, 2) per-face-corner UVs — the layout our per-tet
    atlas produces (`render/export.py:face_cell_uvs` / reference `map_uv`,
    `dmtet.py:69-98`); the reference's separate `t_tex_idx` indirection
    collapses to this since atlas corners are never shared across faces.
    Batch-in-row tables as in `auto_normals` (scatter cost is per row)."""
    B, V, _ = v_pos.shape
    F = t_pos_idx.shape[0]
    tab = v_pos.transpose(1, 0, 2).reshape(V, B * 3)
    c0 = tab[t_pos_idx[:, 0]].reshape(F, B, 3)
    c1 = tab[t_pos_idx[:, 1]].reshape(F, B, 3)
    c2 = tab[t_pos_idx[:, 2]].reshape(F, B, 3)
    uve1 = face_uvs[:, 1] - face_uvs[:, 0]            # (F, 2)
    uve2 = face_uvs[:, 2] - face_uvs[:, 0]
    nom = ((c1 - c0) * uve2[:, None, 1:2]
           - (c2 - c0) * uve1[:, None, 1:2])          # (F, B, 3)
    denom = (uve1[:, 0] * uve2[:, 1]
             - uve1[:, 1] * uve2[:, 0])[:, None, None]
    denom = jnp.where(denom > 0, jnp.maximum(denom, 1e-6),
                      jnp.minimum(denom, -1e-6))
    tang = jnp.where(f_valid[:, None, None], nom / denom, 0.0) \
        .reshape(F, B * 3)
    acc = jnp.zeros((V, B * 3), v_pos.dtype)
    cnt = jnp.zeros((V, 1), v_pos.dtype)
    ones = f_valid.astype(v_pos.dtype)[:, None]
    for k in range(3):
        acc = acc.at[t_pos_idx[:, k]].add(tang)
        cnt = cnt.at[t_pos_idx[:, k]].add(ones)
    t = (acc / jnp.maximum(cnt, 1.0)).reshape(V, B, 3).transpose(1, 0, 2)
    t = safe_normalize(t)
    t = t - jnp.sum(t * v_nrm, -1, keepdims=True) * v_nrm
    # degenerate/invalid verts get a constant frame (normalize of ~0 would
    # blow up); [1,0,0] matches the buffer-parity convention
    good = jnp.sum(t * t, -1, keepdims=True) > 1e-12
    fallback = jnp.asarray([1.0, 0.0, 0.0], v_pos.dtype)
    t = jnp.where(good & v_valid[None, :, None], safe_normalize(t), fallback)
    return t


def make_mesh(v_pos: jax.Array, t_pos_idx: jax.Array, v_valid: jax.Array,
              f_valid: jax.Array, num_verts: jax.Array, num_faces: jax.Array,
              v_tex: Optional[jax.Array] = None,
              face_gidx: Optional[jax.Array] = None) -> Mesh:
    """Build a Mesh and compute smooth normals (reference `make_mesh`,
    `mesh.py:355-375`, minus tangents — see module docstring)."""
    v_nrm = auto_normals(v_pos, t_pos_idx, v_valid, f_valid)
    return Mesh(v_pos=v_pos, t_pos_idx=t_pos_idx, v_valid=v_valid,
                f_valid=f_valid, num_verts=num_verts, num_faces=num_faces,
                v_nrm=v_nrm, v_tex=v_tex if v_tex is not None else v_pos,
                face_gidx=face_gidx)
