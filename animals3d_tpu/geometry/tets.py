"""Tetrahedral grids for DMTet, with host-side static precomputation.

The reference loads Quartet-generated grids from `data/tets/{res}_tets.npz`
(`/root/reference/model/geometry/dmtet.py:214-226`, files fetched by
`data/tets/download_tets.sh`). Those artifacts aren't vendored, so this module
(a) loads an `{res}_tets.npz` if present (same keys: `vertices` in
(-0.5, 0.5)^3 and `indices`), and (b) otherwise *generates* a Kuhn
(6-tets-per-cube) lattice of the unit cube procedurally.

TPU-first design: marching tetrahedra on TPU needs static shapes, so all the
dynamic-shape work the reference does per step with `torch.unique`
(`dmtet.py:112-123`) is hoisted here into one-time host-side numpy
precomputation over the *full* grid:

  * ``edges``         (E, 2) int32 — lexicographically sorted unique edges of
                       the whole tet mesh (matches the ordering torch.unique
                       produces on the crossing subset, which is what makes
                       vertex ordering reproducible);
  * ``tet_edge_ids``  (T, 6) int32 — per-tet edge ids in base-edge order
                       [01, 02, 03, 12, 13, 23].

The per-step kernel (`animals3d_tpu.ops.dmtet`) is then pure gather/scatter
with capacity-bounded compaction.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

_BASE_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# The six Kuhn tetrahedra of a unit cube, as corner bit-triples (x, y, z).
# All share the main diagonal 000-111; every axis permutation gives one tet.
_KUHN_PERMS = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]


@dataclasses.dataclass(frozen=True)
class TetGrid:
    """Static tet-grid data (numpy, host-resident)."""
    verts: np.ndarray          # (N, 3) float32, in (-0.5, 0.5)^3 (unscaled)
    tets: np.ndarray           # (T, 4) int32
    edges: np.ndarray          # (E, 2) int32, unique, sorted pairs, lex order
    tet_edge_ids: np.ndarray   # (T, 6) int32 → rows of `edges`
    res: int

    @property
    def num_verts(self) -> int:
        return self.verts.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edges.shape[0]

    @property
    def num_tets(self) -> int:
        return self.tets.shape[0]


def kuhn_lattice(res: int) -> tuple[np.ndarray, np.ndarray]:
    """Subdivide [−0.5, 0.5]^3 into res^3 cubes × 6 Kuhn tets each."""
    n = res + 1
    axes = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    grid = np.stack(np.meshgrid(axes, axes, axes, indexing="ij"), -1)
    verts = grid.reshape(-1, 3)

    def vid(i, j, k):
        return (i * n + j) * n + k

    i, j, k = np.meshgrid(np.arange(res), np.arange(res), np.arange(res), indexing="ij")
    base = np.stack([i.ravel(), j.ravel(), k.ravel()], -1).astype(np.int64)  # (C, 3)

    tet_list = []
    unit = np.eye(3, dtype=np.int64)
    for perm in _KUHN_PERMS:
        c0 = base
        c1 = base + unit[perm[0]]
        c2 = base + unit[perm[0]] + unit[perm[1]]
        c3 = base + 1
        tet = np.stack([vid(*c.T) for c in (c0, c1, c2, c3)], -1)
        tet_list.append(tet)
    # (6, C, 4) → (C, 6, 4): order tets by cell then local index so the
    # layout is cache-friendly for neighboring cells
    tets = np.stack(tet_list, 0).transpose(1, 0, 2).reshape(-1, 4).astype(np.int32)
    return verts, np.ascontiguousarray(tets)


def _unique_edges(tets: np.ndarray, num_verts: int) -> tuple[np.ndarray, np.ndarray]:
    """All unique sorted edges + per-tet edge-id map, via int64 key dedup."""
    e = tets[:, _BASE_EDGES]                       # (T, 6, 2)
    e = np.sort(e, axis=-1).reshape(-1, 2).astype(np.int64)
    key = e[:, 0] * num_verts + e[:, 1]
    uniq, inv = np.unique(key, return_inverse=True)
    edges = np.stack([uniq // num_verts, uniq % num_verts], -1).astype(np.int32)
    tet_edge_ids = inv.reshape(-1, 6).astype(np.int32)
    return edges, tet_edge_ids


@functools.lru_cache(maxsize=4)
def load_tet_grid(res: int, data_dir: str = "data/tets") -> TetGrid:
    """Load `{res}_tets.npz` if present, else generate a Kuhn lattice.

    Precomputed edge structures are cached to `<data_dir>/{res}_tets_edges.npz`
    so large grids pay the numpy unique cost once per machine.
    """
    npz_path = os.path.join(data_dir, f"{res}_tets.npz")
    if os.path.exists(npz_path):
        data = np.load(npz_path)
        verts = np.asarray(data["vertices"], np.float32)
        tets = np.asarray(data["indices"], np.int32)
    else:
        verts, tets = kuhn_lattice(res)

    cache_path = os.path.join(data_dir, f"{res}_tets_edges.npz")
    if os.path.exists(cache_path):
        cache = np.load(cache_path)
        edges, tet_edge_ids = cache["edges"], cache["tet_edge_ids"]
    else:
        edges, tet_edge_ids = _unique_edges(tets, verts.shape[0])
        try:
            os.makedirs(data_dir, exist_ok=True)
            np.savez_compressed(cache_path, edges=edges, tet_edge_ids=tet_edge_ids)
        except OSError:
            pass  # read-only data dir: recompute next time
    return TetGrid(verts=verts, tets=tets, edges=edges,
                   tet_edge_ids=tet_edge_ids, res=res)


class DeviceTetGrid:
    """Device-resident copy of a TetGrid, passed into jitted steps as a
    pytree (no per-step host→device upload)."""

    def __init__(self, grid: TetGrid):
        import jax.numpy as jnp
        self.verts = jnp.asarray(grid.verts)
        self.tets = jnp.asarray(grid.tets)
        self.edges = jnp.asarray(grid.edges)
        self.tet_edge_ids = jnp.asarray(grid.tet_edge_ids)
        self.res = grid.res

    def tree_flatten(self):
        return (self.verts, self.tets, self.edges, self.tet_edge_ids), self.res

    @classmethod
    def tree_unflatten(cls, res, children):
        obj = cls.__new__(cls)
        obj.verts, obj.tets, obj.edges, obj.tet_edge_ids = children
        obj.res = res
        return obj


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(DeviceTetGrid, DeviceTetGrid.tree_flatten,
                          DeviceTetGrid.tree_unflatten)


def default_capacity(res: int) -> tuple[int, int]:
    """Capacity bounds for extracted meshes: surface scales with res^2.

    Sized for shapes up to several times a sphere's area at the grid scale,
    then rounded up to MXU-friendly multiples of 256.
    """
    v_cap = max(4096, 12 * res * res)
    f_cap = 2 * v_cap
    rnd = lambda x: int(-(-x // 256) * 256)
    return rnd(v_cap), rnd(f_cap)
