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


def kuhn_corners() -> np.ndarray:
    """(6, 4, 3) corner offsets per tet, orientation-canonicalized.

    Odd permutations produce mirror-image (negative-volume) tets, which
    would flip the marching-tets triangle winding for half the lattice
    (observed: 50% inward faces → broken vertex normals). Swapping corners
    1↔2 for odd perms makes every tet positively oriented so extracted
    surfaces wind consistently outward.
    """
    unit = np.eye(3, dtype=np.int32)
    out = []
    for perm in _KUHN_PERMS:
        c = [np.zeros(3, np.int32), unit[perm[0]],
             unit[perm[0]] + unit[perm[1]], np.ones(3, np.int32)]
        parity = (np.linalg.det(np.eye(3)[list(perm)]) < 0)
        if parity:
            c[1], c[2] = c[2], c[1]
        out.append(np.stack(c))
    return np.stack(out)


@dataclasses.dataclass
class TetGrid:
    """Static tet-grid data (numpy, host-resident).

    For procedural Kuhn lattices (`is_lattice=True`) the edge/tet-edge
    tables are never needed on device (the lattice marching-tets path in
    `ops.dmtet` derives everything from shifts); they are computed lazily
    for tests/oracles only.
    """
    verts: np.ndarray          # (N, 3) float32, in (-0.5, 0.5)^3 (unscaled)
    tets: np.ndarray           # (T, 4) int32
    res: int
    is_lattice: bool = False
    _edges: np.ndarray = None
    _tet_edge_ids: np.ndarray = None

    @property
    def edges(self) -> np.ndarray:
        if self._edges is None:
            self._edges, self._tet_edge_ids = _unique_edges(
                self.tets, self.verts.shape[0])
        return self._edges

    @property
    def tet_edge_ids(self) -> np.ndarray:
        if self._tet_edge_ids is None:
            _ = self.edges
        return self._tet_edge_ids

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
    for corners in kuhn_corners():
        tet = np.stack([vid(*(base + c).T) for c in corners], -1)
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
        return TetGrid(verts=verts, tets=tets, res=res, is_lattice=False)
    # procedural lattice: no edge tables needed (shift-based kernel)
    verts, tets = kuhn_lattice(res)
    return TetGrid(verts=verts, tets=tets, res=res, is_lattice=True)


class DeviceTetGrid:
    """Device-resident copy of a TetGrid, passed into jitted steps as a
    pytree (NOT closed over — the arrays would be embedded in the HLO and
    overflow the compile-service payload limit). Lattice grids carry only
    the vertex positions; the shift-based kernel needs no tables."""

    def __init__(self, grid: TetGrid):
        import jax.numpy as jnp
        self.verts = jnp.asarray(grid.verts)
        self.res = grid.res
        self.is_lattice = grid.is_lattice
        if grid.is_lattice:
            self.tets = None
            self.edges = None
            self.tet_edge_ids = None
        else:
            self.tets = jnp.asarray(grid.tets)
            self.edges = jnp.asarray(grid.edges)
            self.tet_edge_ids = jnp.asarray(grid.tet_edge_ids)

    def tree_flatten(self):
        return ((self.verts, self.tets, self.edges, self.tet_edge_ids),
                (self.res, self.is_lattice))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.verts, obj.tets, obj.edges, obj.tet_edge_ids = children
        obj.res, obj.is_lattice = aux
        return obj


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(DeviceTetGrid, DeviceTetGrid.tree_flatten,
                          DeviceTetGrid.tree_unflatten)


def default_capacity(res: int, scale: float = 6.0) -> tuple[int, int]:
    """Capacity bounds for extracted meshes: surface scales with res^2.

    Sized for shapes up to several times a sphere's area at the grid scale,
    then rounded up to MXU-friendly multiples of 256. `scale` trades static
    headroom for step time: every capacity-shaped stage (marching-tets
    compaction, the per-face resolve table build, face-normal relayouts)
    scales linearly with it. A large inscribed sphere occupies ~2.2·res²
    vertices (measured: 35.4k at res 128), so the default 6 leaves ~2.7×
    headroom; `ExtractedMesh.num_verts/num_faces` report true counts for
    overflow monitoring.
    """
    v_cap = max(4096, int(scale * res * res))
    f_cap = 2 * v_cap
    rnd = lambda x: int(-(-x // 256) * 256)
    return rnd(v_cap), rnd(f_cap)
