"""Pallas TPU tile rasterizer — the visibility hot loop in VMEM.

The XLA formulation in `ops.rasterize` scans face chunks and materializes a
(pixels, chunk, 4) edge/depth tensor in HBM every step: measured 30.9 s per
256² batch-10 render at 200k face capacity (≈4 TB of HBM traffic). This
kernel blocks the computation flash-attention-style — a pixel tile and a
face chunk meet in VMEM — and *culls* non-interacting (tile, chunk) pairs.

v1 ran a (B, tiles, chunks) grid with the chunk as a grid dimension and a
`@pl.when(overlap)` guard. That predicates the *compute* but not the block
DMA: all B·T·C steps still copied their 48 KB coefficient block into VMEM
(123k steps at grid 128 capacity → ~190 ms of pure DMA/step overhead for a
mesh where only ~2% of pairs interact).

v2 (this file) makes the chunk loop *internal*:

  * per (image, tile), the overlapping chunk ids are prefix-compacted in XLA
    (a 192-element argsort) and scalar-prefetched into SMEM;
  * the grid is just (B, tiles); the kernel walks its own active-chunk list
    with double-buffered manual `make_async_copy` DMAs from the HBM-resident
    coefficient tensor — culled chunks cost nothing at all;
  * the remaining work is 4 small (TP,3)@(3,C) matmuls + VPU coverage/argmin
    per *active* pair.

v3 adds *screen-locality face ordering*: marching tets emits faces in
lattice-traversal order, so a 1024-face chunk spans a z-slab of the lattice
whose screen bbox is a band across the image — nearly every (tile, chunk)
pair survived bbox culling. Faces are reordered by the Morton code of their
32-face block's screen-bbox center (lattice-local blocks are screen-compact),
which makes chunk bboxes tight and collapses the per-tile chunk lists.
Original face ids travel in a 5th coefficient channel and are selected with a
masked min (no per-pixel remap gather afterwards).

Output and barycentric/interp/antialias semantics are identical to
`ops.rasterize.rasterize` (parity-tested in interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animals3d_tpu.ops.rasterize import (Rast, _face_coeffs,
                                         compute_barycentrics)

_BIG = 3.0e38
TILE = 32          # pixel tile edge (TILE*TILE = one kernel pixel block)
BLOCK = 32         # face-block granularity of the screen-locality sort


def _morton2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Interleave the low 8 bits of two i32 coordinates (Z-order curve)."""
    def spread(v):
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v
    return spread(x) | (spread(y) << 1)


def _raster_kernel(ids_ref, cnt_ref, pix_ref, A_hbm, z_ref, id_ref,
                   abuf, sem, *, chunk: int, kmax: int, nch: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    z_ref[...] = jnp.full_like(z_ref, _BIG)
    id_ref[...] = jnp.zeros_like(id_ref)

    # per-tile chunk lists are capped at kmax (SMEM budget); a tile that
    # overlaps more chunks falls back to scanning all of them
    n_raw = cnt_ref[b, i]
    use_ids = n_raw <= kmax
    n = jnp.where(use_ids, n_raw, nch)

    def cid_of(k):
        return jnp.where(use_ids,
                         ids_ref[b, i, jnp.minimum(k, kmax - 1)], k)

    def dma(slot, k):
        cid = cid_of(k)
        return pltpu.make_async_copy(
            A_hbm.at[b, :, :, pl.ds(cid * chunk, chunk)],
            abuf.at[slot],
            sem.at[slot],
        )

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    P = pix_ref[0]                                    # (TP, 3)

    def body(k, carry):
        z_run, id_run = carry
        slot = k % 2

        @pl.when(k + 1 < n)
        def _():
            dma((k + 1) % 2, k + 1).start()

        dma(slot, k).wait()
        A = abuf[slot]                                # (3, 8, chunk)
        # channels 4-7 are junk in the matmul output (ids ride in A[2, 4, :]
        # and are read directly below — the MXU would round ids > 2^mantissa;
        # the channel dim is 8 because HBM tiling pads the sublane dim to 8
        # and Mosaic rejects partial-tile DMA slices); widening the dot is
        # cheaper than slicing/relayouting the VMEM value.
        E = jnp.dot(P, A.reshape(3, 8 * chunk),
                    preferred_element_type=jnp.float32)
        e0 = E[:, 0 * chunk:1 * chunk]
        e1 = E[:, 1 * chunk:2 * chunk]
        e2 = E[:, 2 * chunk:3 * chunk]
        zz = E[:, 3 * chunk:4 * chunk]
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        zc = jnp.where(cov, zz, _BIG)                 # (TP, C)
        local_z = jnp.min(zc, axis=1, keepdims=True)  # (TP, 1)
        # faces are chunk-local in *sorted* order; the winner's ORIGINAL id
        # (stored per face in A[2, 4, :], exact in f32 for < 2^24 faces) is
        # selected with a masked min — ties on z pick the smallest orig id.
        idw = jnp.min(jnp.where(zc <= local_z, A[2, 4, :][None, :], _BIG),
                      axis=1, keepdims=True)
        take = local_z < z_run
        new_z = jnp.where(take, local_z, z_run)
        new_id = jnp.where(take, idw.astype(jnp.int32) + 1, id_run)
        return new_z, new_id

    z0 = jnp.full((TILE * TILE, 1), _BIG, jnp.float32)
    id0 = jnp.zeros((TILE * TILE, 1), jnp.int32)
    z_fin, id_fin = jax.lax.fori_loop(0, n, body, (z0, id0))
    z_ref[0] = z_fin
    id_ref[0] = id_fin


def _tile_pixels(height: int, width: int):
    """Pixel-center coords in 2-D-tile order → (ntiles, TILE*TILE, 3)."""
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    px, py = jnp.meshgrid(xs, ys)
    P = jnp.stack([px, py, jnp.ones_like(px)], -1)        # (H, W, 3)
    nty, ntx = height // TILE, width // TILE
    P = P.reshape(nty, TILE, ntx, TILE, 3).transpose(0, 2, 1, 3, 4)
    return P.reshape(nty * ntx, TILE * TILE, 3), nty, ntx


def _untile(x, B, nty, ntx):
    """(B, ntiles*TILE*TILE, 1) tile order → (B, H, W)."""
    x = x[..., 0].reshape(B, nty, ntx, TILE, TILE)
    return x.transpose(0, 1, 3, 2, 4).reshape(B, nty * TILE, ntx * TILE)


@functools.partial(jax.jit, static_argnames=("resolution", "chunk",
                                             "interpret"))
def rasterize_pallas(v_clip: jax.Array, faces: jax.Array, f_valid: jax.Array,
                     resolution: tuple[int, int], num_faces=None,
                     chunk: int = 1024, interpret: bool = False,
                     fv_clip: jax.Array | None = None) -> Rast:
    """fv_clip: optional pre-gathered `v_clip[faces]` (B, F, 3, 4) — lets the
    caller share the (B·F·3)-row gather with other per-face work (normals)."""
    height, width = resolution
    assert height % TILE == 0 and width % TILE == 0, (height, width)
    B, V, _ = v_clip.shape
    v_nd = jax.lax.stop_gradient(v_clip)
    F = faces.shape[0]
    Fp = -(-F // chunk) * chunk
    n_pix = height * width

    def coeffs_one(vc, fv):
        A, ok, _, _, sx, sy = _face_coeffs(vc, faces, f_valid, height, width,
                                           fv=fv)
        # invalid faces: edge constant −1 → never covered; empty bbox
        A = jnp.where(ok[:, None, None], A,
                      jnp.asarray([0.0, 0.0, -1.0])[None, :, None])
        lo_x = jnp.where(ok, sx.min(-1), _BIG)
        lo_y = jnp.where(ok, sy.min(-1), _BIG)
        hi_x = jnp.where(ok, sx.max(-1), -_BIG)
        hi_y = jnp.where(ok, sy.max(-1), -_BIG)
        return A, jnp.stack([lo_x, lo_y, hi_x, hi_y], -1)

    fv_nd = (None if fv_clip is None
             else jax.lax.stop_gradient(fv_clip))
    A, fbox = (jax.vmap(lambda vc: coeffs_one(vc, None))(v_nd)
               if fv_nd is None
               else jax.vmap(coeffs_one)(v_nd, fv_nd))  # (B,F,3,4), (B,F,4)
    if Fp != F:
        padA = jnp.zeros((B, Fp - F, 3, 4), A.dtype).at[:, :, 1, 2].set(-1.0)
        A = jnp.concatenate([A, padA], 1)
        padB = jnp.zeros((B, Fp - F, 4), fbox.dtype) \
            .at[..., :2].set(_BIG).at[..., 2:].set(-_BIG)
        fbox = jnp.concatenate([fbox, padB], 1)

    P, nty, ntx = _tile_pixels(height, width)
    T = nty * ntx

    # ---- screen-locality face ordering ------------------------------------
    # Sort BLOCK-face blocks (lattice-local → screen-compact) by the Morton
    # code of their screen-bbox-center tile; invalid/offscreen blocks go
    # last. Chunk bboxes become tight, so the per-tile chunk lists below
    # collapse from "almost every chunk" (band-shaped bboxes) to a handful.
    blk = min(BLOCK, chunk)          # chunk always divides Fp
    nblk = Fp // blk
    bb = fbox.reshape(B, nblk, blk, 4)
    blo = bb[..., :2].min(2)                          # (B, nblk, 2)
    bhi = bb[..., 2:].max(2)
    valid_blk = bhi[..., 0] >= blo[..., 0]
    btx = jnp.clip(((blo[..., 0] + bhi[..., 0]) * (0.5 / TILE))
                   .astype(jnp.int32), 0, ntx - 1)
    bty = jnp.clip(((blo[..., 1] + bhi[..., 1]) * (0.5 / TILE))
                   .astype(jnp.int32), 0, nty - 1)
    key = jnp.where(valid_blk, _morton2(btx, bty), jnp.int32(1 << 30))
    perm = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)

    def blk_gather(x, d):
        return jnp.take_along_axis(x.reshape(B, nblk, blk * d),
                                   perm[..., None], axis=1)

    A = blk_gather(A, 12).reshape(B, Fp, 3, 4)
    fbox = blk_gather(fbox, 4).reshape(B, Fp, 4)
    orig = (perm[..., None] * blk
            + jnp.arange(blk, dtype=jnp.int32)).reshape(B, Fp)
    # channel 4: original face id in the constant-coefficient slot (the
    # kernel reads A[2, 4, :] directly; f32 is exact below 2^24 faces).
    # Channels 5-7 pad the sublane dim to the (8, 128) HBM tile so the
    # kernel's per-chunk DMA slice is tile-aligned.
    idc = jnp.zeros((B, Fp, 3, 4), A.dtype) \
        .at[:, :, 2, 0].set(orig.astype(jnp.float32))
    A = jnp.concatenate([A, idc], -1)                # (B, Fp, 3, 8)
    A = A.transpose(0, 2, 3, 1)                      # (B, 3, 8, Fp)
    nch = Fp // chunk
    cb = fbox.reshape(B, nch, chunk, 4)
    bbox = jnp.concatenate([cb[..., :2].min(2), cb[..., 2:].max(2)], -1)

    # ---- per-(image, tile) active-chunk compaction (XLA, tiny) ------------
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((tids % ntx) * TILE).astype(jnp.float32)   # (T,)
    ty0 = ((tids // ntx) * TILE).astype(jnp.float32)
    overlap = ((bbox[:, None, :, 0] < tx0[None, :, None] + TILE) &
               (bbox[:, None, :, 2] >= tx0[None, :, None]) &
               (bbox[:, None, :, 1] < ty0[None, :, None] + TILE) &
               (bbox[:, None, :, 3] >= ty0[None, :, None]))    # (B, T, nch)
    # SMEM budget: ids (B, T, kmax) i32 well under the ~1 MB SMEM limit;
    # beyond-kmax tiles fall back to a full chunk scan
    kmax = min(nch, 192)
    order = jnp.argsort(~overlap, axis=-1, stable=True).astype(jnp.int32)
    order = order[..., :kmax]
    counts = overlap.sum(-1).astype(jnp.int32)                 # (B, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # chunk-id lists + counts
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, TILE * TILE, 3),
                         lambda b, i, ids, cnt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # A stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, TILE * TILE, 1),
                         lambda b, i, ids, cnt: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE * TILE, 1),
                         lambda b, i, ids, cnt: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    z, fid = pl.pallas_call(
        functools.partial(_raster_kernel, chunk=chunk, kmax=kmax, nch=nch),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n_pix, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, n_pix, 1), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pix * Fp * 24 // 8,
            bytes_accessed=B * T * 96 * chunk + B * n_pix * 8,
            transcendentals=0),
    )(order, counts, P, A)

    z = _untile(z, B, nty, ntx)
    fid = _untile(fid, B, nty, ntx)
    z = jnp.where(fid > 0, z, 0.0)
    uv = compute_barycentrics(v_clip, faces, fid, (height, width))
    return Rast(uv=uv, z=z, face_id=fid)
