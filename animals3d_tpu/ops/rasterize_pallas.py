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
TILE_H = 16        # pixel tile height (TILE_H*TILE_W = one kernel block)
TILE_W = 32        # pixel tile width
TP = TILE_H * TILE_W
BLOCK = 32         # face-block granularity of the screen-locality sort


def _morton2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Interleave the low 8 bits of two i32 coordinates (Z-order curve)."""
    def spread(v):
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v
    return spread(x) | (spread(y) << 1)


NSUB = 8           # sub-blocks per chunk for the in-kernel mask cull
NBUF = 4           # DMA ring depth (prefetch distance for chunk copies)


def _nsub() -> int:
    """Sub-blocks per chunk (A3D_NSUB, trace-time A/B lever; default NSUB).

    The kernel's VMEM traffic is dominated by the (TP, 4·sub) edge/depth
    matrix each LIVE sub-block materializes, so finer culling granularity
    (more, smaller sub-blocks with tighter bboxes) trades extra `pl.when`
    branches for proportionally less coverage math. 16 is the max that
    still fits the packed SMEM list entry (chunk id low 16 bits, overlap
    mask high 16 — the in-kernel `v >> 16` arithmetic shift sign-extends,
    but bit g of the mask is exact for g < 16)."""
    import os
    return min(16, int(os.environ.get("A3D_NSUB", str(NSUB))))

# occlusion early-out: per-chunk z-min is floor-quantized to i32 at this
# scale (clamped to ±8 NDC) so it rides the SMEM scalar-prefetch stream;
# floor-quantized strict `>` implies true strict `>`, so the skip is
# conservative and cannot change winners or exact-z id tiebreaks
ZQ_SCALE = 1048576.0
ZQ_CLAMP = 8.0


def _zq(z: jax.Array) -> jax.Array:
    return jnp.floor(jnp.clip(z, -ZQ_CLAMP, ZQ_CLAMP) * ZQ_SCALE) \
        .astype(jnp.int32)


def _no_zskip() -> bool:
    """A3D_NO_ZSKIP=1 reverts to Morton-order lists with the occlusion
    skip disabled (z-min forced to -inf) — an A/B lever for device timing."""
    import os
    return os.environ.get("A3D_NO_ZSKIP") == "1"


def _kernel_v() -> int:
    """Visibility-kernel version (A3D_RASTER_V, trace-time A/B lever).

    3 (default): the lane-major kernel (PERF_NOTES sessions 1-6).
    4: transposed (faces-on-sublanes) coverage math — the two winner
      min-reductions run across SUBLANES (log2(8)=3 shuffle steps per vreg
      column vs log2(128)=7 across lanes) and all per-pixel state updates
      run on (1, TP) rows (4 vregs) instead of (TP, 1) columns (64 vregs at
      1/128 lane occupancy). Same dot, same rounding, same tiebreaks —
      device winners are bit-identical to v3 (fid/z exact match, measured).
      End-to-end it is NEUTRAL (v5e bench 2026-08-19: recon 35.74 vs 35.58
      imgs/s, train 458 vs 445 ms — within tunnel contention noise), i.e.
      the kernel is not reduction/layout bound; kept as a lever because the
      balance may shift with chunk geometry.
    5: v3 loop structure but the 4 affine channels (3 edge functions + z)
      are evaluated as VPU broadcast-FMAs instead of the (TP,3)@(3,4·sub)
      dot. REJECTED on device (v5e 2026-08-20): recon 1.70 imgs/s vs 35.6
      for v3, ~20x slower — Mosaic lowers the (TP,1)x(1,sub) broadcast
      outer-products at catastrophic lane occupancy; the low-K MXU dot,
      despite streaming a full 128-deep pass at 3/128 occupancy, is far
      faster. The low-K dot's default-precision bf16 operand truncation
      affects only edge signs and z-compares (never barycentric dets, which
      are computed downstream from the f32 resolve path); the evidence that
      this rounding is harmless is the measured v4-vs-v3 device A/B
      (2026-08-19): winner buffers (fid AND z) bit-identical through the
      same dot, and `tests/test_rasterize_pallas.py` device runs match the
      f32 interpret oracle exactly on the stress meshes. bf16 CAN flip a
      sign for pixels within ~2^-8 relative of an edge; those pixels are
      inside the antialias blend band, where coverage is analytically
      re-blended anyway. Kept only as a negative-result lever.
    6: DENSE per-tile unit lists (`_raster_kernel_v6`): XLA-side z-sorted
      compaction + slab gather, kernel walks a dense array with zero
      mask branches. NEUTRAL on device: −0.7% recon on the A/A-certified
      harness (v5e 2026-08-20; an earlier +2.9% reading was traced to
      input-buffer harness bias, PERF_NOTES session 9). Verdict stands
      on the bracketing: v3's ~1.6 µs per live sub-block is the
      (TP,3)@(3,4·sub) dot + VPU reductions THEMSELVES, not loop/branch
      overhead (v4 "neutral" said the same from the layout side) —
      removing every branch and SMEM decode re-pays the cost as
      slab-gather traffic, ±1%. The kernel is compute-bound at ~8.2M
      face-slot visits/launch; only finer-than-sub-block culling could
      cut that, and at this mesh's Morton screen-compactness the
      live-slot count is already within ~2x of the per-face-tile
      interaction floor. v3 stays default (no win, simpler memory
      profile); lever kept."""
    import os
    return int(os.environ.get("A3D_RASTER_V", "3"))


def _raster_kernel(ids_ref, cnt_ref, zlo_ref, pix_ref, A_hbm, z_ref, id_ref,
                   won_ref, abuf, took, sem, *, chunk: int, kmax: int,
                   nch: int, nsub: int = NSUB, vpu_e: bool = False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    T = pl.num_programs(1)

    z_ref[...] = jnp.full_like(z_ref, _BIG)
    id_ref[...] = jnp.zeros_like(id_ref)
    won_ref[...] = jnp.zeros_like(won_ref)
    kwid = won_ref.shape[-1]

    # per-tile chunk lists are capped at kmax (SMEM budget); a tile that
    # overlaps more chunks falls back to scanning all of them. Each SMEM
    # entry packs the chunk id (low 16 bits) and an NSUB-bit mask of which
    # sub-blocks' bboxes overlap this tile (high bits). The list tensor is
    # FLAT (B*T*kmax,) so SMEM lane padding (last dim rounded to 128) is
    # paid once globally, not per (b, i) row — kmax < 128 is now a real
    # budget, not a floor.
    n_raw = cnt_ref[b, i]
    use_ids = n_raw <= kmax
    n = jnp.where(use_ids, n_raw, nch)
    row = (b * T + i) * kmax

    def entry_of(k):
        v = ids_ref[row + jnp.minimum(k, kmax - 1)]
        cid = jnp.where(use_ids, v & 0xFFFF, k)
        m8 = jnp.where(use_ids, v >> 16, (1 << nsub) - 1)
        return cid, m8

    def dma(slot, k):
        cid, _ = entry_of(k)
        # A is chunk-contiguous (B, nch, 3, 8, chunk): one contiguous 96 KB
        # copy per chunk. (A channel-major slice [b, :, :, cid*chunk :] is 24
        # strided 4 KB segments — measured ~17 us/pair, DMA-latency-bound.)
        return pltpu.make_async_copy(
            A_hbm.at[b, cid],
            abuf.at[slot],
            sem.at[slot],
        )

    for kpre in range(NBUF):
        @pl.when(kpre < n)
        def _(kpre=kpre):
            dma(kpre, kpre).start()

    P = pix_ref[0]                                    # (TP, 3)
    sub = chunk // nsub

    def body(k, _):
        slot = k % NBUF
        dma(slot, k).wait()
        A = abuf[slot]                                # (3, 8, chunk)
        cid, m8 = entry_of(k)
        took[...] = jnp.zeros_like(took)
        # occlusion early-out: the per-tile list is visited front-to-back
        # (sorted by chunk z-min), so once EVERY pixel in the tile has a
        # winner nearer than this chunk's z-min, no remaining chunk can take
        # a pixel (strict >: exact-z id tiebreaks are unaffected) — skip
        # the coverage math (the DMA already ran; compute is the cost)
        live = zlo_ref[b * nch + cid] <= _zq(jnp.max(z_ref[0]))
        # The kernel cost is the (TP, faces) coverage min3 + lane reductions
        # (measured ~6 us per full 1024-face chunk); the NSUB-bit mask skips
        # sub-blocks whose bbox misses this tile, cutting that work to the
        # sub-blocks that can matter. The dot uses only the 4 live channels;
        # ids ride in A[2, 4, :] and are read directly (the MXU would round
        # ids > 2^mantissa; the channel dim is stored as 8 because HBM
        # tiling pads the sublane dim to 8).
        for g in range(nsub):
            @pl.when(live & ((m8 >> g) % 2 == 1))
            def _(g=g):
                sl = slice(g * sub, (g + 1) * sub)
                if vpu_e:
                    # v5: the 4 affine channels as VPU broadcast-FMAs. The
                    # K=3 dot runs the MXU at 3/128 occupancy (the array
                    # streams a full 128-deep pass regardless), and Mosaic's
                    # default f32 dot truncates operands to bf16 — the FMAs
                    # are full-rate VPU work AND exact f32.
                    xc = P[:, 0:1]                       # (TP, 1)
                    yc = P[:, 1:2]
                    a = A[0, :4, sl]                     # (4, sub) per coeff
                    bb = A[1, :4, sl]
                    cc = A[2, :4, sl]
                    e0 = xc * a[0][None] + (yc * bb[0][None] + cc[0][None])
                    e1 = xc * a[1][None] + (yc * bb[1][None] + cc[1][None])
                    e2 = xc * a[2][None] + (yc * bb[2][None] + cc[2][None])
                    zz = xc * a[3][None] + (yc * bb[3][None] + cc[3][None])
                else:
                    Ag = A[:, :4, sl]
                    E = jnp.dot(P, Ag.reshape(3, 4 * sub),
                                preferred_element_type=jnp.float32)
                    e0 = E[:, 0 * sub:1 * sub]
                    e1 = E[:, 1 * sub:2 * sub]
                    e2 = E[:, 2 * sub:3 * sub]
                    zz = E[:, 3 * sub:4 * sub]
                m = jnp.minimum(jnp.minimum(e0, e1), e2)  # >= 0 iff covered
                zc = jnp.where(m >= 0, zz, _BIG)          # (TP, sub)
                gz = jnp.min(zc, axis=1, keepdims=True)   # (TP, 1)
                # faces are sub-block-local in *sorted* order; the winner's
                # ORIGINAL id (A[2, 4, :], exact in f32 below 2^24 faces) is
                # selected by masked min — z ties pick the smallest orig id
                ids = A[2, 4, g * sub:(g + 1) * sub]
                gid = jnp.min(jnp.where(zc <= gz, ids[None, :], _BIG),
                              axis=1, keepdims=True)
                zr = z_ref[0]
                gi = gid.astype(jnp.int32) + 1
                # exact-z ties resolve to the globally smallest ORIGINAL
                # face id (matches ops.rasterize regardless of the Morton
                # chunk visit order); the zr < _BIG guard keeps the
                # empty-vs-empty case from comparing saturated ids
                take = (gz < zr) | ((gz == zr) & (zr < _BIG)
                                    & (gi < id_ref[0]))
                z_ref[0] = jnp.where(take, gz, zr)
                id_ref[0] = jnp.where(take, gi, id_ref[0])
                took[...] = jnp.where(take, 1.0, took[...])

        # record whether any pixel (provisionally) took a face from this
        # chunk: a SUPERSET of the final winner chunks per tile, consumed by
        # the resolve fwd/bwd kernels to skip bbox-overlapping chunks whose
        # faces all lost the depth test (typ. 3-6x fewer pairs)
        anyf = took[...].max() > 0.0
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, kwid), 1)
        won_ref[0, 0] = won_ref[0, 0] | jnp.where(anyf & (lane == k), 1, 0)

        # refill this ring slot only after the compute above consumed it
        @pl.when(k + NBUF < n)
        def _():
            dma(slot, k + NBUF).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _raster_kernel_v4(ids_ref, cnt_ref, zlo_ref, bbase_ref, pixT_ref, A_hbm,
                      z_ref, id_ref, won_ref, abuf, took, sem,
                      *, chunk: int, kmax: int, nch: int, nsub: int = NSUB):
    """Transposed visibility kernel: faces ride SUBLANES, pixels ride LANES.

    Numerics are identical to `_raster_kernel` — the edge/depth dot is the
    same contraction with the same (default-precision) MXU rounding, the
    winner z/id min-reductions see the same values, and the tiebreak is the
    same masked min over ORIGINAL face ids. The ids never ride a DMA: the
    Morton sort permutes BLOCK(32)-face runs of consecutive ids, so a
    sub-block's (sub, 1) id column is rebuilt from sub//BLOCK scalar-
    prefetched run bases (`bbase_ref`) + a sublane iota.
    What changes vs v3 is pure layout: the reductions run across sublanes
    (3 shuffle steps/column vs 7 across lanes) and the per-pixel state
    updates run on (1, TP) rows (4 vregs) instead of (TP, 1) columns
    (64 vregs at 1/128 lane occupancy).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    T = pl.num_programs(1)

    z_ref[...] = jnp.full_like(z_ref, _BIG)
    id_ref[...] = jnp.zeros_like(id_ref)
    won_ref[...] = jnp.zeros_like(won_ref)
    kwid = won_ref.shape[-1]

    n_raw = cnt_ref[b, i]
    use_ids = n_raw <= kmax
    n = jnp.where(use_ids, n_raw, nch)
    row = (b * T + i) * kmax
    # bbase is (1, nblk) when the face order is batch-shared (the fv_rows
    # fast path) or (B, nblk) when per-image (the generic path)
    bb_b = jnp.minimum(b, bbase_ref.shape[0] - 1)
    runs = max(1, (chunk // nsub) // BLOCK)
    blocks_per_chunk = chunk // BLOCK

    def entry_of(k):
        v = ids_ref[row + jnp.minimum(k, kmax - 1)]
        cid = jnp.where(use_ids, v & 0xFFFF, k)
        m8 = jnp.where(use_ids, v >> 16, (1 << nsub) - 1)
        return cid, m8

    def dma(slot, k):
        cid, _ = entry_of(k)
        return pltpu.make_async_copy(A_hbm.at[b, cid], abuf.at[slot],
                                     sem.at[slot])

    for kpre in range(NBUF):
        @pl.when(kpre < n)
        def _(kpre=kpre):
            dma(kpre, kpre).start()

    Pt = pixT_ref[0]                                  # (3, TP)
    sub = chunk // nsub
    i0 = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
    run_off = i0 % BLOCK

    def body(k, _):
        slot = k % NBUF
        dma(slot, k).wait()
        A = abuf[slot]                                # (3, 8, chunk)
        cid, m8 = entry_of(k)
        took[...] = jnp.zeros_like(took)
        live = zlo_ref[b * nch + cid] <= _zq(jnp.max(z_ref[0, 0]))
        for g in range(nsub):
            @pl.when(live & ((m8 >> g) % 2 == 1))
            def _(g=g):
                Ag = A[:, :4, g * sub:(g + 1) * sub]
                # contract the coefficient axis of BOTH operands: output is
                # (4*sub, TP) — faces/quantities on sublanes, pixels on
                # lanes. Same products, same f32 sum-of-3 as v3's
                # P @ Ag (just transposed), so device rounding matches.
                E = jax.lax.dot_general(
                    Ag.reshape(3, 4 * sub), Pt, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                e0 = E[0 * sub:1 * sub]
                e1 = E[1 * sub:2 * sub]
                e2 = E[2 * sub:3 * sub]
                zz = E[3 * sub:4 * sub]
                m = jnp.minimum(jnp.minimum(e0, e1), e2)
                zc = jnp.where(m >= 0, zz, _BIG)          # (sub, TP)
                gz = jnp.min(zc, axis=0, keepdims=True)   # (1, TP)
                # original-id column from the 32-face run bases
                blk0 = cid * blocks_per_chunk + g * runs
                base = jnp.zeros_like(i0)
                for j in range(runs):
                    bj = bbase_ref[bb_b, blk0 + j]
                    base = jnp.where(
                        (i0 >= j * BLOCK) & (i0 < (j + 1) * BLOCK), bj, base)
                ids = (base + run_off).astype(jnp.float32)  # (sub, 1)
                gid = jnp.min(jnp.where(zc <= gz, ids, _BIG),
                              axis=0, keepdims=True)      # (1, TP)
                zr = z_ref[0, 0]                          # (1, TP)
                gi = gid.astype(jnp.int32) + 1
                take = (gz < zr) | ((gz == zr) & (zr < _BIG)
                                    & (gi < id_ref[0, 0]))
                z_ref[0, 0] = jnp.where(take, gz, zr)
                id_ref[0, 0] = jnp.where(take, gi, id_ref[0, 0])
                took[...] = jnp.where(take, 1.0, took[...])

        anyf = took[...].max() > 0.0
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, kwid), 1)
        won_ref[0, 0] = won_ref[0, 0] | jnp.where(anyf & (lane == k), 1, 0)

        @pl.when(k + NBUF < n)
        def _():
            dma(slot, k + NBUF).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _tile_pixels(height: int, width: int):
    """Pixel-center coords in 2-D-tile order → (ntiles, TP, 3)."""
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    px, py = jnp.meshgrid(xs, ys)
    P = jnp.stack([px, py, jnp.ones_like(px)], -1)        # (H, W, 3)
    nty, ntx = height // TILE_H, width // TILE_W
    P = P.reshape(nty, TILE_H, ntx, TILE_W, 3).transpose(0, 2, 1, 3, 4)
    return P.reshape(nty * ntx, TP, 3), nty, ntx


def _untile(x, B, nty, ntx):
    """(B, ntiles*TP, 1) tile order → (B, H, W)."""
    x = x[..., 0].reshape(B, nty, ntx, TILE_H, TILE_W)
    return x.transpose(0, 1, 3, 2, 4).reshape(B, nty * TILE_H, ntx * TILE_W)


def _morton3(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Interleave the low 10 bits of three i32 coordinates (3-D Z-order)."""
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _pallas_visibility(order, counts, zlo_q, P, A, *, B, n_pix, T, chunk,
                       kmax, nch, nsub, interpret, bbase=None):
    kwid = -(-max(kmax, 1) // 128) * 128
    cost = pl.CostEstimate(
        flops=2 * B * n_pix * chunk * nch * 24 // 8,
        bytes_accessed=B * T * 96 * chunk + B * n_pix * 8,
        transcendentals=0)
    use_v4 = (_kernel_v() == 4 and bbase is not None
              and chunk % nsub == 0 and (chunk // nsub) % BLOCK == 0)
    if use_v4:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,   # + per-block original-id run bases
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 3, TP),
                             lambda b, i, ids, cnt, zlo, bb: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # A in HBM
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 1, TP),
                             lambda b, i, ids, cnt, zlo, bb: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, TP),
                             lambda b, i, ids, cnt, zlo, bb: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, kwid),
                             lambda b, i, ids, cnt, zlo, bb: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((NBUF, 3, 8, chunk), jnp.float32),
                pltpu.VMEM((1, TP), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        Pt = jnp.swapaxes(P, 1, 2)                      # (T, 3, TP)
        z, fid, wonk = pl.pallas_call(
            functools.partial(_raster_kernel_v4, chunk=chunk, kmax=kmax,
                              nch=nch, nsub=nsub),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B, T, 1, TP), jnp.float32),
                       jax.ShapeDtypeStruct((B, T, 1, TP), jnp.int32),
                       jax.ShapeDtypeStruct((B, T, 8, kwid), jnp.int32)],
            interpret=interpret,
            cost_estimate=cost,
        )(order, counts, zlo_q, bbase, Pt, A)
        # (B, T, 1, TP) has the same linear order as (B, n_pix, 1)
        return (z.reshape(B, n_pix, 1), fid.reshape(B, n_pix, 1), wonk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # chunk-id/mask lists + counts + chunk z-min
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, TP, 3),
                         lambda b, i, ids, cnt, zlo: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # A stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, TP, 1),
                         lambda b, i, ids, cnt, zlo: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, 1),
                         lambda b, i, ids, cnt, zlo: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, kwid),
                         lambda b, i, ids, cnt, zlo: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, 3, 8, chunk), jnp.float32),
            pltpu.VMEM((TP, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_raster_kernel, chunk=chunk, kmax=kmax, nch=nch,
                          nsub=nsub, vpu_e=_kernel_v() == 5),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n_pix, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, n_pix, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, T, 8, kwid), jnp.int32)],
        interpret=interpret,
        cost_estimate=cost,
    )(order, counts, zlo_q, P, A)


def _raster_kernel_v6(cnt_ref, zs_ref, pix_ref, S_hbm, A_hbm, z_ref, id_ref,
                      won_ref, sbuf, abuf, sem, sem2, *, S: int, chunk: int,
                      nch: int, nsub: int):
    """v6: DENSE per-tile unit lists — iteration restructure of v3.

    XLA-side prep compacts, per (image, tile), the z-sorted list of
    128-face *units* (sub-blocks) whose bboxes overlap the tile, and
    GATHERS their coefficient slabs into a (B, T, S, 3, 8, sub) array.
    The kernel then walks a dense array: no SMEM chunk ids, no per-sub-
    block `pl.when` masks — every iteration is one slab DMA + one
    (TP,3)@(3,4·sub) dot + winner update. v3 spent ~1.6 µs per LIVE
    sub-block with ~58% of sub-block visits masked off (r4 trace); here
    every visit is live and the per-chunk loop bookkeeping (SMEM entry
    decode, took scratch, m8 shifts) is gone.

    Tiles whose unit count exceeds S fall back to a full scan over all
    chunks (second loop, v3 math without masks) — same degradation
    contract as v3's kmax overflow. Winner/tiebreak semantics identical
    to v3: front-to-back z-sorted visit order + occlusion early-out
    (strict `>` on floor-quantized z-min), masked-min winner with
    original-id tiebreak."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    T = pl.num_programs(1)

    z_ref[...] = jnp.full_like(z_ref, _BIG)
    id_ref[...] = jnp.zeros_like(id_ref)
    won_ref[...] = jnp.zeros_like(won_ref)
    kwid = won_ref.shape[-1]
    sub = chunk // nsub

    n = cnt_ref[b, i]
    dense = n <= S
    nd = jnp.where(dense, n, 0)

    def dma_s(slot, k):
        # slab rows are (3, 8, sub) contiguous — one descriptor per unit
        return pltpu.make_async_copy(
            S_hbm.at[b, i, k], sbuf.at[slot], sem.at[slot])

    for kpre in range(NBUF):
        @pl.when(kpre < nd)
        def _(kpre=kpre):
            dma_s(kpre, kpre).start()

    P = pix_ref[0]                                    # (TP, 3)

    def unit_math(A, sl_ids):
        """Coverage + winner update for one (3, 8, sub) coeff slab.
        Returns 1.0 iff any pixel provisionally took a face."""
        E = jnp.dot(P, A[:, :4].reshape(3, 4 * sub),
                    preferred_element_type=jnp.float32)
        e0 = E[:, 0 * sub:1 * sub]
        e1 = E[:, 1 * sub:2 * sub]
        e2 = E[:, 2 * sub:3 * sub]
        zz = E[:, 3 * sub:4 * sub]
        m = jnp.minimum(jnp.minimum(e0, e1), e2)
        zc = jnp.where(m >= 0, zz, _BIG)              # (TP, sub)
        gz = jnp.min(zc, axis=1, keepdims=True)       # (TP, 1)
        gid = jnp.min(jnp.where(zc <= gz, sl_ids[None, :], _BIG),
                      axis=1, keepdims=True)
        zr = z_ref[0]
        gi = gid.astype(jnp.int32) + 1
        take = (gz < zr) | ((gz == zr) & (zr < _BIG) & (gi < id_ref[0]))
        z_ref[0] = jnp.where(take, gz, zr)
        id_ref[0] = jnp.where(take, gi, id_ref[0])
        return jnp.max(jnp.where(take, 1.0, 0.0))

    def body(k, _):
        slot = k % NBUF
        dma_s(slot, k).wait()
        A = sbuf[slot]                                # (3, 8, sub)
        # occlusion early-out: units arrive front-to-back (per-image
        # z-sorted axis); a unit behind every pixel's winner can't take
        live = zs_ref[(b * T + i) * S + k] <= _zq(jnp.max(z_ref[0]))

        @pl.when(live)
        def _():
            anyf = unit_math(A, A[2, 4])
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, kwid), 1)
            won_ref[0, 0] = won_ref[0, 0] | \
                jnp.where((anyf > 0) & (lane == k), 1, 0)

        @pl.when(k + NBUF < nd)
        def _():
            dma_s(slot, k + NBUF).start()
        return 0

    jax.lax.fori_loop(0, nd, body, 0)

    # ---- overflow fallback: full scan over every chunk (rare) ------------
    nf = jnp.where(dense, 0, nch)

    def dma_c(slot, k):
        return pltpu.make_async_copy(
            A_hbm.at[b, k], abuf.at[slot], sem2.at[slot])

    for kpre in range(NBUF):
        @pl.when(kpre < nf)
        def _(kpre=kpre):
            dma_c(kpre, kpre).start()

    def cbody(k, _):
        slot = k % NBUF
        dma_c(slot, k).wait()
        A = abuf[slot]                                # (3, 8, chunk)
        for g in range(nsub):
            sl = slice(g * sub, (g + 1) * sub)
            unit_math(A[:, :, sl], A[2, 4, sl])

        @pl.when(k + NBUF < nf)
        def _():
            dma_c(slot, k + NBUF).start()
        return 0

    jax.lax.fori_loop(0, nf, cbody, 0)

    @pl.when(~dense)
    def _():
        # conservative winner flags; the XLA side substitutes the bbox
        # overlap row for overflow tiles (same contract as v3 kmax)
        won_ref[0, 0] = jnp.ones_like(won_ref[0, 0])


def _pallas_visibility_v6(counts, zs, P, slabs, A, *, B, n_pix, T, S,
                          chunk, nch, nsub, interpret):
    kwid = -(-max(S, 1) // 128) * 128
    sub = chunk // nsub
    cost = pl.CostEstimate(
        flops=2 * B * T * S * TP * 4 * sub,
        bytes_accessed=B * T * S * 96 * sub + B * n_pix * 8,
        transcendentals=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # counts (B,T) + unit z-min flat
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, TP, 3),
                         lambda b, i, cnt, zs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # slabs in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # chunk A (fallback)
        ],
        out_specs=[
            pl.BlockSpec((1, TP, 1),
                         lambda b, i, cnt, zs: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, 1),
                         lambda b, i, cnt, zs: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, kwid),
                         lambda b, i, cnt, zs: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, 3, 8, sub), jnp.float32),
            pltpu.VMEM((NBUF, 3, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_raster_kernel_v6, S=S, chunk=chunk, nch=nch,
                          nsub=nsub),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, n_pix, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, n_pix, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, T, 8, kwid), jnp.int32)],
        interpret=interpret,
        cost_estimate=cost,
    )(counts, zs, P, slabs, A)


def _rasterize_pallas_T(v_clip, faces, f_valid, resolution, chunk, interpret,
                        fv_rows):
    """Struct-of-arrays fast path (used by render_mesh via `fv_rows`).

    The v3 path computed face coefficients on (B, F, 3[, 4]) arrays whose
    minor dimension is 3-7 — 2-5% VPU lane occupancy, measured ~115 ms of
    pure elementwise math at 196k face capacity. Here every per-face value
    is a (B, Fp) array with the face axis minor (full (8,128) registers),
    and the coefficient tensor is assembled directly into the kernel's
    chunk-contiguous (B, nch, 3, 8, chunk) layout.

    The screen-locality sort becomes a single SHARED block order, keyed by
    the 3-D Morton code of each 32-face block's batch-0 world centroid:
    3-D-compact blocks project to compact screen regions in every view, so
    one order serves the whole batch and the sort gather is batch-free.
    """
    height, width = resolution
    B, V, _ = v_clip.shape
    F = faces.shape[0]
    Fp = -(-F // chunk) * chunk
    n_pix = height * width
    # keep the face table 2-D (Fp, 3·B·7) end-to-end: the old 4-D
    # (F, 3, B, 7) form was materialized TWICE in T(8,128) tiling with a
    # (B, 7)-minor pair (r5 device trace: reshape.10189 4.0 ms +
    # reshape.10190 5.2 ms + copy.3873 3.5 ms per recon iter) — the pad,
    # the Morton permute gather, and the channel transpose all run on
    # merged rows instead, with ONE materialized relayout at the end
    # (same pattern as render.py's face-normal fvT, session-3 playbook)
    fvr = jax.lax.stop_gradient(fv_rows).reshape(F, 3 * B * 7)
    if Fp != F:
        fvr = jnp.concatenate(
            [fvr, jnp.zeros((Fp - F, 3 * B * 7), fvr.dtype)], 0)
        f_valid = jnp.concatenate(
            [f_valid, jnp.zeros((Fp - F,), bool)], 0)

    # ---- shared block order: 3-D Morton of batch-0 world centroids --------
    blk = min(BLOCK, chunk)
    nblk = Fp // blk
    # batch-0 world xyz per vertex = three contiguous 3-column slices
    ctr = (fvr[:, 0:3] + fvr[:, B * 7:B * 7 + 3]
           + fvr[:, 2 * B * 7:2 * B * 7 + 3]) / 3.0  # (Fp, 3) — tiny
    bval = f_valid.reshape(nblk, blk)
    nb = jnp.maximum(bval.sum(1), 1)[:, None]
    c = (ctr.reshape(nblk, blk, 3)
         * bval[..., None]).sum(1) / nb              # (nblk, 3)
    has = bval.any(1)
    lo = jnp.min(jnp.where(has[:, None], c, _BIG), 0)
    hi = jnp.max(jnp.where(has[:, None], c, -_BIG), 0)
    q = jnp.clip(((c - lo) / jnp.maximum(hi - lo, 1e-9) * 1023)
                 .astype(jnp.int32), 0, 1023)
    key = jnp.where(has, _morton3(q[:, 0], q[:, 1], q[:, 2]),
                    jnp.int32(1 << 30))
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)   # (nblk,)
    orig = (perm[:, None] * blk
            + jnp.arange(blk, dtype=jnp.int32)).reshape(Fp)  # sorted → orig
    fvr = fvr.reshape(nblk, -1)[perm].reshape(Fp, 3 * B * 7)
    fval = f_valid[orig]

    # ---- face coefficients, minor-F ---------------------------------------
    # The reshape below merges the (7, 3) dims, which are NOT physically
    # adjacent in the bitcast layout XLA keeps for the transpose — forcing
    # ONE materialized relayout with Fp minor. Without it, XLA leaves the
    # channel dim minor and every per-channel slice is a ~47 MB strided
    # read + retiling copy (4 slices measured ~85 ms total in the trace).
    # DEFAULT: the 4-D route — materialize (Fp,3,B,7), transpose to
    # (B,21,Fp), slice channels (the session-3 merge trick). The "purer"
    # alternative (A3D_FVR_2D=1: keep merged (Fp,210) rows end-to-end,
    # one (210,Fp) transpose, leading-dim channel views) measured WORSE
    # in the interleaved device A/B (v5e 2026-08-20, n=8 paired): recon
    # +3.3%, train +11.6% (421.8 → 470.7 ms/step) — the full transpose of
    # the 661 MB table plus read-amplified strided ctr slices cost more
    # than the two 4-D materializations they replace, and XLA schedules
    # the 4-D copies better against the rest of the graph. Negative
    # lever kept; trace lines it targeted: reshape.10189/10190,
    # copy.3873 (~13 ms/recon iter).
    import os
    if os.environ.get("A3D_FVR_2D") == "1":
        fvM = fvr.transpose(1, 0).reshape(3, B, 7, Fp)

        def chv(c, vtx):
            return fvM[vtx, :, c]                    # (B, Fp), minor Fp
    else:
        fvM4 = fvr.reshape(Fp, 3, B, 7).transpose(2, 3, 1, 0) \
            .reshape(B, 21, Fp)

        def chv(c, vtx):
            return fvM4[:, c * 3 + vtx]              # (B, Fp), minor Fp

    sw0 = jnp.where(jnp.abs(chv(6, 0)) > 1e-9, chv(6, 0), 1e-9)
    sw1 = jnp.where(jnp.abs(chv(6, 1)) > 1e-9, chv(6, 1), 1e-9)
    sw2 = jnp.where(jnp.abs(chv(6, 2)) > 1e-9, chv(6, 2), 1e-9)
    x0 = (chv(3, 0) / sw0 + 1.0) * (0.5 * width)     # (B, Fp)
    x1 = (chv(3, 1) / sw1 + 1.0) * (0.5 * width)
    x2 = (chv(3, 2) / sw2 + 1.0) * (0.5 * width)
    y0 = (chv(4, 0) / sw0 + 1.0) * (0.5 * height)
    y1 = (chv(4, 1) / sw1 + 1.0) * (0.5 * height)
    y2 = (chv(4, 2) / sw2 + 1.0) * (0.5 * height)
    z0, z1, z2 = chv(5, 0) / sw0, chv(5, 1) / sw1, chv(5, 2) / sw2
    det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    a0, b0, c0 = y1 - y2, x2 - x1, x1 * y2 - x2 * y1
    a1, b1, c1 = y2 - y0, x0 - x2, x2 * y0 - x0 * y2
    a2, b2, c2 = y0 - y1, x1 - x0, x0 * y1 - x1 * y0
    sgn = jnp.where(det >= 0, 1.0, -1.0)
    absdet = jnp.abs(det)
    inv = 1.0 / jnp.maximum(absdet, 1e-12)
    ok = (fval[None, :] & (absdet > 1e-12) & (chv(6, 0) > 1e-6)
          & (chv(6, 1) > 1e-6) & (chv(6, 2) > 1e-6))
    eps = 1e-4 * absdet
    ea0, ea1, ea2 = a0 * sgn, a1 * sgn, a2 * sgn
    eb0, eb1, eb2 = b0 * sgn, b1 * sgn, b2 * sgn
    ec0, ec1, ec2 = c0 * sgn, c1 * sgn, c2 * sgn
    za = (ea0 * z0 + ea1 * z1 + ea2 * z2) * inv
    zb = (eb0 * z0 + eb1 * z1 + eb2 * z2) * inv
    zc = (ec0 * z0 + ec1 * z1 + ec2 * z2) * inv
    ec0, ec1, ec2 = ec0 + eps, ec1 + eps, ec2 + eps
    zero = jnp.zeros_like(det)
    g = lambda v: jnp.where(ok, v, 0.0)          # invalid → (a,b,c)=(0,0,-1)
    gc = lambda v: jnp.where(ok, v, -1.0)
    origb = jnp.broadcast_to(orig.astype(jnp.float32)[None], (B, Fp))
    A8 = jnp.stack([
        jnp.stack([g(ea0), g(ea1), g(ea2), g(za), zero, zero, zero, zero], 1),
        jnp.stack([g(eb0), g(eb1), g(eb2), g(zb), zero, zero, zero, zero], 1),
        jnp.stack([gc(ec0), gc(ec1), gc(ec2), gc(zc), origb,
                   zero, zero, zero], 1),
    ], 1)                                            # (B, 3, 8, Fp)
    nch = Fp // chunk
    A8 = A8.reshape(B, 3, 8, nch, chunk).transpose(0, 3, 1, 2, 4)
    # (B, nch, 3, 8, chunk): per-chunk blocks contiguous in HBM

    # ---- per-(tile, chunk) lists + sub-block masks ------------------------
    P, nty, ntx = _tile_pixels(height, width)
    T = nty * ntx
    ns = _nsub()
    nsub = ns if chunk % ns == 0 and chunk >= ns else 1
    sub = chunk // nsub
    min3 = lambda u, v, t: jnp.minimum(jnp.minimum(u, v), t)
    max3 = lambda u, v, t: jnp.maximum(jnp.maximum(u, v), t)
    lo_x = jnp.where(ok, min3(x0, x1, x2), _BIG).reshape(B, nch, nsub, sub)
    lo_y = jnp.where(ok, min3(y0, y1, y2), _BIG).reshape(B, nch, nsub, sub)
    hi_x = jnp.where(ok, max3(x0, x1, x2), -_BIG).reshape(B, nch, nsub, sub)
    hi_y = jnp.where(ok, max3(y0, y1, y2), -_BIG).reshape(B, nch, nsub, sub)
    lo_x, lo_y = lo_x.min(-1), lo_y.min(-1)          # (B, nch, nsub)
    hi_x, hi_y = hi_x.max(-1), hi_y.max(-1)
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((tids % ntx) * TILE_W).astype(jnp.float32)
    ty0 = ((tids // ntx) * TILE_H).astype(jnp.float32)
    t_ = (None, slice(None), None, None)
    ov_sub = ((lo_x[:, None] < tx0[t_] + TILE_W) & (hi_x[:, None] >= tx0[t_]) &
              (lo_y[:, None] < ty0[t_] + TILE_H) & (hi_y[:, None] >= ty0[t_]))
    m8 = (ov_sub.astype(jnp.int32)
          << jnp.arange(nsub, dtype=jnp.int32)).sum(-1)        # (B, T, nch)
    overlap = m8 > 0
    if _kernel_v() == 6 and chunk % nsub == 0 and nsub > 1:
        from animals3d_tpu.ops.dmtet import first_geq
        U = nch * nsub
        ovu = ov_sub.reshape(B, T, U)
        # per-unit (sub-block) quantized z-min for front-to-back order +
        # the in-kernel occlusion early-out
        zu = _zq(jnp.where(ok, min3(z0, z1, z2), _BIG)
                 .reshape(B, U, sub).min(-1))                  # (B, U)
        if _no_zskip():
            zu = jnp.full_like(zu, -2**31)
        zperm = jnp.argsort(zu, axis=-1, stable=True).astype(jnp.int32)
        ovz = jnp.take_along_axis(ovu, zperm[:, None, :], -1)  # (B, T, U)
        csum = jnp.cumsum(ovz.astype(jnp.int32), -1)
        counts6 = csum[..., -1]                                # (B, T)
        import os
        S = max(1, min(128, U, int(os.environ.get("A3D_V6_CAP", "128"))))
        tgt = jnp.arange(1, S + 1, dtype=jnp.int32)
        pos = jax.vmap(lambda r: first_geq(r, tgt))(
            csum.reshape(B * T, U))                            # (B·T, S)
        posc = jnp.minimum(pos, U - 1).reshape(B, T, S)
        zpermB = jnp.broadcast_to(zperm[:, None, :], (B, T, U))
        unit = jnp.take_along_axis(zpermB, posc, -1)           # (B, T, S)
        # unit-contiguous coeff layout + per-(tile,slot) slab gather
        A8u = A8.reshape(B, nch, 3, 8, nsub, sub) \
            .transpose(0, 1, 4, 2, 3, 5).reshape(B, U, 3, 8, sub)
        slabs = jax.vmap(lambda a, idx: a[idx])(
            A8u, unit.reshape(B, T * S)).reshape(B, T, S, 3, 8, sub)
        zs = jnp.take_along_axis(
            jnp.broadcast_to(zu[:, None, :], (B, T, U)), posc, -1) \
            .reshape(B * T * S)
        z, fid, wonk = _pallas_visibility_v6(
            counts6, zs, P, slabs, A8, B=B, n_pix=n_pix, T=T, S=S,
            chunk=chunk, nch=nch, nsub=nsub, interpret=interpret)
        z = _untile(z, B, nty, ntx)
        fid = _untile(fid, B, nty, ntx)
        z = jnp.where(fid > 0, z, 0.0)
        uv = compute_barycentrics(v_clip, faces, fid, (height, width))
        flat6 = (jnp.arange(B * T, dtype=jnp.int32)[:, None] * nch
                 + (unit // nsub).reshape(B * T, S)).reshape(-1)
        won = jnp.zeros((B * T * nch,), jnp.int32) \
            .at[flat6].max(wonk[:, :, 0, :S].reshape(-1),
                           mode="drop").reshape(B, T, nch) > 0
        won = jnp.where((counts6 <= S)[..., None], won, overlap) & overlap
        bw_aux = (orig.reshape(nch, chunk).astype(jnp.int32), won)
        return Rast(uv=uv, z=z, face_id=fid, bw_aux=bw_aux)

    # conservative per-chunk depth bound (min vertex NDC z over valid
    # faces) for front-to-back list order + the in-kernel occlusion skip
    zlo_q = _zq(jnp.where(ok, min3(z0, z1, z2), _BIG)
                .reshape(B, nch, chunk).min(-1))           # (B, nch) i32
    # the flat (B*T*kmax,) list pays SMEM lane padding once globally, so
    # a ~928 KB SMEM budget (leaving room for the v4 id-run bases) divides exactly; tiles whose true chunk count
    # exceeds kmax fall back to the in-kernel full scan
    kmax = max(1, min(nch, (928 * 1024 // 4) // (B * T)))
    if _no_zskip():
        zlo_q = jnp.full_like(zlo_q, -2**31)               # skip never fires
    zkey = jnp.where(overlap, zlo_q[:, None, :], jnp.int32(2**31 - 1))
    order_ids = jnp.argsort(zkey, axis=-1, stable=True) \
        .astype(jnp.int32)[..., :kmax]                     # (B, T, kmax)
    order = (order_ids | (jnp.take_along_axis(m8, order_ids, axis=-1) << 16)) \
        .reshape(B * T * kmax)
    counts = overlap.sum(-1).astype(jnp.int32)

    # v4 tiebreak ids: the Morton sort moves whole BLOCK-face runs of
    # consecutive original ids, so sorted block j's ids are
    # perm[j]*BLOCK + 0..BLOCK-1 — the kernel rebuilds each (sub, 1) id
    # column from these scalar-prefetched run bases (batch-shared here)
    bbase = (perm * blk).astype(jnp.int32)[None]         # (1, nblk)
    z, fid, wonk = _pallas_visibility(
        order, counts, zlo_q.reshape(B * nch), P, A8, B=B, n_pix=n_pix, T=T,
        chunk=chunk, kmax=kmax, nch=nch, nsub=nsub, interpret=interpret,
        bbase=bbase)
    z = _untile(z, B, nty, ntx)
    fid = _untile(fid, B, nty, ntx)
    z = jnp.where(fid > 0, z, 0.0)
    uv = compute_barycentrics(v_clip, faces, fid, (height, width))
    # winner-chunk flags: the kernel records, per (b, tile) list entry,
    # whether any pixel provisionally took a face from that chunk — a
    # superset of the final winner chunks. Scatter list-position flags back
    # to chunk ids (entries within a row are distinct -> unique indices);
    # tiles that overflowed the SMEM list (full-scan fallback) keep the
    # conservative bbox-overlap row.
    flat = (jnp.arange(B * T, dtype=jnp.int32)[:, None] * nch
            + order_ids.reshape(B * T, kmax)).reshape(-1)
    won = jnp.zeros((B * T * nch,), jnp.int32) \
        .at[flat].set(wonk[:, :, 0, :kmax].reshape(-1), mode="drop",
                      unique_indices=True).reshape(B, T, nch) > 0
    won = jnp.where((counts <= kmax)[..., None], won, overlap) & overlap
    # thread the chunk structure out for the MXU resolve fwd/bwd: original
    # face ids per sorted chunk + the winner-chunk tile/chunk interactions
    bw_aux = (orig.reshape(nch, chunk).astype(jnp.int32), won)
    return Rast(uv=uv, z=z, face_id=fid, bw_aux=bw_aux)


@functools.partial(jax.jit, static_argnames=("resolution", "chunk",
                                             "interpret"))
def rasterize_pallas(v_clip: jax.Array, faces: jax.Array, f_valid: jax.Array,
                     resolution: tuple[int, int], num_faces=None,
                     chunk: int | None = None, interpret: bool = False,
                     fv_clip: jax.Array | None = None,
                     fv_rows: jax.Array | None = None) -> Rast:
    """fv_clip: optional pre-gathered `v_clip[faces]` (B, F, 3, 4) — lets the
    caller share the (B·F·3)-row gather with other per-face work (normals).
    fv_rows: optional batch-packed gather rows `tab[faces]` (F, 3, B*7) with
    tab = concat([v_pos, v_clip], -1) transposed to (V, B*7) — enables the
    struct-of-arrays fast path (see _rasterize_pallas_T)."""
    height, width = resolution
    if chunk is None:
        # A3D_CHUNK: trace-time A/B lever for the face-chunk granularity
        # (fewer, larger chunks = fewer loop iterations / DMA waits but
        # coarser bbox culling; chunk sweep history in PERF_NOTES)
        import os
        chunk = int(os.environ.get("A3D_CHUNK", "1024"))
    if fv_rows is not None:
        return _rasterize_pallas_T(v_clip, faces, f_valid, resolution,
                                   chunk, interpret, fv_rows)
    assert height % TILE_H == 0 and width % TILE_W == 0, (height, width)
    B, V, _ = v_clip.shape
    v_nd = jax.lax.stop_gradient(v_clip)
    F = faces.shape[0]
    Fp = -(-F // chunk) * chunk
    n_pix = height * width

    def coeffs_one(vc, fv):
        A, ok, _, _, sx, sy = _face_coeffs(vc, faces, f_valid, height, width,
                                           fv=fv)
        # vertex NDC z from the affine z row (z is affine, so the triangle's
        # min is attained at a vertex) — the chunk depth bound for the
        # kernel's occlusion early-out
        zv = (A[:, 0:1, 3] * sx + A[:, 1:2, 3] * sy + A[:, 2:3, 3])  # (F, 3)
        zmin = jnp.where(ok, zv.min(-1), _BIG)
        # invalid faces: edge constant −1 → never covered; empty bbox
        A = jnp.where(ok[:, None, None], A,
                      jnp.asarray([0.0, 0.0, -1.0])[None, :, None])
        lo_x = jnp.where(ok, sx.min(-1), _BIG)
        lo_y = jnp.where(ok, sy.min(-1), _BIG)
        hi_x = jnp.where(ok, sx.max(-1), -_BIG)
        hi_y = jnp.where(ok, sy.max(-1), -_BIG)
        return A, jnp.stack([lo_x, lo_y, hi_x, hi_y], -1), zmin

    fv_nd = (None if fv_clip is None
             else jax.lax.stop_gradient(fv_clip))
    A, fbox, fzmin = (jax.vmap(lambda vc: coeffs_one(vc, None))(v_nd)
                      if fv_nd is None
                      else jax.vmap(coeffs_one)(v_nd, fv_nd))
    if Fp != F:
        padA = jnp.zeros((B, Fp - F, 3, 4), A.dtype).at[:, :, 1, 2].set(-1.0)
        A = jnp.concatenate([A, padA], 1)
        padB = jnp.zeros((B, Fp - F, 4), fbox.dtype) \
            .at[..., :2].set(_BIG).at[..., 2:].set(-_BIG)
        fbox = jnp.concatenate([fbox, padB], 1)
        fzmin = jnp.concatenate(
            [fzmin, jnp.full((B, Fp - F), _BIG, fzmin.dtype)], 1)

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
    btx = jnp.clip(((blo[..., 0] + bhi[..., 0]) * (0.5 / TILE_W))
                   .astype(jnp.int32), 0, ntx - 1)
    bty = jnp.clip(((blo[..., 1] + bhi[..., 1]) * (0.5 / TILE_H))
                   .astype(jnp.int32), 0, nty - 1)
    key = jnp.where(valid_blk, _morton2(btx, bty), jnp.int32(1 << 30))
    perm = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)

    def blk_gather(x, d):
        return jnp.take_along_axis(x.reshape(B, nblk, blk * d),
                                   perm[..., None], axis=1)

    A = blk_gather(A, 12).reshape(B, Fp, 3, 4)
    fbox = blk_gather(fbox, 4).reshape(B, Fp, 4)
    fzmin = blk_gather(fzmin, 1).reshape(B, Fp)
    orig = (perm[..., None] * blk
            + jnp.arange(blk, dtype=jnp.int32)).reshape(B, Fp)
    # channel 4: original face id in the constant-coefficient slot (the
    # kernel reads A[2, 4, :] directly; f32 is exact below 2^24 faces).
    # Channels 5-7 pad the sublane dim to the (8, 128) HBM tile so the
    # kernel's per-chunk DMA slice is tile-aligned.
    idc = jnp.zeros((B, Fp, 3, 4), A.dtype) \
        .at[:, :, 2, 0].set(orig.astype(jnp.float32))
    A = jnp.concatenate([A, idc], -1)                # (B, Fp, 3, 8)
    nch = Fp // chunk
    A = A.reshape(B, nch, chunk, 3, 8).transpose(0, 1, 3, 4, 2)
    # (B, nch, 3, 8, chunk): per-chunk blocks are contiguous in HBM
    # ---- per-(image, tile) active-chunk compaction (XLA, tiny) ------------
    # sub-block (chunk/NSUB faces) bboxes → an NSUB-bit overlap mask per
    # (tile, chunk), packed into the SMEM entry's high bits so the kernel
    # can skip sub-blocks whose bbox misses the tile (the coverage math per
    # face column is the kernel's dominant cost)
    ns = _nsub()
    nsub = ns if chunk % ns == 0 and chunk >= ns else 1
    sb = fbox.reshape(B, nch, nsub, chunk // nsub, 4)
    sbox = jnp.concatenate([sb[..., :2].min(3), sb[..., 2:].max(3)], -1)
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((tids % ntx) * TILE_W).astype(jnp.float32)   # (T,)
    ty0 = ((tids // ntx) * TILE_H).astype(jnp.float32)
    t_ = (None, slice(None), None, None)
    ov_sub = ((sbox[:, None, ..., 0] < tx0[t_] + TILE_W) &
              (sbox[:, None, ..., 2] >= tx0[t_]) &
              (sbox[:, None, ..., 1] < ty0[t_] + TILE_H) &
              (sbox[:, None, ..., 3] >= ty0[t_]))     # (B, T, nch, NSUB)
    m8 = (ov_sub.astype(jnp.int32)
          << jnp.arange(nsub, dtype=jnp.int32)).sum(-1)        # (B, T, nch)
    overlap = m8 > 0
    zlo_q = _zq(fzmin.reshape(B, nch, chunk).min(-1))          # (B, nch)
    # the flat (B*T*kmax,) list pays SMEM lane padding once globally, so
    # a ~928 KB SMEM budget (leaving room for the v4 id-run bases) divides exactly; tiles whose true chunk count
    # exceeds kmax fall back to the in-kernel full scan
    kmax = max(1, min(nch, (928 * 1024 // 4) // (B * T)))
    if _no_zskip():
        zlo_q = jnp.full_like(zlo_q, -2**31)               # skip never fires
    zkey = jnp.where(overlap, zlo_q[:, None, :], jnp.int32(2**31 - 1))
    order = jnp.argsort(zkey, axis=-1, stable=True).astype(jnp.int32)
    order = order[..., :kmax]
    order = (order | (jnp.take_along_axis(m8, order, axis=-1) << 16)) \
        .reshape(B * T * kmax)
    counts = overlap.sum(-1).astype(jnp.int32)                 # (B, T)

    bbase = (perm * blk).astype(jnp.int32)               # (B, nblk)
    z, fid, _won = _pallas_visibility(order, counts, zlo_q.reshape(B * nch),
                                      P, A, B=B, n_pix=n_pix, T=T,
                                      chunk=chunk, kmax=kmax, nch=nch,
                                      nsub=nsub, interpret=interpret,
                                      bbase=bbase)
    z = _untile(z, B, nty, ntx)
    fid = _untile(fid, B, nty, ntx)
    z = jnp.where(fid > 0, z, 0.0)
    uv = compute_barycentrics(v_clip, faces, fid, (height, width))
    return Rast(uv=uv, z=z, face_id=fid)


# ---------------------------------------------------------------------------
# MXU resolve backward: the transpose of the per-pixel row gather
# `pf[sel]` is a 655k-row colliding scatter-add in XLA (traced at 106 ms/step
# at 256²×10 — row-descriptor bound, ~150 ns/row). Here it becomes a
# one-hot matmul over the SAME bbox-culled (tile, chunk) pairs the forward
# rasterizer visits: per pair, onehotT[face, px] = (id[face] == sel[px]) and
# d_chunk (chunk, C) += onehotT (chunk, TP) @ gtile (TP, C) — every operand
# lands in its natural Mosaic layout (sel rides lanes, channels ride lanes,
# the contraction dim TP is lanes-of-LHS/sublanes-of-RHS, which is exactly
# the MXU's A@B orientation). Face ids never touch HBM: a chunk's sorted→
# original id column is synthesized in-kernel from the Morton block
# permutation (BLOCK-sized runs of consecutive ids) via one iota + cpb
# scalar selects. bf16 operands / f32 accumulate, like every other matmul
# under the mixed-precision policy.
# ---------------------------------------------------------------------------

NBUF_BW = 2


def _resolve_bwd_kernel(tlist_ref, tcnt_ref, permb_ref, gT_hbm, sel_hbm,
                        out_ref, acc, gbuf, sbuf, sem_g, sem_s,
                        *, tmax: int, T: int, blk: int, cpb: int, Rp: int,
                        ntx: int):
    b = pl.program_id(0)
    c = pl.program_id(1)
    nch = pl.num_programs(1)
    chunk = acc.shape[0]

    n_raw = tcnt_ref[b, c]
    use_list = n_raw <= tmax
    n = jnp.where(use_list, n_raw, T)
    row = (b * nch + c) * tmax

    def tile_of(k):
        v = tlist_ref[row + jnp.minimum(k, tmax - 1)]
        return jnp.where(use_list, v, k)

    def dma_g(slot, k):
        # g stays in raster order (B, H, W, Cp) — a pixel tile is a
        # strided (TILE_H, TILE_W, Cp) window, no XLA-side relayout
        t = tile_of(k)
        ty, tx = t // ntx, t % ntx
        return pltpu.make_async_copy(
            gT_hbm.at[b, pl.ds(ty * TILE_H, TILE_H),
                      pl.ds(tx * TILE_W, TILE_W)],
            gbuf.at[slot], sem_g.at[slot])

    def dma_s(slot, k):
        return pltpu.make_async_copy(sel_hbm.at[b, tile_of(k)],
                                     sbuf.at[slot], sem_s.at[slot])

    for kpre in range(NBUF_BW):
        @pl.when(kpre < n)
        def _(kpre=kpre):
            dma_g(kpre, kpre).start()
            dma_s(kpre, kpre).start()

    # sorted→orig id column for this chunk: cpb runs of blk consecutive ids
    # starting at permb[c*cpb + s] (the Morton sort permutes BLOCK-sized
    # face blocks wholesale, so ids inside a run are consecutive)
    e = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    seg = e // blk
    start = jnp.zeros((chunk, 1), jnp.int32)
    for s in range(cpb):
        start = jnp.where(seg == s, permb_ref[c * cpb + s], start)
    ids_col = start + e % blk                          # (chunk, 1) orig ids

    acc[...] = jnp.zeros_like(acc)

    def body(k, _):
        slot = k % NBUF_BW
        dma_g(slot, k).wait()
        dma_s(slot, k).wait()
        gtile = gbuf[slot].reshape(TP, gbuf.shape[-1])  # (TP, Cp)
        srow = sbuf[slot][0:1]                         # (1, TP) i32
        oneh = (ids_col == srow).astype(gtile.dtype)   # (chunk, TP)
        acc[...] += jnp.dot(oneh, gtile,
                            preferred_element_type=jnp.float32)

        @pl.when(k + NBUF_BW < n)
        def _():
            dma_g(slot, k + NBUF_BW).start()
            dma_s(slot, k + NBUF_BW).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[...] = acc[...][:, :Rp][None, None]


def resolve_grad_pallas(g: jax.Array, sel: jax.Array, ids_sorted: jax.Array,
                        overlap: jax.Array, resolution: tuple[int, int],
                        F: int, interpret: bool = False,
                        compute_dtype=None) -> jax.Array:
    """d_pf (B, F, R) from pixel cotangents g (B, H·W, R) and per-pixel
    0-based original face ids sel (B, H·W) (background rows carry sel=0
    with zero cotangent — `resolve`'s contract)."""
    B, n_pix, R = g.shape
    height, width = resolution
    nty, ntx = height // TILE_H, width // TILE_W
    T = nty * ntx
    assert T * TP == n_pix
    nch, chunk = ids_sorted.shape
    Fp = nch * chunk
    blk = min(BLOCK, chunk)
    cpb = chunk // blk
    nblk = Fp // blk

    dt = g.dtype if compute_dtype is None else compute_dtype
    # Mosaic DMA slices need 128-aligned minor dims: pad channels R→128
    Rp = -(-R // 8) * 8                                # out minor (≈48)
    Cp = 128
    g2 = g.astype(dt)
    if Cp != R:
        g2 = jnp.pad(g2, ((0, 0), (0, 0), (0, Cp - R)))

    # g keeps raster order (B, H, W, Cp) — pixels on sublanes of each
    # in-kernel (TILE_H·TILE_W, Cp) block, channels on lanes (matmul RHS);
    # the kernel DMAs strided tile windows, so the only XLA-side work is
    # the pad+cast. sel (B, T, 8, TP) — pixels on lanes (the one-hot
    # compare axis), 8 sublanes to satisfy DMA tiling, row 0 live
    gt = g2.reshape(B, height, width, Cp)
    st = sel.astype(jnp.int32).reshape(B, nty, TILE_H, ntx, TILE_W) \
        .transpose(0, 1, 3, 2, 4).reshape(B, T, 1, TP)
    st = jnp.broadcast_to(st, (B, T, 8, TP))

    # per-(image, chunk) tile lists from the forward's bbox-culled overlap
    ovT = overlap.transpose(0, 2, 1)                   # (B, nch, T)
    tmax = max(1, min(T, (900 * 1024 // 4) // max(B * nch, 1)))
    order = jnp.argsort(~ovT, axis=-1, stable=True).astype(jnp.int32)
    tlist = order[..., :tmax].reshape(B * nch * tmax)
    tcnt = ovT.sum(-1).astype(jnp.int32)               # (B, nch)
    # first orig id of each sorted BLOCK (= perm[p]·blk)
    permb = ids_sorted.reshape(nblk, blk)[:, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nch),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # gT stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),      # sel stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, Rp),
                               lambda b, c, tl, tc, pb: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((chunk, Cp), jnp.float32),
            pltpu.VMEM((NBUF_BW, TILE_H, TILE_W, Cp), dt),
            pltpu.VMEM((NBUF_BW, 8, TP), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF_BW,)),
            pltpu.SemaphoreType.DMA((NBUF_BW,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_resolve_bwd_kernel, tmax=tmax, T=T, blk=blk,
                          cpb=cpb, Rp=Rp, ntx=ntx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nch, chunk, Rp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * chunk * Cp * 8,
            bytes_accessed=B * T * TP * (Cp * g2.dtype.itemsize + 4)
            + B * Fp * Rp * 4,
            transcendentals=0),
    )(tlist, tcnt, permb, gt, st)

    # sorted-chunk rows → original face order (block structure of the
    # Morton sort: sorted j = p·blk + r ↦ original permb[p] + r)
    d_blocks = out.reshape(B, nblk, blk * Rp)
    invperm = jnp.argsort(permb // blk)                # orig block → sorted
    d_orig = d_blocks[:, invperm].reshape(B, Fp, Rp)
    return d_orig[:, :F, :R]


# ---------------------------------------------------------------------------
# MXU resolve FORWARD: the per-pixel row gather `pf[b, sel[b]]` (655k rows of
# ~170 B at 256²×10 — descriptor-bound, traced at ~45 ms/step) becomes a
# one-hot matmul over the rasterizer's winner-chunk (tile, chunk) pairs:
# per pair, oneh[face, px] = (ids[face] == sel[px]) and
# rows_T (Rp, TP) += pf_chunk (chunk, Rp)ᵀ @ oneh (chunk, TP) — the MXU's
# native AᵀB orientation. Because each pixel's winner lives in exactly one
# visited chunk, f32 accumulation is EXACT selection (one non-zero term).
# The output is written channel-major in pixel-tile order (B, Rp, T·TP),
# which is precisely the layout the barycentric math consumes (it begins by
# transposing the gather rows) — no XLA-side transpose or relayout anywhere.
# Background pixels (sel=0 outside any winner chunk) come out ZERO, not
# pf[0]; the caller masks background before use, like the gather contract.
# ---------------------------------------------------------------------------

NBUF_FW = 2


def _resolve_fwd_kernel(clist_ref, ccnt_ref, pf_hbm, sel_hbm,
                        out_ref, acc, pbuf, sbuf, sem_p, sem_s,
                        *, cmax: int, nch: int, Rp: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)

    n_raw = ccnt_ref[b, t]
    use_list = n_raw <= cmax
    n = jnp.where(use_list, n_raw, nch)
    row = (b * T + t) * cmax

    def chunk_of(k):
        v = clist_ref[row + jnp.minimum(k, cmax - 1)]
        return jnp.where(use_list, v, k)

    def dma_p(slot, k):
        return pltpu.make_async_copy(pf_hbm.at[b, chunk_of(k)],
                                     pbuf.at[slot], sem_p.at[slot])

    sel_cp = pltpu.make_async_copy(sel_hbm.at[b, t], sbuf, sem_s)
    sel_cp.start()
    for kpre in range(NBUF_FW):
        @pl.when(kpre < n)
        def _(kpre=kpre):
            dma_p(kpre, kpre).start()
    sel_cp.wait()
    srow = sbuf[0:1]                                   # (1, TP) f32

    acc[...] = jnp.zeros_like(acc)

    def body(k, _):
        slot = k % NBUF_FW
        dma_p(slot, k).wait()
        # the chunk's original face ids ride in pf channel Rp (f32-exact
        # below 2^24 faces) — already in the (chunk, 1) sublane layout the
        # broadcast compare wants, no extra DMA or synthesis
        ids_col = pbuf[slot][:, Rp:Rp + 1]             # (chunk, 1)
        oneh = (ids_col == srow).astype(jnp.float32)   # (chunk, TP)
        # HIGHEST: the MXU's default f32 path truncates operands to bf16
        # (2^-7 relative error — catastrophic for the barycentric dets the
        # caller builds from differences of these rows); the one-hot is
        # exact in bf16, so multi-pass f32 recovers exact selection
        acc[...] += jax.lax.dot_general(
            pbuf[slot], oneh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (Cp, TP)

        @pl.when(k + NBUF_FW < n)
        def _():
            dma_p(slot, k + NBUF_FW).start()
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[...] = acc[:Rp][None]


def resolve_rows_pallas(pf: jax.Array, sel: jax.Array, ids_sorted: jax.Array,
                        won: jax.Array, resolution: tuple[int, int],
                        interpret: bool = False) -> jax.Array:
    """Channel-major tile-ordered resolve rows (B, Rp, T·TP) — the one-hot
    forward of `pf[b, sel[b]]` followed by a transpose, fused on the MXU.

    pf: (B, F, Rp) per-face rows (Rp multiple of 8); sel: (B, H·W) 0-based
    original winner face ids (raster order, 0 on background); ids_sorted /
    won: the rasterizer's `bw_aux`.

    Contract caveat: background pixels carry sel=0, which ALIASES original
    face id 0 — when face 0's chunk is a winner chunk for a tile, those
    rows come back as pf[0], not zero (rows of tiles no winner chunk
    touches ARE zero). Callers MUST mask by their own fid>0 / coverage
    channel before trusting any row.
    """
    B, F, Rp = pf.shape
    height, width = resolution
    nty, ntx = height // TILE_H, width // TILE_W
    T = nty * ntx
    n_pix = T * TP
    nch, chunk = ids_sorted.shape
    Fp = nch * chunk
    blk = min(BLOCK, chunk)
    nblk = Fp // blk
    assert Rp % 8 == 0, Rp

    if Fp != F:
        pf = jnp.concatenate(
            [pf, jnp.zeros((B, Fp - F, Rp), pf.dtype)], 1)
    # sorted-face-order chunks, contiguous per (b, chunk) for one-shot DMA;
    # the minor dim pads to 128 (Mosaic HBM slices must be tile-aligned) and
    # channel Rp carries the chunk's ORIGINAL face ids (f32-exact below 2^24
    # faces) so the in-kernel one-hot compare needs no separate ids DMA
    Cp = 128
    assert Rp < Cp, Rp
    permb = ids_sorted.reshape(nblk, blk)[:, 0]
    pf_sorted = pf.reshape(B, nblk, blk * Rp)[:, permb // blk] \
        .reshape(B, nch, chunk, Rp).astype(jnp.float32)
    pf_sorted = jnp.pad(pf_sorted, ((0, 0), (0, 0), (0, 0), (0, Cp - Rp)))
    pf_sorted = pf_sorted.at[..., Rp].set(
        jnp.broadcast_to(ids_sorted.astype(jnp.float32), (B, nch, chunk)))
    # sel tiles: pixels on lanes, 8 sublanes for DMA tiling, row 0 live;
    # f32 to match the id channel (exact below 2^24)
    st = sel.astype(jnp.float32).reshape(B, nty, TILE_H, ntx, TILE_W) \
        .transpose(0, 1, 3, 2, 4).reshape(B, T, 1, TP)
    st = jnp.broadcast_to(st, (B, T, 8, TP))

    # per-(image, tile) winner-chunk lists
    cmax = max(1, min(nch, (900 * 1024 // 4) // max(B * T, 1)))
    order = jnp.argsort(~won, axis=-1, stable=True).astype(jnp.int32)
    clist = order[..., :cmax].reshape(B * T * cmax)
    ccnt = won.sum(-1).astype(jnp.int32)               # (B, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # pf_sorted in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),      # sel tiles in HBM
        ],
        out_specs=pl.BlockSpec((1, Rp, TP),
                               lambda b, t, cl, cc: (b, 0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Cp, TP), jnp.float32),
            pltpu.VMEM((NBUF_FW, chunk, Cp), jnp.float32),
            pltpu.VMEM((8, TP), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF_FW,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_resolve_fwd_kernel, cmax=cmax, nch=nch, Rp=Rp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Rp, n_pix), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * 4 * chunk * Rp * TP // TP,
            bytes_accessed=B * T * 4 * chunk * (Rp + 1) * 4
            + B * Rp * n_pix * 4,
            transcendentals=0),
    )(clist, ccnt, pf_sorted, st)
