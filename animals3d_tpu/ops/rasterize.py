"""Differentiable triangle rasterization, TPU-native.

Replaces nvdiffrast's `rasterize` + `interpolate` (used via
`/root/reference/model/render/render.py:292-296` and `:139-221`). nvdiffrast
is a CUDA/OpenGL rasterizer; this is a from-scratch XLA design that maps the
problem onto TPU strengths:

  * Edge functions and depth are *affine in pixel coordinates*, so evaluating
    them for a tile of pixels × a chunk of faces is one matmul
    `[px, py, 1] @ coeffs` that rides the MXU. The forward pass is a
    `lax.scan` over face chunks with a running (depth, face-id) argmin carry —
    a flash-attention-style streaming reduction, later tiled in Pallas.
  * Visibility (which face wins a pixel) is inherently non-differentiable and
    is computed under `stop_gradient`. Gradients w.r.t. vertex positions flow
    through a *differentiable re-computation of barycentrics* for the winning
    face (the same decomposition nvdiffrast uses: rasterize backward =
    barycentric derivative at fixed face assignment). Silhouette gradients are
    supplied separately by `ops.antialias`.

Conventions (match the reference's GL pipeline):
  * input `v_clip` is (B, V, 4) clip-space positions (after the mvp transform,
    `render.py:278`); NDC = xyz/w; depth test on NDC z (smaller = nearer).
  * pixel (i, j) has center (j + 0.5, i + 0.5) in screen coords;
    screen x = (ndc_x + 1)/2 * W, y = (ndc_y + 1)/2 * H. Row 0 is the *top*
    image row: the reference's `util.perspective` bakes a y-flip into the
    projection (`util.py:189-194`), so NDC +y maps down the image here.
  * output `rast` = (u, v, z_ndc, id) with id = face_index + 1, 0 = empty —
    nvdiffrast's buffer layout. (u, v) are perspective-correct barycentric
    weights of vertices 1 and 2.
  * no backface culling (either winding rasterizes), single depth layer —
    all reference call sites use num_layers=1 (`AnimalModel.py:247`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class Rast(NamedTuple):
    uv: jax.Array      # (B, H, W, 2) perspective-correct barycentrics (diff'able)
    z: jax.Array       # (B, H, W) NDC depth of the hit (stop-grad)
    face_id: jax.Array  # (B, H, W) int32, face_index + 1, 0 = background
    # Pallas-rasterizer aux for the MXU resolve backward (None elsewhere):
    # (ids_sorted (nch, chunk) i32 original face ids in Morton-chunk order,
    #  overlap (B, T, nch) bool tile/chunk interaction from bbox culling)
    bw_aux: object = None

    @property
    def mask(self) -> jax.Array:
        return self.face_id > 0


def _face_coeffs(v_clip: jax.Array, faces: jax.Array, f_valid: jax.Array,
                 height: int, width: int, fv: jax.Array | None = None):
    """Per-face affine coefficients for edge functions and depth.

    Returns A: (F, 3, 4) such that [px, py, 1] @ A[f] = [e0, e1, e2, z_affine]
    where e_i are unnormalized barycentric numerators (sign(det)-corrected so
    inside => all e_i >= 0) and z_affine = sum_i l_i * z_ndc_i with
    l_i = e_i / det.

    fv: optional pre-gathered clip positions `v_clip[faces]` (F, 3, 4). The
    (F, 3)-row gather is the dominant cost of this function on TPU
    (descriptor-bound); callers that also need per-face world positions
    (face normals) should gather one packed table and pass the clip slice.
    """
    if fv is None:
        fv = v_clip[faces]                            # (F, 3, 4)
    fw = fv[..., 3]
    safe_w = jnp.where(jnp.abs(fw) > 1e-9, fw, 1e-9)
    ndc = fv[..., :3] / safe_w[..., None]
    fx = (ndc[..., 0] + 1.0) * (0.5 * width)
    fy = (ndc[..., 1] + 1.0) * (0.5 * height)
    fz = ndc[..., 2]

    x0, x1, x2 = fx[:, 0], fx[:, 1], fx[:, 2]
    y0, y1, y2 = fy[:, 0], fy[:, 1], fy[:, 2]
    # det = twice signed area; adjugate rows give the affine barycentric
    # numerators: e_i(p) = a_i px + b_i py + c_i, with e_0+e_1+e_2 = det.
    det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    a0, b0, c0 = y1 - y2, x2 - x1, x1 * y2 - x2 * y1
    a1, b1, c1 = y2 - y0, x0 - x2, x2 * y0 - x0 * y2
    a2, b2, c2 = y0 - y1, x1 - x0, x0 * y1 - x1 * y0

    sgn = jnp.where(det >= 0, 1.0, -1.0)
    inv_det = sgn / jnp.maximum(jnp.abs(det), 1e-12)
    ok = f_valid & (jnp.abs(det) > 1e-12) & (fw > 1e-6).all(-1)

    e = jnp.stack([jnp.stack([a0, b0, c0], -1),
                   jnp.stack([a1, b1, c1], -1),
                   jnp.stack([a2, b2, c2], -1)], -1) * sgn[:, None, None]
    # affine depth row: z(p) = sum_i (e_i * |inv_det|) * z_i — computed from
    # the raw edge functions, before the coverage epsilon below
    zrow = jnp.einsum("fki,fi->fk", e, fz) * jnp.abs(inv_det)[:, None]
    # shift edge constants by a det-scaled epsilon so pixels exactly on
    # shared edges (e == 0) stay covered under either evaluation order
    # (matmul vs per-edge dot round differently; without this, watertight
    # meshes can drop single pixels on grid-aligned edges)
    e = e.at[:, 2, :].add(1e-4 * jnp.abs(det)[:, None])
    A = jnp.concatenate([e, zrow[:, :, None]], -1)          # (F, 3, 4)
    A = jnp.where(ok[:, None, None], A, 0.0)
    # scale edge rows so coverage test is scale-free; keep z row exact
    return A, ok, fw, det, fx, fy


def rasterize(v_clip: jax.Array, faces: jax.Array, f_valid: jax.Array,
              resolution: tuple[int, int], chunk: int = 256) -> Rast:
    """Rasterize (B, V, 4) clip-space vertices. Returns a `Rast`.

    The visibility search runs entirely under stop_gradient; uv is then
    recomputed differentiably for the winning faces.
    """
    height, width = resolution
    B = v_clip.shape[0]

    v_nd = lax.stop_gradient(v_clip)
    F = faces.shape[0]
    pad = (-F) % chunk
    if pad:
        faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], 0)
        f_valid_p = jnp.concatenate([f_valid, jnp.zeros((pad,), bool)], 0)
    else:
        faces_p, f_valid_p = faces, f_valid
    Fp = F + pad

    # pixel-center matrix, (P, 3)
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    px, py = jnp.meshgrid(xs, ys)                     # (H, W)
    P = jnp.stack([px.ravel(), py.ravel(), jnp.ones(height * width)], -1)

    def raster_one_global(vc):
        A, ok, _, _, _, _ = _face_coeffs(vc, faces_p, f_valid_p, height, width)
        A_chunks = A.reshape(Fp // chunk, chunk, 3, 4)
        ok_chunks = ok.reshape(Fp // chunk, chunk)
        base = jnp.arange(Fp // chunk, dtype=jnp.int32) * chunk

        def body(carry, inputs):
            best_z, best_id = carry
            A_c, ok_c, base_c = inputs
            E = (P @ A_c.transpose(1, 0, 2).reshape(3, -1)).reshape(-1, chunk, 4)
            cov = (E[..., :3] >= 0).all(-1) & ok_c[None, :]
            zc = jnp.where(cov, E[..., 3], jnp.inf)
            local = jnp.argmin(zc, axis=1).astype(jnp.int32)
            local_z = jnp.take_along_axis(zc, local[:, None], 1)[:, 0]
            take = local_z < best_z
            new_z = jnp.where(take, local_z, best_z)
            new_id = jnp.where(take, base_c + local + 1, best_id)
            return (new_z, new_id), None

        init = (jnp.full((height * width,), jnp.inf),
                jnp.zeros((height * width,), jnp.int32))
        (z, fid), _ = lax.scan(body, init, (A_chunks, ok_chunks, base))
        return z.reshape(height, width), fid.reshape(height, width)

    z, fid = jax.vmap(raster_one_global)(v_nd)
    z = jnp.where(fid > 0, z, 0.0)

    uv = compute_barycentrics(v_clip, faces, fid, (height, width))
    return Rast(uv=uv, z=z, face_id=fid)


def compute_barycentrics(v_clip: jax.Array, faces: jax.Array,
                         face_id: jax.Array,
                         resolution: tuple[int, int]) -> jax.Array:
    """Perspective-correct (u, v) for each pixel's winning face,
    differentiable w.r.t. v_clip (face assignment is fixed/stop-grad).
    """
    height, width = resolution
    B = v_clip.shape[0]
    fid = lax.stop_gradient(face_id)
    sel = jnp.maximum(fid - 1, 0)                       # (B, H, W)
    tri = faces[sel]                                    # (B, H, W, 3)

    def one(vc, tri_b):
        vv = vc[tri_b]                                  # (H, W, 3, 4)
        w = vv[..., 3]
        safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        sx = (vv[..., 0] / safe_w + 1.0) * (0.5 * width)
        sy = (vv[..., 1] / safe_w + 1.0) * (0.5 * height)

        ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]

        x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
        y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
        det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        l1 = ((xs - x0) * (y2 - y0) - (x2 - x0) * (ys - y0)) / safe_det
        l2 = ((x1 - x0) * (ys - y0) - (xs - x0) * (y1 - y0)) / safe_det
        l0 = 1.0 - l1 - l2
        # perspective correction: weight by 1/w and renormalize
        iw = 1.0 / safe_w
        denom = l0 * iw[..., 0] + l1 * iw[..., 1] + l2 * iw[..., 2]
        safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        u = l1 * iw[..., 1] / safe_denom
        v = l2 * iw[..., 2] / safe_denom
        return jnp.stack([u, v], -1)

    uv = jax.vmap(one)(v_clip, tri)
    return jnp.where((fid > 0)[..., None], uv, 0.0)


def resolve(attr: jax.Array, rast: Rast, v_clip: jax.Array,
            faces: jax.Array, face_attr: jax.Array | None = None):
    """Fused barycentrics + attribute interpolation (one per-pixel gather).

    Equivalent to `compute_barycentrics` followed by `interpolate`, but
    restructured around TPU gather cost (descriptor-bound, ~25 ns/row
    regardless of row width):

      1. clip positions + attributes pack into one per-vertex table whose
         row carries the whole batch — (V, B·C) — so the face-topology
         gather is batch-free: F·3 rows instead of B·F·3;
      2. the per-face table (B, F, 3·C) then serves each pixel with ONE
         row gather (B·H·W rows) instead of three per-vertex rows;
      3. optional `face_attr` (B, F, K) channels (e.g. geometric normals)
         ride in the same per-face row, replacing a separate pixel gather.

    The autodiff backward correspondingly emits one merged pixel
    scatter-add plus one batch-free face scatter.

    attr: (B, V, A) or (V, A) shared. Returns (uv (B,H,W,2), out (B,H,W,A))
    plus (B,H,W,K) if face_attr is given; all 0 on background.
    Differentiable w.r.t. v_clip, attr and face_attr; the face assignment
    is fixed (stop-grad), like nvdiffrast.
    """
    B, H, W = rast.face_id.shape
    if attr.ndim == 2:
        attr = jnp.broadcast_to(attr[None], (B, *attr.shape))
    nA = attr.shape[-1]
    nK = 0 if face_attr is None else face_attr.shape[-1]
    fid = lax.stop_gradient(rast.face_id)
    sel = jnp.maximum(fid - 1, 0)                       # (B, H, W)

    # Resolve-row strategy when the Pallas rasterizer threaded its chunk
    # structure through (`rast.bw_aux`):
    #   hybrid (DEFAULT on TPU): plain XLA row gather forward + Pallas
    #     one-hot-matmul BACKWARD (`resolve_grad_pallas`) replacing the
    #     colliding per-pixel scatter-add transpose (~106 ms/step).
    #     Device A/B (v5e, warm, interleaved): gather fwd 30.1-30.5 imgs/s
    #     recon vs 24.5-26.3 for the one-hot fwd — the fwd matmul needs
    #     precision=HIGHEST (Mosaic bf16 truncation, PERF_NOTES s5) whose
    #     multi-pass cost exceeds the 655k-row gather it replaced.
    #   mxu (A3D_MXU_FWD=1): one-hot matmul fwd AND bwd
    #     (`resolve_rows_pallas` + `resolve_grad_pallas`).
    #   gather (A3D_NO_MXU_BWD=1): plain autodiff gather/scatter-add.
    # NOTE: these env vars are read HERE, at trace time — set them before
    # the first jit compilation of a step; changing them afterwards is
    # silently ignored until the graph is retraced. They are A/B levers
    # for perf experiments, not runtime configuration.
    import os
    have_aux = (getattr(rast, "bw_aux", None) is not None
                and (jax.default_backend() == "tpu"
                     or os.environ.get("A3D_FORCE_MXU") == "1")
                and os.environ.get("A3D_NO_MXU_BWD") != "1")
    use_kernels = have_aux and os.environ.get("A3D_MXU_FWD") == "1"
    use_hybrid = have_aux and not use_kernels
    # pad attr channels so the per-face row width 3(4+nA)+nK is a multiple
    # of 8 (the kernels' sublane granularity); padded channels are never read
    nA_p = nA
    while (use_kernels or use_hybrid) and (3 * (4 + nA_p) + nK) % 8:
        nA_p += 1
    if nA_p != nA:
        attr = jnp.concatenate(
            [attr, jnp.zeros((*attr.shape[:-1], nA_p - nA), attr.dtype)], -1)
    C = 4 + nA_p
    V = v_clip.shape[1]
    F = faces.shape[0]
    pv = jnp.concatenate([v_clip, attr.astype(v_clip.dtype)], -1)
    tab = pv.transpose(1, 0, 2).reshape(V, B * C)
    pf = tab[faces].reshape(F, 3, B, C).transpose(2, 0, 1, 3) \
        .reshape(B, F, 3 * C)                           # (B, F, 3C)
    if face_attr is not None:
        pf = jnp.concatenate([pf, face_attr.astype(pf.dtype)], -1)

    if use_kernels:
        from animals3d_tpu.ops.rasterize_pallas import (TILE_H, TILE_W)
        ids_sorted, won = rast.bw_aux
        # channel-major rows in pixel-TILE order, straight off the kernel
        rT_all = _resolve_rows_cm(
            pf, sel.reshape(B, H * W), lax.stop_gradient(ids_sorted),
            lax.stop_gradient(won), (H, W))             # (B, R, T·TP)
        nty, ntx = H // TILE_H, W // TILE_W

        def tile_flat(a):                               # (H, W) -> (T·TP,)
            return a.reshape(nty, TILE_H, ntx, TILE_W) \
                .transpose(0, 2, 1, 3).reshape(-1)

        yg = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
        xg = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
        xs = tile_flat(jnp.broadcast_to(xg, (H, W)))
        ys = tile_flat(jnp.broadcast_to(yg, (H, W)))
        keep = (fid > 0).reshape(B, nty, TILE_H, ntx, TILE_W) \
            .transpose(0, 1, 3, 2, 4).reshape(B, 1, nty * ntx * TILE_H * TILE_W)

        def assemble(x, ch):                            # (B, ch, T·TP)
            return x.reshape(B, ch, nty, ntx, TILE_H, TILE_W) \
                .transpose(0, 2, 4, 3, 5, 1).reshape(B, H, W, ch)
    else:
        rT_all = None
        xs = ((jnp.arange(H * W, dtype=jnp.float32) % W) + 0.5)
        ys = ((jnp.arange(H * W, dtype=jnp.float32) // W) + 0.5)
        keep = (fid > 0).reshape(B, 1, H * W)

        def assemble(x, ch):                            # (B, ch, H·W)
            return x.transpose(0, 2, 1).reshape(B, H, W, ch)

        if use_hybrid:
            ids_sorted, won = rast.bw_aux
            rows_all = _resolve_rows_hybrid(
                pf, sel.reshape(B, H * W), lax.stop_gradient(ids_sorted),
                lax.stop_gradient(won), (H, W))
        else:
            rows_all = _row_gather(pf, sel.reshape(pf.shape[0], -1))

    def one(rT):
        # ALL barycentric math on pixel-minor arrays: channel-minor layouts
        # ((H, W, 3[,C])) run at 2-10% VPU lane occupancy
        def vch(vtx, c):
            return rT[vtx * C + c]

        w0, w1, w2 = vch(0, 3), vch(1, 3), vch(2, 3)
        s0 = jnp.where(jnp.abs(w0) > 1e-9, w0, 1e-9)
        s1 = jnp.where(jnp.abs(w1) > 1e-9, w1, 1e-9)
        s2 = jnp.where(jnp.abs(w2) > 1e-9, w2, 1e-9)
        x0 = (vch(0, 0) / s0 + 1.0) * (0.5 * W)
        x1 = (vch(1, 0) / s1 + 1.0) * (0.5 * W)
        x2 = (vch(2, 0) / s2 + 1.0) * (0.5 * W)
        y0 = (vch(0, 1) / s0 + 1.0) * (0.5 * H)
        y1 = (vch(1, 1) / s1 + 1.0) * (0.5 * H)
        y2 = (vch(2, 1) / s2 + 1.0) * (0.5 * H)
        det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        l1 = ((xs - x0) * (y2 - y0) - (x2 - x0) * (ys - y0)) / safe_det
        l2 = ((x1 - x0) * (ys - y0) - (xs - x0) * (y1 - y0)) / safe_det
        l0 = 1.0 - l1 - l2
        denom = l0 / s0 + l1 / s1 + l2 / s2
        safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        u = l1 / (s1 * safe_denom)
        v = l2 / (s2 * safe_denom)

        l0p = 1.0 - u - v
        out = jnp.stack([vch(0, 4 + c) * l0p + vch(1, 4 + c) * u
                         + vch(2, 4 + c) * v for c in range(nA)], 0)
        uv = jnp.stack([u, v], 0)                       # (2, pixels)
        return uv, out, rT[3 * C:]

    if use_kernels:
        uv, out, fa = jax.vmap(one)(rT_all)
    else:
        def one_rows(rows):
            # barrier: keeps the transpose from fusing INTO the gather (a
            # transposed gather write scatters each row across 3C+K cache
            # lines; traced at 41 ms vs ~17 ms gather + separate transpose)
            return one(lax.optimization_barrier(rows).T)

        uv, out, fa = jax.vmap(one_rows)(rows_all)
    uv = assemble(jnp.where(keep, uv, 0.0), 2)
    out = assemble(jnp.where(keep, out, 0.0), nA)
    if face_attr is None:
        return uv, out
    fa = assemble(jnp.where(keep, fa, 0.0), nK)
    return uv, out, fa


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _resolve_rows_cm(pf, sel, ids_sorted, won, resolution):
    """Channel-major tile-ordered resolve rows: forward AND transpose both
    run as Pallas one-hot matmuls over the rasterizer's winner-chunk
    (tile, chunk) pairs (`rasterize_pallas.resolve_rows_pallas` /
    `resolve_grad_pallas`) instead of XLA's 655k-row per-pixel gather /
    colliding scatter-add. Returns (B, R, T·TP) with R = pf.shape[-1];
    background pixels come out ZERO (callers mask them anyway)."""
    from animals3d_tpu.ops.rasterize_pallas import resolve_rows_pallas
    return resolve_rows_pallas(pf, sel, ids_sorted, won, resolution,
                               interpret=jax.default_backend() != "tpu")


def _rrc_fwd(pf, sel, ids_sorted, won, resolution):
    out = _resolve_rows_cm(pf, sel, ids_sorted, won, resolution)
    return out, (pf.shape, sel, ids_sorted, won)


def _rrc_bwd(resolution, res, g):
    from animals3d_tpu.ops.rasterize_pallas import (TILE_H, TILE_W,
                                                    resolve_grad_pallas)
    (B, F, R), sel, ids_sorted, won = res
    H, W = resolution
    nty, ntx = H // TILE_H, W // TILE_W
    # channel-major tile order -> the raster-order rows the grad kernel eats
    g_r = g.reshape(B, R, nty, ntx, TILE_H, TILE_W) \
        .transpose(0, 2, 4, 3, 5, 1).reshape(B, H * W, R)
    on_tpu = jax.default_backend() == "tpu"
    d_pf = resolve_grad_pallas(
        g_r, sel, ids_sorted, won, resolution, F,
        interpret=not on_tpu,
        compute_dtype=jnp.bfloat16 if on_tpu else None)
    return d_pf, None, None, None


_resolve_rows_cm.defvjp(_rrc_fwd, _rrc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _resolve_rows_hybrid(pf, sel, ids_sorted, won, resolution):
    """Raster-order resolve rows (B, H·W, R): plain XLA gather forward,
    Pallas one-hot-matmul backward. The gather is the faster forward on
    device (see `resolve`), while the backward replaces XLA's colliding
    per-pixel scatter-add with `resolve_grad_pallas` over the rasterizer's
    winner-chunk (tile, chunk) pairs — g arrives in exactly the raster
    order the grad kernel eats, so no relayout is needed.

    Contract (same as `resolve_rows_pallas`): background pixels carry
    sel=0 and therefore gather pf[0]'s rows in the forward, but the Pallas
    backward only scatters through winner chunks — callers MUST mask
    background pixels out downstream and guarantee their cotangent is
    exactly zero (`resolve` does via its keep mask), or the fwd/bwd pair
    is inconsistent at face 0."""
    return _row_gather(pf, sel)


def _row_gather(pf, sel):
    """One row of pf per pixel. A3D_PF_FLAT=1 gathers from a FLAT (B, F·R)
    view — REJECTED on device, kept as a negative-result lever.

    Motivation: the r5 device trace caught XLA layout-assigning pf to
    F-MINOR ({1,2,0} — cheap to BUILD from the (F,3,B,C) transpose), so
    each pixel row read is R strided cache lines (62.7 ns/row = 41 ms per
    step in both graphs) with a transposed output layout that
    `optimization_barrier` cannot prevent (barriers stop fusion, not
    layout assignment). A 1-D operand has no layout freedom, forcing
    row-contiguous pf and contiguous 192 B slices.
    Measured (v5e 2026-08-20, interleaved A/B n=8): recon +3.0% (the
    gather is DESCRIPTOR-issue-bound, ~60 ns/row regardless of stride,
    and the forced pf relayout adds cost) and train +377% (430 → 2050
    ms/step — the linear-layout pf collides with the bwd d_pf layout
    chain and XLA inserts massive relayouts). The strided F-minor gather
    is the right global layout choice; the per-pixel row gather is at its
    descriptor floor — fewer rows (foreground compaction), not cheaper
    rows, is the only remaining lever."""
    import os
    if os.environ.get("A3D_PF_FLAT", "0") != "1":
        return jax.vmap(lambda p, s: p[s])(pf, sel)
    B, F, R = pf.shape
    pfF = pf.reshape(B, F * R)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))

    def g1(p, s):
        return lax.gather(p, (s * R)[:, None], dn, slice_sizes=(R,),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    return jax.vmap(g1)(pfF, sel)


def _rrh_fwd(pf, sel, ids_sorted, won, resolution):
    out = _resolve_rows_hybrid(pf, sel, ids_sorted, won, resolution)
    return out, (pf.shape, sel, ids_sorted, won)


def _rrh_bwd(resolution, res, g):
    from animals3d_tpu.ops.rasterize_pallas import resolve_grad_pallas
    (B, F, R), sel, ids_sorted, won = res
    on_tpu = jax.default_backend() == "tpu"
    d_pf = resolve_grad_pallas(
        g, sel, ids_sorted, won, resolution, F,
        interpret=not on_tpu,
        compute_dtype=jnp.bfloat16 if on_tpu else None)
    return d_pf, None, None, None


_resolve_rows_hybrid.defvjp(_rrh_fwd, _rrh_bwd)


def interpolate(attr: jax.Array, rast: Rast, faces: jax.Array) -> jax.Array:
    """Interpolate per-vertex attributes at rasterized pixels.

    attr: (B, V, A) or (V, A) shared. Returns (B, H, W, A); 0 on background.
    Replaces `dr.interpolate` (`render.py:24-27`). Differentiable w.r.t.
    attr and, through `rast.uv`, vertex positions.
    """
    if attr.ndim == 2:
        attr = attr[None].repeat(rast.face_id.shape[0], 0)
    sel = jnp.maximum(lax.stop_gradient(rast.face_id) - 1, 0)
    tri = faces[sel]                                    # (B, H, W, 3)

    def one(attr_b, tri_b, uv_b, fid_b):
        av = attr_b[tri_b]                              # (H, W, 3, A)
        u = uv_b[..., 0:1]
        v = uv_b[..., 1:2]
        out = av[..., 0, :] * (1.0 - u - v) + av[..., 1, :] * u + av[..., 2, :] * v
        return jnp.where((fid_b > 0)[..., None], out, 0.0)

    return jax.vmap(one)(attr, tri, rast.uv, rast.face_id)


# ---------------------------------------------------------------------------
# Sorted-segment-sum backward for interpolate — an ALTERNATIVE to autodiff,
# kept for future tuning but NOT the default.
#
# The autodiff transpose of the per-pixel `attr[tri]` gather is an XLA
# scatter-add with H·W·3 colliding update rows per image. This custom VJP
# replaces it with sort + segmented scan + one unique-index `.set`. Measured
# on v5e at 256²×10 (B=10, V=98k): fwd+bwd 203 ms vs 198 ms autodiff — a
# wash at these shapes (XLA's TPU scatter-add is sort-based internally) —
# while compiling ~5x slower. Grad parity is tested; revisit if scatter
# shapes change (e.g. much larger V or A).
# ---------------------------------------------------------------------------

def _segment_sum_sorted(keys: jax.Array, vals: jax.Array,
                        num_segments: int) -> jax.Array:
    """Σ vals over rows with equal keys → (num_segments, A).

    keys: (M,) int32 (any order), vals: (M, A). Sort, then a *segmented*
    Hillis–Steele inclusive scan (adds at distance 2^s only when the key at
    that distance matches — exact for sorted keys, and unlike a global
    cumsum it never mixes segments, so there is no catastrophic cancellation
    from large-magnitude neighbors). Segment totals land at segment-end rows
    and are emitted with one unique-index `.set` scatter (non-end rows dump
    out of range, mode='drop') — no colliding scatter-add anywhere."""
    M = keys.shape[0]
    A = vals.shape[-1]
    perm = jnp.argsort(keys)
    keys_s = keys[perm]
    acc = jnp.take_along_axis(vals, perm[:, None], 0)

    step = 1
    while step < M:
        same = keys_s[step:] == keys_s[:-step]
        shifted = acc[:-step]
        add = jnp.where(same[:, None], shifted, 0.0)
        acc = jnp.concatenate([acc[:step], acc[step:] + add], 0)
        step *= 2

    is_end = jnp.concatenate(
        [keys_s[:-1] != keys_s[1:], jnp.ones((1,), bool)])
    # non-end rows dump to DISTINCT out-of-range slots so the
    # unique_indices promise holds (all indices differ, drops mask OOB)
    oob = num_segments + jnp.arange(M, dtype=keys_s.dtype)
    end_idx = jnp.where(is_end, keys_s, oob)
    return jnp.zeros((num_segments, A), vals.dtype).at[end_idx] \
        .set(acc, mode="drop", unique_indices=True)


@jax.custom_vjp
def _interpolate_cv(attr, uv, face_id, faces):
    sel = jnp.maximum(face_id - 1, 0)
    tri = faces[sel]

    def one(attr_b, tri_b, uv_b, fid_b):
        av = attr_b[tri_b]
        u = uv_b[..., 0:1]
        v = uv_b[..., 1:2]
        out = av[..., 0, :] * (1.0 - u - v) + av[..., 1, :] * u \
            + av[..., 2, :] * v
        return jnp.where((fid_b > 0)[..., None], out, 0.0)

    return jax.vmap(one)(attr, tri, uv, face_id)


def _interp_fwd(attr, uv, face_id, faces):
    return _interpolate_cv(attr, uv, face_id, faces), (attr, uv, face_id,
                                                       faces)


def _interp_bwd(res, g):
    attr, uv, face_id, faces = res
    B, V, A = attr.shape
    sel = jnp.maximum(face_id - 1, 0)
    tri = faces[sel]                                    # (B, H, W, 3)
    fg_mask = (face_id > 0)[..., None]
    g = jnp.where(fg_mask, g, 0.0)

    def one(attr_b, tri_b, uv_b, g_b):
        av = attr_b[tri_b]                              # (H, W, 3, A)
        u = uv_b[..., 0:1]
        v = uv_b[..., 1:2]
        # d_uv via the same per-pixel gather as the forward
        du = jnp.sum(g_b * (av[..., 1, :] - av[..., 0, :]), -1)
        dv = jnp.sum(g_b * (av[..., 2, :] - av[..., 0, :]), -1)
        d_uv = jnp.stack([du, dv], -1)
        # d_attr via sorted segment sum over (pixel, corner) rows
        w = jnp.concatenate([1.0 - u - v, u, v], -1)    # (H, W, 3)
        vals = (w[..., None] * g_b[..., None, :]).reshape(-1, A)
        keys = tri_b.reshape(-1)
        d_attr = _segment_sum_sorted(keys, vals, V)
        return d_attr, d_uv

    d_attr, d_uv = jax.vmap(one)(attr, tri, uv, g)
    return d_attr, d_uv, None, None


_interpolate_cv.defvjp(_interp_fwd, _interp_bwd)


def interpolate_sorted_bwd(attr: jax.Array, rast: Rast,
                           faces: jax.Array) -> jax.Array:
    """`interpolate` with the sorted-segment-sum backward (same forward)."""
    if attr.ndim == 2:
        attr = attr[None].repeat(rast.face_id.shape[0], 0)
    return _interpolate_cv(attr, rast.uv,
                           lax.stop_gradient(rast.face_id), faces)


@jax.custom_vjp
def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather (B, N, C) × (B, ..., ) int32 → (B, ..., C) whose
    transpose is the sorted-segment-sum instead of XLA's colliding
    scatter-add (see `_segment_sum_sorted`)."""
    def one(t, i):
        return t[i]
    return jax.vmap(one)(table, idx)


def _gather_rows_fwd(table, idx):
    return gather_rows(table, idx), (idx, table.shape)


def _gather_rows_bwd(res, g):
    idx, (B, N, C) = res

    def one(i_b, g_b):
        return _segment_sum_sorted(i_b.reshape(-1),
                                   g_b.reshape(-1, C), N)

    return jax.vmap(one)(idx, g), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
