"""Analytic silhouette antialiasing — the mask-gradient path.

Replaces `dr.antialias` (used at `/root/reference/model/render/render.py:258-268`).
nvdiffrast's antialias is the *only* place where gradients w.r.t. vertex
positions exist across visibility discontinuities: for every pair of adjacent
pixels whose triangle assignment differs across a silhouette, it computes
where the silhouette edge crosses the segment between the two pixel centers
and blends colors by the sub-pixel overhang; the blend factor is an analytic,
differentiable function of the edge's screen-space vertex positions.

This implementation reproduces that scheme with two vectorized passes
(horizontal + vertical neighbor pairs) instead of per-pixel CUDA atomics:

  * a pair is a silhouette crossing iff the ids differ and either one side is
    background or the depth gap exceeds `z_tol` (the reference detects true
    silhouette edges via a mesh-topology hash; the depth test is an
    equivalent-in-practice, topology-free criterion — shared interior edges
    have continuous depth and are skipped);
  * the "inside" pixel is the background-free / nearer one; its triangle's
    sign-corrected edge functions are evaluated at both pixel centers, and the
    first crossed edge gives the crossing parameter t ∈ (0, 1) along
    inside→outside;
  * t > 1/2: the edge overhangs into the outside pixel, which is blended
    toward the inside color with weight t − 1/2; t ≤ 1/2: the inside pixel is
    partially uncovered and blended toward the outside color with weight
    1/2 − t. Exactly nvdiffrast's rule.

Everything is jnp; gradients flow to `v_clip` through the edge functions.

Two implementations share the blend math:

  * `antialias_dense` — evaluates edge functions for every pixel pair
    (2·H·W per image). Simple, but the per-pixel triangle/vertex gathers
    (12 floats/pixel) and their scatter-add transposes dominated the render
    tail on TPU (123 ms fwd / ~215 ms bwd at 256²×10).
  * `antialias` (default) — detects silhouette pairs from (face_id, z) only
    (pure VPU), prefix-compacts them to a capacity-bounded slot list
    (cumsum + batched binary search, same trick as marching tets), and does
    the differentiable edge-function work and color blending only for those
    ~O(H) pairs. Gathers and the backward scatter-adds shrink from H·W·3
    rows to `pair_cap` rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from animals3d_tpu.ops.dmtet import first_geq
from animals3d_tpu.ops.rasterize import Rast


def _edge_functions(v_clip, faces, fid, resolution):
    """Sign-corrected edge coefficient rows for each pixel's triangle.

    Returns (a, b, c): each (B, H, W, 3) so that edge i's function at screen
    point (x, y) is a[...,i]*x + b[...,i]*y + c[...,i]; >= 0 inside.
    """
    H, W = resolution
    sel = jnp.maximum(lax.stop_gradient(fid) - 1, 0)
    tri = faces[sel]                                   # (B, H, W, 3)

    def one(vc, tri_b):
        vv = vc[tri_b]                                 # (H, W, 3, 4)
        w = vv[..., 3]
        safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        sx = (vv[..., 0] / safe_w + 1.0) * (0.5 * W)
        sy = (vv[..., 1] / safe_w + 1.0) * (0.5 * H)
        x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
        y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
        det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        sgn = jnp.where(det >= 0, 1.0, -1.0)[..., None]
        a = jnp.stack([y1 - y2, y2 - y0, y0 - y1], -1) * sgn
        b = jnp.stack([x2 - x1, x0 - x2, x1 - x0], -1) * sgn
        c = jnp.stack([x1 * y2 - x2 * y1, x2 * y0 - x0 * y2,
                       x0 * y1 - x1 * y0], -1) * sgn
        return a, b, c

    return jax.vmap(one)(v_clip, tri)


def _pair_blend(inside_is_first, e_in_p, e_in_q, valid):
    """Crossing parameter + blend weights for one neighbor-pair family.

    e_in_p / e_in_q: (..., 3) inside-triangle edge functions at the first (p)
    and second (q) pixel center of the pair, already oriented so the *inside*
    pixel has all >= 0. Returns (w_to_first, w_to_second): how much of the
    *other* pixel's color flows into each.
    """
    # first edge crossed walking inside -> outside
    e_in = jnp.where(inside_is_first[..., None], e_in_p, e_in_q)
    e_out = jnp.where(inside_is_first[..., None], e_in_q, e_in_p)
    crossing = e_out < 0
    denom = e_in - e_out
    t_i = e_in / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t_i = jnp.where(crossing, t_i, jnp.inf)
    t = jnp.min(t_i, axis=-1)
    has_crossing = jnp.isfinite(t) & valid
    t = jnp.clip(jnp.where(has_crossing, t, 0.5), 0.0, 1.0)

    w_outside = jnp.maximum(t - 0.5, 0.0)   # outside pixel takes inside color
    w_inside = jnp.maximum(0.5 - t, 0.0)    # inside pixel takes outside color
    w_outside = jnp.where(has_crossing, w_outside, 0.0)
    w_inside = jnp.where(has_crossing, w_inside, 0.0)

    # translate (inside, outside) weights to (first, second) pixels
    w_to_first = jnp.where(inside_is_first, w_inside, w_outside)
    w_to_second = jnp.where(inside_is_first, w_outside, w_inside)
    return w_to_first, w_to_second


def antialias_dense(color: jax.Array, rast: Rast, v_clip: jax.Array,
                    faces: jax.Array, z_tol: float = 2e-3) -> jax.Array:
    """Antialias `color` (B, H, W, C) at silhouettes. Differentiable in
    v_clip (silhouette position) and color."""
    B, H, W, _ = color.shape
    fid = rast.face_id
    z = jnp.where(fid > 0, rast.z, jnp.inf)
    ea, eb, ec = _edge_functions(v_clip, faces, fid, (H, W))

    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, None, :, None]
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5)[None, :, None, None]

    out = color

    for axis in (2, 1):                         # horizontal, then vertical
        sl_p = (slice(None),) * axis + (slice(0, -1),)
        sl_q = (slice(None),) * axis + (slice(1, None),)

        fid_p, fid_q = fid[sl_p], fid[sl_q]
        z_p, z_q = z[sl_p], z[sl_q]
        differs = fid_p != fid_q
        any_bg = (fid_p == 0) | (fid_q == 0)
        depth_gap = jnp.abs(z_p - z_q) > z_tol
        both_bg = (fid_p == 0) & (fid_q == 0)
        valid = differs & (any_bg | depth_gap) & ~both_bg

        inside_is_first = jnp.where(fid_q == 0, True,
                                    jnp.where(fid_p == 0, False, z_p < z_q))

        # inside triangle's edge functions at both centers
        ea_in = jnp.where(inside_is_first[..., None], ea[sl_p], ea[sl_q])
        eb_in = jnp.where(inside_is_first[..., None], eb[sl_p], eb[sl_q])
        ec_in = jnp.where(inside_is_first[..., None], ec[sl_p], ec[sl_q])
        x_p = jnp.broadcast_to(xs, (B, H, W, 1))[sl_p][..., 0]
        y_p = jnp.broadcast_to(ys, (B, H, W, 1))[sl_p][..., 0]
        x_q = jnp.broadcast_to(xs, (B, H, W, 1))[sl_q][..., 0]
        y_q = jnp.broadcast_to(ys, (B, H, W, 1))[sl_q][..., 0]
        e_p = ea_in * x_p[..., None] + eb_in * y_p[..., None] + ec_in
        e_q = ea_in * x_q[..., None] + eb_in * y_q[..., None] + ec_in

        w_first, w_second = _pair_blend(inside_is_first, e_p, e_q, valid)

        delta_pq = color[sl_q] - color[sl_p]    # what flows into first pixel
        contrib_first = w_first[..., None] * delta_pq
        contrib_second = -w_second[..., None] * delta_pq

        pad_lo = [(0, 0)] * 4
        pad_hi = [(0, 0)] * 4
        pad_lo[axis] = (0, 1)                   # first-pixel contributions
        pad_hi[axis] = (1, 0)                   # second-pixel contributions
        out = out + jnp.pad(contrib_first, pad_lo) + jnp.pad(contrib_second, pad_hi)

    return out


def silhouette_pair_count(rast: Rast, z_tol: float = 2e-3) -> jax.Array:
    """(B,) number of silhouette pixel pairs the compacted `antialias` must
    hold. Diagnostic for the `pair_cap` budget: counts above
    `default_pair_cap(H, W)` mean overflow pairs (in raster order) silently
    lose their silhouette gradient — monitor at training shapes."""
    fid = lax.stop_gradient(rast.face_id)
    z = jnp.where(fid > 0, lax.stop_gradient(rast.z), jnp.inf)

    def pair_valid(fid_p, fid_q, z_p, z_q):
        differs = fid_p != fid_q
        any_bg = (fid_p == 0) | (fid_q == 0)
        both_bg = (fid_p == 0) & (fid_q == 0)
        depth_gap = jnp.abs(z_p - z_q) > z_tol
        return differs & (any_bg | depth_gap) & ~both_bg

    vh = pair_valid(fid[..., :-1], fid[..., 1:], z[..., :-1], z[..., 1:])
    vv = pair_valid(fid[:, :-1], fid[:, 1:], z[:, :-1], z[:, 1:])
    return vh.sum((-2, -1)) + vv.sum((-2, -1))


def default_pair_cap(height: int, width: int) -> int:
    """Silhouette-pair slot capacity: ~16 pairs per image row covers several
    disjoint silhouettes (animal body + 4 legs against body) with slack;
    rounded up to a lane multiple."""
    cap = 16 * max(height, width)
    return -(-cap // 128) * 128


def antialias(color: jax.Array, rast: Rast, v_clip: jax.Array,
              faces: jax.Array, z_tol: float = 2e-3,
              pair_cap: int | None = None) -> jax.Array:
    """Compacted antialias: identical semantics to `antialias_dense` as long
    as the number of silhouette pixel pairs per image fits in `pair_cap`
    (overflow pairs — in raster order — are dropped, weakening a few
    silhouette gradients but never corrupting covered pixels).

    Differentiable in `color` and `v_clip`; the pair *detection* is discrete
    and runs under stop_gradient.
    """
    B, H, W, C = color.shape
    K = pair_cap if pair_cap is not None else default_pair_cap(H, W)
    n_pix = H * W

    fid = lax.stop_gradient(rast.face_id)
    z = jnp.where(fid > 0, lax.stop_gradient(rast.z), jnp.inf)
    fid_f = fid.reshape(B, n_pix)
    z_f = z.reshape(B, n_pix)

    # ---- pair validity over the flattened (axis, pixel) pair space --------
    def pair_valid(fid_p, fid_q, z_p, z_q):
        differs = fid_p != fid_q
        any_bg = (fid_p == 0) | (fid_q == 0)
        both_bg = (fid_p == 0) & (fid_q == 0)
        depth_gap = jnp.abs(z_p - z_q) > z_tol
        return differs & (any_bg | depth_gap) & ~both_bg

    # horizontal pairs: p = (y, x), q = (y, x+1); x = W-1 never valid
    vh = pair_valid(fid[..., :-1], fid[..., 1:], z[..., :-1], z[..., 1:])
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, 1)))
    # vertical pairs: p = (y, x), q = (y+1, x); y = H-1 never valid
    vv_ = pair_valid(fid[:, :-1], fid[:, 1:], z[:, :-1], z[:, 1:])
    vv_ = jnp.pad(vv_, ((0, 0), (0, 1), (0, 0)))
    valid = jnp.concatenate([vh.reshape(B, n_pix), vv_.reshape(B, n_pix)], -1)

    # ---- prefix-compact valid pairs into K slots per image ----------------
    csum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)      # (B, 2·n_pix)
    targets = jnp.arange(1, K + 1, dtype=jnp.int32)
    pair_idx = jax.vmap(lambda cs: first_geq(cs, targets))(csum)   # (B, K)
    slot_ok = targets[None, :] <= csum[:, -1:]
    pair_idx = jnp.where(slot_ok, pair_idx, 0)

    is_vert = pair_idx >= n_pix
    p_lin = jnp.where(is_vert, pair_idx - n_pix, pair_idx)    # (B, K)
    q_lin = p_lin + jnp.where(is_vert, W, 1)
    q_lin = jnp.minimum(q_lin, n_pix - 1)

    take = lambda a, idx: jnp.take_along_axis(a, idx, axis=1)
    fid_p, fid_q = take(fid_f, p_lin), take(fid_f, q_lin)
    z_p, z_q = take(z_f, p_lin), take(z_f, q_lin)

    inside_is_first = jnp.where(fid_q == 0, True,
                                jnp.where(fid_p == 0, False, z_p < z_q))
    fid_in = jnp.where(inside_is_first, fid_p, fid_q)
    tri = faces[jnp.maximum(fid_in - 1, 0)]                   # (B, K, 3)

    # ---- differentiable edge functions of the inside triangle -------------
    def edge_coeffs(vc, tri_b):
        vv = vc[tri_b]                                        # (K, 3, 4)
        w = vv[..., 3]
        safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        sx = (vv[..., 0] / safe_w + 1.0) * (0.5 * W)
        sy = (vv[..., 1] / safe_w + 1.0) * (0.5 * H)
        x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
        y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
        det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        sgn = jnp.where(det >= 0, 1.0, -1.0)[..., None]
        a = jnp.stack([y1 - y2, y2 - y0, y0 - y1], -1) * sgn
        b = jnp.stack([x2 - x1, x0 - x2, x1 - x0], -1) * sgn
        c = jnp.stack([x1 * y2 - x2 * y1, x2 * y0 - x0 * y2,
                       x0 * y1 - x1 * y0], -1) * sgn
        return a, b, c

    ea, eb, ec = jax.vmap(edge_coeffs)(v_clip, tri)           # (B, K, 3)

    x_p = (p_lin % W).astype(jnp.float32) + 0.5
    y_p = (p_lin // W).astype(jnp.float32) + 0.5
    x_q = (q_lin % W).astype(jnp.float32) + 0.5
    y_q = (q_lin // W).astype(jnp.float32) + 0.5
    e_p = ea * x_p[..., None] + eb * y_p[..., None] + ec
    e_q = ea * x_q[..., None] + eb * y_q[..., None] + ec

    w_first, w_second = _pair_blend(inside_is_first, e_p, e_q, slot_ok)

    # ---- gather colors, scatter blended deltas -----------------------------
    color_f = color.reshape(B, n_pix, C)
    c_p = jnp.take_along_axis(color_f, p_lin[..., None], axis=1)
    c_q = jnp.take_along_axis(color_f, q_lin[..., None], axis=1)
    delta = c_q - c_p                                         # (B, K, C)

    def scatter_one(cf, p_i, q_i, wf, ws, d):
        out = cf.at[p_i].add(wf[:, None] * d)
        return out.at[q_i].add(-ws[:, None] * d)

    out = jax.vmap(scatter_one)(color_f, p_lin, q_lin, w_first, w_second,
                                delta)
    return out.reshape(B, H, W, C)
