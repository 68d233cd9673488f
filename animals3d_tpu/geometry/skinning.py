"""Heuristic skeleton estimation + linear blend skinning, TPU-native.

Reference: `/root/reference/model/geometry/skinning.py` (estimate_bones
`:50-248`, skinning `:369-439`). Re-designed for XLA:

  * the reference finds leg feet with a python loop over (b, f) and
    `torch.argmin` on boolean-masked point sets (`:177-199`); here every
    selection is a vectorized masked argmin/nanquantile, so bone estimation
    runs *inside* the jitted train step (the reference re-estimates every
    epoch — Fauna every iteration — with host sync);
  * the kinematic chain is encoded as a root-first ancestor matrix
    (K, D) of bone ids (-1 = identity padding). Forward kinematics is a
    product of gathered per-bone local transforms along the depth axis —
    K·D tiny 4×4 matmuls instead of the reference's per-bone python chain
    walk (`:389-417`). Leg attachment indices are traced scalars, so the
    whole skeleton stays in-graph;
  * vertex capacities: invalid (padding) vertices are excluded from all
    statistics via the `v_valid` mask.

Skeleton layout (matching the reference): body bones 0..n_body-1 — chain a
(head side, +z) bones 0..h-1 leaf→mid with root h-1, chain b (tail side)
bones h..n_body-1 with root n_body-1; then 4 legs × n_leg bones, leaf
(foot) first. Legs attach to the body joint closest in z to the foot
(`:188-190`), mirrored for the -x legs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def line_segment_distance(a, b, points, sqrt=True):
    """Distance from `points` (..., V, 3) to segments [a, b] (..., 3)
    (reference `geometry/util.py:30-53`)."""
    ab = b - a
    ap = points - a[..., None, :]
    t = jnp.sum(ap * ab[..., None, :], -1) / jnp.maximum(
        jnp.sum(ab * ab, -1)[..., None], 1e-6)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a[..., None, :] + t[..., None] * ab[..., None, :]
    d2 = jnp.sum((points - proj) ** 2, -1)
    return jnp.sqrt(d2 + 1e-6) if sqrt else d2


def sample_farthest_points(pts, k: int, valid=None, start=None):
    """Farthest-point subsample: (B, N, 3) → ((B, k, 3), (B, k) indices).

    Reference `geometry/util.py:5-27` (channel-first (B, 3, N) layout,
    random start via `torch.randint`). TPU redesign: static k, lax.fori_loop
    with an (B, N) running-min distance carry, optional validity mask
    (invalid points can never be selected), deterministic first-valid start
    unless `start` (B,) indices are given. NOTE: the reference's production
    path never enables FPS (`estimate_bones(resample=False)` at every call
    site, `InstancePredictorBase.py:321,330`), so this exists for API parity
    and for callers that want cheaper bone estimation on huge meshes.
    """
    B, N, _ = pts.shape
    if valid is None:
        valid = jnp.ones((B, N), bool)
    big = jnp.asarray(1e30, pts.dtype)
    if start is None:
        start = jnp.argmax(valid, axis=1).astype(jnp.int32)   # first valid

    sel = jnp.zeros((B, k), jnp.int32).at[:, 0].set(start)
    first = jnp.take_along_axis(pts, start[:, None, None], 1)  # (B,1,3)
    dist = jnp.linalg.norm(pts - first, axis=-1)
    dist = jnp.where(valid, dist, -big)                        # never picked

    def body(i, carry):
        dist, sel = carry
        idx = jnp.argmax(dist, axis=1).astype(jnp.int32)
        sel = sel.at[:, i].set(idx)
        p = jnp.take_along_axis(pts, idx[:, None, None], 1)
        d_new = jnp.linalg.norm(pts - p, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d_new, -big))
        return dist, sel

    _, sel = lax.fori_loop(1, k, body, (dist, sel))
    out = jnp.take_along_axis(pts, sel[..., None], 1)
    return out, sel


def euler_angles_to_matrix(angles, convention: str = "XYZ"):
    """(..., 3) Euler angles → (..., 3, 3), matching PyTorch3D semantics
    (vendored by the reference at `skinning.py:285-340`)."""
    def axis_rot(axis, t):
        c, s = jnp.cos(t), jnp.sin(t)
        one, zero = jnp.ones_like(t), jnp.zeros_like(t)
        if axis == "X":
            rows = (one, zero, zero, zero, c, -s, zero, s, c)
        elif axis == "Y":
            rows = (c, zero, s, zero, one, zero, -s, zero, c)
        else:
            rows = (c, -s, zero, s, c, zero, zero, zero, one)
        return jnp.stack(rows, -1).reshape(*t.shape, 3, 3)

    mats = [axis_rot(ax, angles[..., i]) for i, ax in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def matrix_to_axis_angle(R):
    """(..., 3, 3) rotation → (..., 3) axis-angle (PyTorch3D semantics —
    the reference uses it to interpolate viewpoints in canonicalization,
    `visualize_results.py:523-546`)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    angle = jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
    axis = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                      R[..., 0, 2] - R[..., 2, 0],
                      R[..., 1, 0] - R[..., 0, 1]], -1)
    sin = jnp.sin(angle)[..., None]
    # near angle=0 the axis is arbitrary; the scaled vector → 0 smoothly
    safe = jnp.where(jnp.abs(sin) > 1e-6, sin * 2.0, 1.0)
    unit = jnp.where(jnp.abs(sin) > 1e-6, axis / safe, axis * 0.5)
    return unit * jnp.where(jnp.abs(sin[..., 0]) > 1e-6,
                            angle, 1.0)[..., None]


def axis_angle_to_matrix(v):
    """(..., 3) axis-angle → (..., 3, 3) via Rodrigues."""
    angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
    axis = v / jnp.maximum(angle, 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], -1) \
        .reshape(*x.shape, 3, 3)
    a = angle[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * (K @ K)


class BoneStructure(NamedTuple):
    """Static-shape kinematic structure."""
    ancestors: jax.Array      # (K, D) int32, root-first path ending at self; -1 pad
    n_body_bones: int
    n_legs: int
    n_leg_bones: int
    body_bone_idx: jax.Array  # (4,) int32 — leg attachment body bones (traced)


def _estimate_bone_rotation(forward):
    """Rest-pose bone frame: z = bone direction, seeded with x-right
    (`skinning.py:251-270`)."""
    fwd = forward / jnp.maximum(jnp.linalg.norm(forward, axis=-1, keepdims=True), 1e-12)
    right0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], forward.dtype), fwd.shape)
    up = jnp.cross(fwd, right0)
    up = up / jnp.maximum(jnp.linalg.norm(up, axis=-1, keepdims=True), 1e-12)
    right = jnp.cross(up, fwd)
    return jnp.stack([right, up, fwd], -1)      # columns: right, up, forward


def _masked_nanquantile(x, valid, q):
    x = jnp.where(valid, x, jnp.nan)
    return jnp.nanquantile(x, q)


def estimate_bones(verts: jax.Array, v_valid: jax.Array, n_body_bones: int,
                   n_legs: int = 4, n_leg_bones: int = 0,
                   body_bones_mode: str = "z_minmax_y+",
                   attach_legs_to_body: bool = True,
                   bone_y_threshold: Optional[float] = None,
                   legs_to_body_joint_indices=None,
                   resample: bool = False):
    """Estimate bones from (B, F, V, 3) vertices. Returns
    (bones (B, F, K, 2, 3), BoneStructure). All outputs stop-gradient.

    resample: FPS-subsample to V//4 points first (reference
    `skinning.py:65-68`; OFF at every reference call site — the full
    vertex set is the parity default)."""
    verts = lax.stop_gradient(verts)
    B, F, V, _ = verts.shape
    valid = jnp.broadcast_to(v_valid[None, None, :], (B, F, V))
    if resample:
        flat = verts.reshape(B * F, V, 3)
        fval = valid.reshape(B * F, V)
        sub, sel = sample_farthest_points(flat, max(V // 4, 1), valid=fval)
        verts = sub.reshape(B, F, -1, 3)
        valid = jnp.take_along_axis(fval, sel, 1).reshape(B, F, -1)
        V = verts.shape[2]
    big = 1e6

    xs, ys, zs = verts[..., 0], verts[..., 1], verts[..., 2]
    denom = jnp.maximum(valid.sum(-1), 1)
    mid_point = (verts * valid[..., None]).sum(2) / denom[..., None]  # (B,F,3)

    if body_bones_mode == "z_minmax":
        za = jnp.where(valid, zs, -big)
        point_a = jnp.take_along_axis(verts, jnp.argmax(za, 2)[..., None, None]
                                      .repeat(3, -1), 2)[:, :, 0]
        zb = jnp.where(valid, zs, big)
        point_b = jnp.take_along_axis(verts, jnp.argmin(zb, 2)[..., None, None]
                                      .repeat(3, -1), 2)[:, :, 0]
    elif body_bones_mode == "z_minmax_y+":
        # extremes in z restricted to the upper body (y above mid - 0.5)
        upper = ys > (mid_point[..., None, 1] - 0.5)
        ok = valid & upper
        za = jnp.where(ok, zs, -big)
        point_a = jnp.take_along_axis(verts, jnp.argmax(za, 2)[..., None, None]
                                      .repeat(3, -1), 2)[:, :, 0]
        zb = jnp.where(ok, zs, big)
        point_b = jnp.take_along_axis(verts, jnp.argmin(zb, 2)[..., None, None]
                                      .repeat(3, -1), 2)[:, :, 0]
    else:
        raise NotImplementedError(body_bones_mode)

    # snap ends and mid to the x=0 symmetry plane
    point_a = point_a.at[..., 0].set(0.0)
    point_b = point_b.at[..., 0].set(0.0)
    mid_point = mid_point.at[..., 0].set(0.0)
    if n_leg_bones > 0:
        mid_point = mid_point.at[..., 1].add(0.5)

    assert n_body_bones % 2 == 0
    half = n_body_bones // 2
    n_joints = n_body_bones + 1
    blend = jnp.linspace(0.0, 1.0, -(-n_joints // 2))[None, None, :, None]
    joints_a = point_a[:, :, None] * (1 - blend) + mid_point[:, :, None] * blend
    joints_b = point_b[:, :, None] * blend + mid_point[:, :, None] * (1 - blend)
    joints = jnp.concatenate([joints_a[:, :, :-1], joints_b], 2)  # (B,F,J,3)

    # body bones: a-side (j+1 → j), b-side (j → j+1), matching `:119-134`
    b2j = [(i + 1, i) for i in range(half)] + \
        [(i, i + 1) for i in range(n_body_bones - 1, half - 1, -1)]
    body_bones = jnp.stack(
        [jnp.stack([joints[:, :, a], joints[:, :, b]], 2) for a, b in b2j], 2)

    if n_leg_bones == 0:
        ancestors = _body_ancestors(n_body_bones)
        structure = BoneStructure(jnp.asarray(ancestors, jnp.int32),
                                  n_body_bones, 0, 0,
                                  jnp.zeros((4,), jnp.int32))
        return lax.stop_gradient(body_bones), structure

    assert n_legs == 4
    # quadrant masks (top-down view: 0:(+x,+z) 1:(+x,-z) 2:(-x,-z) 3:(-x,+z))
    if bone_y_threshold is None:
        x_margin = (_masked_nanquantile(xs, valid, 0.95)
                    - _masked_nanquantile(xs, valid, 0.05)) * 0.2
        x0 = jnp.zeros(())
        z0 = jnp.zeros(())
        z_margin = jnp.zeros(())
        leg_region = valid
    else:
        y_thr = _masked_nanquantile(ys, valid, bone_y_threshold)
        leg_region = valid & (ys < y_thr)
        x0 = _masked_nanquantile(xs, leg_region, 0.5)
        z0 = _masked_nanquantile(zs, leg_region, 0.5)
        x_margin = (_masked_nanquantile(xs, leg_region, 0.95)
                    - _masked_nanquantile(xs, leg_region, 0.05)) * 0.2
        z_margin = (_masked_nanquantile(zs, leg_region, 0.95)
                    - _masked_nanquantile(zs, leg_region, 0.05)) * 0.2

    dzp = (zs - z0 > z_margin) if bone_y_threshold is not None else (zs > 0)
    dzn = zs < z0 if bone_y_threshold is not None else (zs < 0)
    quadrants = [
        valid & (xs - x0 > x_margin) & dzp,
        valid & (xs - x0 > x_margin) & dzn,
        valid & (xs - x0 < -x_margin) & dzn,
        valid & (xs - x0 < -x_margin) & dzp,
    ]

    if legs_to_body_joint_indices is not None:
        fixed_idx = list(legs_to_body_joint_indices)
    else:
        fixed_idx = [None, None, None, None]

    leg_bones_all = []
    body_idx_all = []
    for li, quad in enumerate(quadrants):
        # foot: lowest-y point in the quadrant (fallback: global lowest)
        has_pts = quad.any(-1, keepdims=True)
        mask = jnp.where(has_pts, quad, valid)
        yq = jnp.where(mask, ys, big)
        foot = jnp.take_along_axis(verts, jnp.argmin(yq, 2)[..., None, None]
                                   .repeat(3, -1), 2)[:, :, 0]   # (B,F,3)
        # attachment body bone: end joint closest in z to foot of batch (0,0)
        if fixed_idx[li] is not None:
            body_idx = jnp.asarray(fixed_idx[li], jnp.int32)
        elif li == 2:
            body_idx = body_idx_all[1]
        elif li == 3:
            body_idx = body_idx_all[0]
        else:
            dz = jnp.abs(body_bones[0, 0, :, 1, 2] - foot[0, 0, 2])
            body_idx = jnp.argmin(dz).astype(jnp.int32)
        body_idx_all.append(body_idx)

        body_joint = body_bones[:, :, body_idx, 1]               # (B,F,3)
        blend_l = jnp.linspace(0.0, 1.0, n_leg_bones + 1)[None, None, :, None]
        leg_joints = foot[:, :, None] * (1 - blend_l) + body_joint[:, :, None] * blend_l
        # leg bones leaf-first: (j+1 → j) over the leg joint chain
        lb = jnp.stack([jnp.stack([leg_joints[:, :, i + 1], leg_joints[:, :, i]], 2)
                        for i in range(n_leg_bones)], 2)
        leg_bones_all.append(lb)

    bones = jnp.concatenate([body_bones] + leg_bones_all, 2)
    body_idx_arr = jnp.stack(body_idx_all)

    ancestors = _full_ancestors(n_body_bones, n_legs, n_leg_bones,
                                body_idx_arr, attach_legs_to_body)
    structure = BoneStructure(ancestors, n_body_bones, n_legs, n_leg_bones,
                              body_idx_arr)
    return lax.stop_gradient(bones), structure


def _body_ancestors(n_body_bones: int) -> np.ndarray:
    """Static root-first paths for body bones; (n_body, half) with -1 pad."""
    half = n_body_bones // 2
    A = -np.ones((n_body_bones, half), np.int32)
    for j in range(n_body_bones):
        root = half - 1 if j < half else n_body_bones - 1
        path = list(range(root, j - 1, -1))
        A[j, :len(path)] = path
    return A


def _full_ancestors(n_body: int, n_legs: int, n_leg: int, body_idx: jax.Array,
                    attach: bool) -> jax.Array:
    """(K, D) ancestor matrix; leg rows depend on traced attachment ids."""
    half = n_body // 2
    D = half + n_leg
    K = n_body + n_legs * n_leg
    body = jnp.asarray(
        np.concatenate([_body_ancestors(n_body),
                        -np.ones((n_body, n_leg), np.int32)], 1))

    t = jnp.arange(half, dtype=jnp.int32)

    def body_path_of(k):
        root = jnp.where(k < half, half - 1, n_body - 1)
        vals = root - t
        return jnp.where(vals >= k, vals, -1)

    rows = [body]
    for li in range(n_legs):
        s = n_body + li * n_leg
        k = body_idx[li]
        bp = body_path_of(k) if attach else -jnp.ones((half,), jnp.int32)
        for i in range(n_leg):
            suffix = -np.ones((n_leg,), np.int32)
            chain = list(range(s + n_leg - 1, s + i - 1, -1))
            suffix[:len(chain)] = chain
            rows.append(jnp.concatenate([bp, jnp.asarray(suffix)])[None])
    return jnp.concatenate(rows, 0).astype(jnp.int32)


def compute_bone_transforms(bones, structure: BoneStructure, angles):
    """Per-bone world transforms via ancestor-path composition.

    bones: (B, F, K, 2, 3); angles: (B, F, K, 3) Euler XYZ.
    Returns (B, F, K, 4, 4).
    """
    B, F, K = angles.shape[:3]
    joint = bones[..., 0, :]                         # (B,F,K,3)
    bone_vec = bones[..., 1, :] - bones[..., 0, :]
    R_rest = _estimate_bone_rotation(bone_vec)       # (B,F,K,3,3)

    R_pred = euler_angles_to_matrix(angles, "XYZ")   # (B,F,K,3,3)

    # local transform L = rest @ rot @ rest^-1 (as 4x4 with translation)
    # rest = [R_rest | joint]; rest^-1 = [R^T | -R^T joint]
    Rt = jnp.swapaxes(R_rest, -1, -2)
    M3 = R_rest @ R_pred @ Rt
    tr = joint - jnp.einsum("...ij,...j->...i", M3, joint)
    L = jnp.zeros((B, F, K, 4, 4), bones.dtype)
    L = L.at[..., :3, :3].set(M3)
    L = L.at[..., :3, 3].set(tr)
    L = L.at[..., 3, 3].set(1.0)

    # compose along root-first ancestor paths; -1 gathers an identity slot
    eye = jnp.broadcast_to(jnp.eye(4, dtype=bones.dtype), (B, F, 1, 4, 4))
    L_ext = jnp.concatenate([L, eye], 2)             # slot K = identity
    anc = jnp.where(structure.ancestors < 0, K, structure.ancestors)  # (K,D)

    M = jnp.broadcast_to(jnp.eye(4, dtype=bones.dtype), (B, F, K, 4, 4))
    for d in range(anc.shape[1]):
        M = M @ L_ext[:, :, anc[:, d]]
    return M


def skinning(v_pos, bones, structure: BoneStructure, angles,
             output_posed_bones: bool = False, temperature: float = 1.0,
             v_valid: Optional[jax.Array] = None):
    """Linear blend skinning (`skinning.py:369-439`).

    v_pos: (B, F, V, 3) or (1, 1, V, 3) canonical vertices;
    angles: (B, F, K, 3). Returns (posed (B, F, V, 3), aux dict).
    """
    B, F, K = angles.shape[:3]
    if bones.shape[0] != B or bones.shape[1] != F:
        bones = jnp.broadcast_to(bones, (B, F, *bones.shape[2:]))
    if v_pos.shape[0] != B or v_pos.shape[1] != F:
        v_pos = jnp.broadcast_to(v_pos, (B, F, *v_pos.shape[2:]))

    # vertex-to-bone weights: softmax(-segment distance / T) over bones
    d = jax.vmap(lambda bk: line_segment_distance(
        bk[..., 0, :], bk[..., 1, :], lax.stop_gradient(v_pos)),
        in_axes=2, out_axes=0)(bones)                # (K, B, F, V)
    w = jax.nn.softmax(-d / temperature, axis=0)     # (K, B, F, V)

    M = compute_bone_transforms(bones, structure, angles)   # (B,F,K,4,4)

    # blended transform per vertex: sum_k w_k M_k  (linear blend skinning)
    M_blend = jnp.einsum("kbfv,bfkij->bfvij", w, M)
    hom = jnp.concatenate([v_pos, jnp.ones_like(v_pos[..., :1])], -1)
    posed = jnp.einsum("bfvij,bfvj->bfvi", M_blend, hom)[..., :3]
    if v_valid is not None:
        posed = jnp.where(v_valid[None, None, :, None], posed, v_pos)

    aux = {"bones_pred": bones, "vertices_to_bones": w}
    if output_posed_bones:
        bones_hom = jnp.concatenate(
            [bones, jnp.ones_like(bones[..., :1])], -1)      # (B,F,K,2,4)
        posed_bones = jnp.einsum("bfkij,bfkej->bfkei", M, bones_hom)[..., :3]
        aux["posed_bones"] = posed_bones
    return posed, aux
