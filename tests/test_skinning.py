import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry import skinning as sk


def _quadruped_cloud(n=2000, seed=0):
    """Ellipsoid body + 4 leg stubs, roughly animal-shaped."""
    rng = np.random.default_rng(seed)
    body = rng.normal(size=(n, 3)).astype(np.float32)
    body /= np.linalg.norm(body, axis=-1, keepdims=True)
    body *= np.array([0.5, 0.6, 1.5])          # x thin, z long
    legs = []
    for sx in (1, -1):
        for sz in (1, -1):
            leg = rng.uniform(-0.08, 0.08, (n // 8, 3)).astype(np.float32)
            leg[:, 1] = rng.uniform(-1.6, -0.3, n // 8)
            leg[:, 0] += 0.45 * sx
            leg[:, 2] += 1.0 * sz
            legs.append(leg)
    return np.concatenate([body] + legs, 0).astype(np.float32)


def test_estimate_bones_structure():
    pts = _quadruped_cloud()
    verts = jnp.asarray(pts)[None, None]
    valid = jnp.ones(pts.shape[0], bool)
    bones, structure = sk.estimate_bones(verts, valid, n_body_bones=8,
                                         n_legs=4, n_leg_bones=3)
    bones = np.asarray(bones)
    assert bones.shape == (1, 1, 20, 2, 3)
    # body joints on the symmetry plane
    assert np.abs(bones[0, 0, :8, :, 0]).max() < 1e-5
    # leg chains end at low-y feet (leaf bone endpoint 1 is the foot:
    # bones are (joint_{i+1}, joint_i) pairs, joint 0 = foot)
    feet_y = bones[0, 0, [8, 11, 14, 17], 1, 1]
    assert (feet_y < -1.2).all()
    # feet land in distinct quadrants
    feet = bones[0, 0, [8, 11, 14, 17], 1]
    quads = {(int(np.sign(f[0])), int(np.sign(f[2]))) for f in feet}
    assert len(quads) == 4
    # ancestor matrix: every row ends with its own bone id
    anc = np.asarray(structure.ancestors)
    for k in range(20):
        row = anc[k][anc[k] >= 0]
        assert row[-1] == k
    # mirrored legs attach to the same body bone
    bi = np.asarray(structure.body_bone_idx)
    assert bi[0] == bi[3] and bi[1] == bi[2]


def test_zero_articulation_is_identity():
    pts = _quadruped_cloud()
    verts = jnp.asarray(pts)[None, None]
    valid = jnp.ones(pts.shape[0], bool)
    bones, structure = sk.estimate_bones(verts, valid, 8, 4, 3)
    angles = jnp.zeros((1, 1, 20, 3))
    posed, aux = sk.skinning(verts, bones, structure, angles,
                             temperature=0.05)
    np.testing.assert_allclose(np.asarray(posed), pts[None, None], atol=1e-4)
    w = np.asarray(aux["vertices_to_bones"])
    np.testing.assert_allclose(w.sum(0), 1.0, atol=1e-5)


def _skinning_oracle(v, bones, anc, angles, temperature):
    """Direct reference-semantics numpy skinning (chain walk per bone)."""
    K = bones.shape[0]
    d = np.stack([
        np.asarray(sk.line_segment_distance(
            jnp.asarray(bones[k, 0]), jnp.asarray(bones[k, 1]),
            jnp.asarray(v)))
        for k in range(K)])
    w = np.exp(-d / temperature)
    w /= w.sum(0, keepdims=True)

    def local(k):
        R_rest = np.asarray(sk._estimate_bone_rotation(
            jnp.asarray(bones[k, 1] - bones[k, 0])))
        Rp = np.asarray(sk.euler_angles_to_matrix(jnp.asarray(angles[k])))
        rest = np.eye(4); rest[:3, :3] = R_rest; rest[:3, 3] = bones[k, 0]
        rot = np.eye(4); rot[:3, :3] = Rp
        return rest @ rot @ np.linalg.inv(rest)

    out = np.zeros_like(v)
    for k in range(K):
        M = np.eye(4)
        for a in anc[k]:
            if a >= 0:
                M = M @ local(a)
        hom = np.concatenate([v, np.ones_like(v[:, :1])], -1)
        out += w[k][:, None] * (hom @ M.T)[:, :3]
    return out


def test_skinning_matches_chain_oracle():
    rng = np.random.default_rng(3)
    pts = _quadruped_cloud(800)
    verts = jnp.asarray(pts)[None, None]
    valid = jnp.ones(pts.shape[0], bool)
    bones, structure = sk.estimate_bones(verts, valid, 8, 4, 3)
    angles = rng.uniform(-0.4, 0.4, (1, 1, 20, 3)).astype(np.float32)
    posed, _ = sk.skinning(verts, bones, structure, jnp.asarray(angles),
                           temperature=0.05)
    want = _skinning_oracle(pts, np.asarray(bones)[0, 0],
                            np.asarray(structure.ancestors),
                            angles[0, 0], 0.05)
    np.testing.assert_allclose(np.asarray(posed)[0, 0], want, atol=2e-4)


def test_skinning_gradients():
    pts = _quadruped_cloud(500)
    verts = jnp.asarray(pts)[None, None]
    valid = jnp.ones(pts.shape[0], bool)
    bones, structure = sk.estimate_bones(verts, valid, 8, 4, 3)

    def loss(angles):
        posed, _ = sk.skinning(verts, bones, structure, angles,
                               temperature=0.05)
        return jnp.sum(posed ** 2)

    g = jax.grad(loss)(jnp.full((1, 1, 20, 3), 0.1))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_jit_and_batch():
    pts = _quadruped_cloud(600)
    verts = jnp.asarray(np.stack([pts, pts * 1.02]))[:, None]   # B=2, F=1
    valid = jnp.ones(pts.shape[0], bool)

    @jax.jit
    def run(v):
        bones, structure = sk.estimate_bones(v[:1, :1], valid, 8, 4, 3)
        angles = jnp.full((2, 1, 20, 3), 0.05)
        posed, _ = sk.skinning(v, bones, structure, angles, temperature=0.05)
        return posed

    out = run(verts)
    assert out.shape == (2, 1, 600 + 4 * 75, 3)


def test_sample_farthest_points_spread_and_mask():
    rng = np.random.default_rng(3)
    # two tight clusters far apart; FPS must alternate between them early
    a = rng.normal(0, 0.01, (40, 3)) + np.array([5.0, 0, 0])
    b = rng.normal(0, 0.01, (40, 3)) - np.array([5.0, 0, 0])
    pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))[None]
    out, sel = sk.sample_farthest_points(pts, 8)
    s = np.asarray(sel[0])
    assert len(set(s.tolist())) == 8                      # no duplicates
    signs = np.sign(np.asarray(out[0, :, 0]))
    assert (signs > 0).any() and (signs < 0).any()        # both clusters hit

    # masked points are never selected
    valid = np.ones(80, bool)
    valid[:40] = False                                    # cluster a invalid
    _, sel_m = sk.sample_farthest_points(pts, 8, valid=jnp.asarray(valid)[None])
    assert (np.asarray(sel_m[0]) >= 40).all()


def test_estimate_bones_resample():
    pts = _quadruped_cloud(600)
    verts = jnp.asarray(pts)[None, None]
    valid = jnp.ones(pts.shape[0], bool)
    bones, structure = sk.estimate_bones(verts, valid, 8, 4, 3, resample=True)
    assert bones.shape == (1, 1, 20, 2, 3)
    # subsampled skeleton should land near the full-set skeleton
    bones_full, _ = sk.estimate_bones(verts, valid, 8, 4, 3)
    assert np.abs(np.asarray(bones) - np.asarray(bones_full)).max() < 0.5


def test_axis_angle_roundtrip():
    """Rodrigues conversions used by canonicalization viewpoint interp."""
    import numpy as np
    import jax.numpy as jnp
    from animals3d_tpu.geometry.skinning import (axis_angle_to_matrix,
                                                 euler_angles_to_matrix,
                                                 matrix_to_axis_angle)
    rng = np.random.default_rng(0)
    v = rng.normal(0, 1.0, (16, 3)).astype(np.float32)
    R = axis_angle_to_matrix(jnp.asarray(v))
    # proper rotations: R Rᵀ = I, det 1
    eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    v2 = np.asarray(matrix_to_axis_angle(R))
    R2 = np.asarray(axis_angle_to_matrix(jnp.asarray(v2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)
    # zero rotation edge case
    z = np.asarray(matrix_to_axis_angle(jnp.eye(3)))
    np.testing.assert_allclose(z, 0.0, atol=1e-7)
    # euler → matrix → axis-angle → matrix consistency
    e = euler_angles_to_matrix(jnp.asarray([0.0, -2.0944, 0.0]), "XYZ")
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(matrix_to_axis_angle(e))),
        np.asarray(e), atol=1e-5)
