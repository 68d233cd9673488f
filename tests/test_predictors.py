"""Predictor smoke tests on tiny shapes (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry import tets as tetlib
from animals3d_tpu.geometry.tets import DeviceTetGrid
from animals3d_tpu.predictors import (
    ArticulationConfig, BasePredictor, BasePredictorConfig, DeformConfig,
    DINOConfig, InstancePredictor, InstancePredictorConfig, PoseConfig,
    ShapeConfig, TextureConfig, ViTEncoderConfig,
)

GRID_RES = 8
V_CAP, F_CAP = 1024, 2048


def _base_cfg():
    return BasePredictorConfig(
        cfg_shape=ShapeConfig(grid_res=GRID_RES, spatial_scale=7.0,
                              num_layers=2, hidden_size=32, embedder_freq=4,
                              init_sdf="ellipsoid", jitter_grid=0.05,
                              symmetrize=True),
        cfg_dino=DINOConfig(feature_dim=4, num_layers=2, hidden_size=32))


def _instance_cfg():
    return InstancePredictorConfig(
        cfg_encoder=ViTEncoderConfig(cout=32, frozen=True),
        cfg_texture=TextureConfig(cout=9, num_layers=2, hidden_size=32,
                                  kd_minmax=((0., 1.),) * 3, symmetrize=True),
        cfg_pose=PoseConfig(rot_rep="quadlookat", fov=25.0,
                            cam_pos_z_offset=10.0,
                            max_trans_xy_range_ratio=0.2,
                            max_trans_z_range_ratio=0.5, lookat_zeroy=True),
        spatial_scale=7.0,
        enable_deform=True,
        cfg_deform=DeformConfig(num_layers=2, hidden_size=32),
        enable_articulation=True,
        cfg_articulation=ArticulationConfig(
            architecture="attention", num_layers=1, hidden_size=32,
            bone_feature_mode="sample+global", num_body_bones=8,
            body_bones_mode="z_minmax_y+", num_legs=4, num_leg_bones=3,
            skinning_temperature=0.05, max_arti_angle=60.0,
            constrain_legs=True, output_multiplier=0.1),
        enable_lighting=True,
    )


def test_base_predictor_mesh_and_regs():
    grid_np = tetlib.load_tet_grid(GRID_RES, data_dir="/tmp/tets_cache")
    grid = DeviceTetGrid(grid_np)
    model = BasePredictor(cfg=_base_cfg())
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, grid, V_CAP, F_CAP,
                        method=BasePredictor.init_all)["params"]

    mesh, sdf = model.apply({"params": params}, grid, V_CAP, F_CAP, 100,
                            jax.random.PRNGKey(1))
    assert int(mesh.num_verts) > 0
    v = np.asarray(mesh.v_pos[0])[np.asarray(mesh.v_valid)]
    # ellipsoid init: shape near the analytic ellipsoid, elongated in z
    assert np.abs(v[:, 0]).max() < 2.5 and np.abs(v[:, 2]).max() < 4.5

    regs = model.apply({"params": params}, grid, sdf, mesh,
                       jax.random.PRNGKey(2), method=BasePredictor.sdf_reg_losses)
    assert np.isfinite(float(regs["sdf_bce_reg_loss"]))
    assert np.isfinite(float(regs["sdf_gradient_reg_loss"]))

    # dino field on a few points
    feats = model.apply({"params": params}, jnp.zeros((2, 5, 3)),
                        method=BasePredictor.dino_field)
    assert feats.shape == (2, 5, 4)
    assert (np.asarray(feats) >= 0).all() and (np.asarray(feats) <= 1).all()


def test_instance_predictor_forward():
    grid_np = tetlib.load_tet_grid(GRID_RES, data_dir="/tmp/tets_cache")
    grid = DeviceTetGrid(grid_np)
    base = BasePredictor(cfg=_base_cfg())
    bparams = base.init(jax.random.PRNGKey(0), grid, V_CAP, F_CAP,
                        method=BasePredictor.init_all)["params"]
    prior_mesh, _ = base.apply({"params": bparams}, grid, V_CAP, F_CAP)

    model = InstancePredictor(cfg=_instance_cfg())
    B, F = 2, 1
    images = jnp.zeros((B, F, 3, 64, 64)) + 0.5
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, images, prior_mesh, 5000, jax.random.PRNGKey(1),
                        method=InstancePredictor.init_all)["params"]

    from animals3d_tpu.phase import Phase
    out = model.apply({"params": params}, images, prior_mesh, 5000,
                      jax.random.PRNGKey(2),
                      Phase(deform_on=True, articulation_on=True,
                            constrain_legs=True, zeroy=True))
    (shape, pose_raw, pose, mvp, w2c, campos, feat_out, feat_key,
     deformation, arti_params, light_params, aux) = out
    N = B * F
    assert pose_raw.shape == (N, 6)
    assert pose.shape == (N, 12)
    assert mvp.shape == (N, 4, 4) and w2c.shape == (N, 4, 4)
    assert campos.shape == (N, 3)
    assert feat_out.shape == (N, 32)
    assert deformation.shape == (N, V_CAP, 3)
    assert arti_params.shape == (B, F, 20, 3)
    assert light_params.shape == (N, 5)
    assert shape.v_pos.shape == (N, V_CAP, 3)
    # rotation is orthonormal
    R = np.asarray(pose[:, :9]).reshape(N, 3, 3)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.eye(3)[None].repeat(N, 0), atol=1e-5)
    # camera sits ~z_offset away
    assert np.allclose(np.linalg.norm(np.asarray(campos), axis=-1), 10.0,
                       atol=2.5)
    # articulation constrained
    assert np.abs(np.asarray(arti_params)).max() <= np.pi / 3 + 1e-5
    # light params: direction normalized, upper hemisphere
    lp = np.asarray(light_params)
    np.testing.assert_allclose(np.linalg.norm(lp[:, :3], axis=-1), 1.0,
                               atol=1e-5)
    assert (lp[:, 1] > 0).all()


def test_forward_pose_rot_reps():
    """euler/quaternion/lookat decode branches
    (`InstancePredictorBase.py:158-177, 261-276`)."""
    import dataclasses
    B = 2
    images = jnp.zeros((B, 1, 3, 64, 64)) + 0.5
    for rep, cout in [("euler_angle", 6), ("quaternion", 7), ("lookat", 6)]:
        cfg = _instance_cfg()
        cfg = dataclasses.replace(
            cfg, cfg_pose=dataclasses.replace(cfg.cfg_pose, rot_rep=rep))
        model = InstancePredictor(cfg=cfg)

        def pose_only(m, images):
            f_out, f_key, p_out, p_key = m.forward_encoder(images)
            return m.forward_pose(p_out, p_key, zeroy=True)

        params = model.init(jax.random.PRNGKey(0), images,
                            method=pose_only)["params"]
        pose = model.apply({"params": params}, images, method=pose_only)
        assert pose.shape == (B, cout), (rep, pose.shape)
        p = np.asarray(pose)
        if rep == "euler_angle":
            assert np.abs(p[:, :3]).max() <= np.pi + 1e-6
        elif rep == "quaternion":
            np.testing.assert_allclose(
                np.linalg.norm(p[:, :4], axis=-1), 1.0, atol=1e-5)
            assert (p[:, 0] >= 0).all()      # real part non-negative
        else:
            np.testing.assert_allclose(
                np.linalg.norm(p[:, :3], axis=-1), 1.0, atol=1e-5)
            np.testing.assert_allclose(p[:, 1], 0.0, atol=1e-6)  # zeroy
        # hypothesis sampling matches the reference assert (`:672`)
        try:
            model.apply({"params": params}, pose, 1000, jax.random.PRNGKey(0),
                        False, method=InstancePredictor.sample_pose_hypothesis)
            raise AssertionError("expected NotImplementedError")
        except NotImplementedError:
            pass


def test_articulation_refine():
    """Refine pass re-predicts articulation from POSED bones
    (`InstancePredictorBase.py:219-233, 529-541`)."""
    import dataclasses
    grid_np = tetlib.load_tet_grid(GRID_RES, data_dir="/tmp/tets_cache")
    grid = DeviceTetGrid(grid_np)
    base = BasePredictor(cfg=_base_cfg())
    bparams = base.init(jax.random.PRNGKey(0), grid, V_CAP, F_CAP,
                        method=BasePredictor.init_all)["params"]
    prior_mesh, _ = base.apply({"params": bparams}, grid, V_CAP, F_CAP)

    from animals3d_tpu.phase import Phase
    outs = {}
    for delta in (False, True):
        cfg = _instance_cfg()
        cfg = dataclasses.replace(
            cfg, cfg_articulation=dataclasses.replace(
                cfg.cfg_articulation, enable_refine=True,
                refine_feature_mode="dino_global+dino_sample",
                predict_delta=delta))
        model = InstancePredictor(cfg=cfg)
        B = 2
        images = jnp.linspace(0.2, 0.8, B * 3 * 64 * 64).reshape(B, 1, 3, 64, 64)
        params = model.init(jax.random.PRNGKey(0), images, prior_mesh, 5000,
                            jax.random.PRNGKey(1),
                            method=InstancePredictor.init_all)["params"]
        assert "netArticulationRefine" in params
        out = model.apply({"params": params}, images, prior_mesh, 5000,
                          jax.random.PRNGKey(2),
                          Phase(deform_on=False, articulation_on=True,
                                constrain_legs=True, zeroy=True))
        arti = out[9]
        assert arti.shape == (B, 1, 20, 3)
        assert np.isfinite(np.asarray(arti)).all()
        outs[delta] = np.asarray(arti)
    # the two refine modes produce different articulations
    assert not np.allclose(outs[False], outs[True])


def test_texture_sampling():
    model = InstancePredictor(cfg=_instance_cfg())
    # init via texture path only
    tex_pos = jnp.zeros((2, 8, 8, 3))
    feat = jnp.zeros((2, 32))
    params = model.init(jax.random.PRNGKey(0), tex_pos, feat,
                        method=InstancePredictor.sample_texture)["params"]
    out = model.apply({"params": params}, tex_pos, feat,
                      method=InstancePredictor.sample_texture)
    assert out.shape == (2, 8, 8, 9)
    kd = np.asarray(out[..., :3])
    assert (kd >= 0).all() and (kd <= 1).all()
