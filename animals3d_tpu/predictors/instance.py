"""Instance predictor: image → (pose, deformation, articulation, texture, light).

Reference: `InstancePredictorBase`
(`/root/reference/model/predictors/InstancePredictorBase.py:119-698`).
Functional redesign notes:

  * the DINO encoder is a flax submodule returning block-11 keys directly
    (no forward hooks); frozen via stop_gradient + optimizer masking;
  * multi-hypothesis pose sampling uses explicit rng keys; the reference's
    `randperm(N)/N < p` exploration trick (`:641-648`) becomes a Bernoulli(p)
    draw — same distribution in expectation;
  * iteration-dependent *architecture* gates (deform/articulation on/off)
    are static python bools (`enable_deform_now` / `enable_articulation_now`)
    — at most 4 phase graphs ever compile; smooth schedules (temperature
    annealing, hypothesis-probability blending) stay traced;
  * bone estimation runs fully in-graph every step (see geometry.skinning);
    the reference recomputes the kinematic tree per epoch with host sync.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry import skinning as sk
from animals3d_tpu.geometry.mesh import Mesh, make_mesh
from animals3d_tpu.networks.articulation import ArticulationNetwork
from animals3d_tpu.networks.encoders import Encoder32
from animals3d_tpu.networks.mlp import CoordMLP
from animals3d_tpu.networks.vit import DinoViT
from animals3d_tpu.ops.image import grid_sample_bilinear
from animals3d_tpu.phase import Phase
from animals3d_tpu.predictors.config import InstancePredictorConfig
from animals3d_tpu.render.camera import perspective
from animals3d_tpu.render.light import DirectionalLight

_ORTHANT_SIGNS = {
    "quadlookat": np.array([[1, 1, 1], [-1, 1, 1], [-1, 1, -1], [1, 1, -1]],
                           np.float32),
    "octlookat": np.stack(np.meshgrid(*[np.arange(1, -2, -2)] * 3,
                                      indexing="ij"), -1).reshape(-1, 3)
    .astype(np.float32),
}


def lookat_forward_to_rot_matrix(vec_forward, up=(0, 1, 0)):
    """(`InstancePredictorBase.py:706-714`) rows: right, up, forward."""
    up = jnp.asarray(up, vec_forward.dtype)
    right = jnp.cross(jnp.broadcast_to(up, vec_forward.shape), vec_forward)
    right = right / jnp.maximum(
        jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-12)
    vup = jnp.cross(vec_forward, right)
    vup = vup / jnp.maximum(jnp.linalg.norm(vup, axis=-1, keepdims=True), 1e-12)
    return jnp.stack([right, vup, vec_forward], -2)


def softplus_with_init(x, init=0.5):
    beta = np.log(2.0) / init
    return jax.nn.softplus(x * beta) / beta


class ViTEncoder(nn.Module):
    """Frozen DINO + two Encoder32 heads (`encoders.py:148-261`)."""
    cout: int = 256
    which_vit: str = "dino_vits8"
    frozen: bool = True
    final_layer_type: str = "conv"

    @property
    def vit_feat_dim(self):
        return 768 if self.which_vit == "dino_vitb8" else 384

    @property
    def patch_size(self):
        return 8

    def setup(self):
        heads = 6 if self.which_vit == "dino_vits8" else 12
        self.ViT = DinoViT(patch_size=self.patch_size, dim=self.vit_feat_dim,
                           num_heads=heads, name="ViT")
        if self.final_layer_type == "conv":
            self.final_layer_patch_out = Encoder32(self.cout,
                                                   name="final_layer_patch_out")
            self.final_layer_patch_key = Encoder32(self.cout,
                                                   name="final_layer_patch_key")

    def __call__(self, images):
        # images: (N, 3, H, W) already rescaled to (-1, 1) by the caller
        N, _, H, W = images.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        tokens, key11 = self.ViT(images)
        if self.frozen:
            tokens = jax.lax.stop_gradient(tokens)
            key11 = jax.lax.stop_gradient(key11)
        patch_out = tokens[:, 1:].reshape(N, ph, pw, -1).transpose(0, 3, 1, 2)
        # (N, heads, T, hd) → (N, heads*hd, ph, pw); channel order matches the
        # reference permute(0,1,3,2).reshape (`encoders.py:248-249`)
        pk = key11[:, :, 1:].transpose(0, 1, 3, 2).reshape(N, -1, ph, pw)
        if self.final_layer_type == "conv":
            g_out = self.final_layer_patch_out(patch_out)
            g_key = self.final_layer_patch_key(pk)
        elif self.final_layer_type == "none":
            g_out = tokens[:, 0]
            g_key = key11[:, :, 0].reshape(N, -1)
        else:
            raise NotImplementedError(self.final_layer_type)
        return g_out, g_key, patch_out, pk

    def class_token(self, images):
        """Frozen class token of the final norm (`BasePredictorBank.
        forward_frozen_ViT`, `BasePredictorBank.py:106-131`)."""
        tokens, _ = self.ViT(images)
        return jax.lax.stop_gradient(tokens[:, 0])


class InstancePredictor(nn.Module):
    cfg: InstancePredictorConfig

    @property
    def num_pose_hypos(self) -> int:
        return 8 if self.cfg.cfg_pose.rot_rep == "octlookat" else 4

    @property
    def num_bones(self) -> int:
        a = self.cfg.cfg_articulation
        return a.num_body_bones + a.num_legs * a.num_leg_bones

    def setup(self):
        cfg = self.cfg
        scalar = 2 * np.pi / cfg.spatial_scale * 0.9
        enc_dim = cfg.cfg_encoder.cout

        self.netEncoder = ViTEncoder(
            cout=enc_dim, which_vit=cfg.cfg_encoder.which_vit,
            frozen=cfg.cfg_encoder.frozen,
            final_layer_type=cfg.cfg_encoder.final_layer_type)
        vit_feat_dim = self.netEncoder.vit_feat_dim

        tex = cfg.cfg_texture
        tex_minmax = tuple(map(tuple, tex.kd_minmax)) + \
            tuple(map(tuple, tex.ks_minmax)) + tuple(map(tuple, tex.nrm_minmax))
        self.netTexture = CoordMLP(
            3, tex.cout, tex.num_layers, nf=tex.hidden_size,
            activation=tex.activation, min_max=tex_minmax,
            n_harmonic_functions=tex.embedder_freq, embedder_scalar=scalar,
            embed_concat_pts=tex.embed_concat_pts, extra_feat_dim=enc_dim,
            symmetrize=tex.symmetrize, in_layer_relu=tex.in_layer_relu)

        pose = cfg.cfg_pose
        half_range = np.tan(pose.fov / 2 / 180 * np.pi) * pose.cam_pos_z_offset
        self.max_trans_xyz_range = np.array([
            pose.max_trans_xy_range_ratio, pose.max_trans_xy_range_ratio,
            pose.max_trans_z_range_ratio], np.float32) * half_range
        # pose head width per rotation representation
        # (`InstancePredictorBase.py:158-177`)
        if pose.rot_rep == "euler_angle":
            pose_cout = 6                 # 3 rotation + 3 translation
            self.max_rot_xyz_range = np.array(
                [pose.max_rot_x_range, pose.max_rot_y_range,
                 pose.max_rot_z_range], np.float32) / 180.0 * np.pi
        elif pose.rot_rep == "quaternion":
            pose_cout = 7                 # 4 quaternion + 3 translation
        elif pose.rot_rep == "lookat":
            pose_cout = 6                 # 3 forward vector + 3 translation
        elif pose.rot_rep in ("quadlookat", "octlookat"):
            pose_cout = 4 * self.num_pose_hypos + 3
        else:
            raise NotImplementedError(pose.rot_rep)
        self.netPose = Encoder32(cout=pose_cout, nf=256)

        if cfg.enable_deform:
            d = cfg.cfg_deform
            self.netDeform = CoordMLP(
                3, 3, d.num_layers, nf=d.hidden_size, activation=None,
                min_max=None, n_harmonic_functions=d.embedder_freq,
                embedder_scalar=scalar, embed_concat_pts=d.embed_concat_pts,
                extra_feat_dim=enc_dim, symmetrize=d.symmetrize)

        if cfg.enable_articulation:
            a = cfg.cfg_articulation
            feat_dim = {"global": enc_dim, "sample": vit_feat_dim,
                        "sample+global": vit_feat_dim + enc_dim}[a.bone_feature_mode]
            self.netArticulation = ArticulationNetwork(
                a.architecture, feat_dim, posenc_dim=1 + 2 + 3 * 2,
                num_layers=a.num_layers, nf=a.hidden_size,
                n_harmonic_functions=a.embedder_freq,
                embedder_scalar=np.pi * 0.9,
                enable_articulation_idadd=a.enable_articulation_idadd)
            if a.enable_refine:
                # second articulation pass conditioned on the POSED bones
                # (`InstancePredictorBase.py:219-233`)
                refine_dim = 0
                if "dino_global" in a.refine_feature_mode:
                    refine_dim += enc_dim
                if "dino_sample" in a.refine_feature_mode:
                    refine_dim += vit_feat_dim
                self.netArticulationRefine = ArticulationNetwork(
                    a.architecture, refine_dim, posenc_dim=1 + 2 + 3 * 2,
                    num_layers=a.num_layers, nf=a.hidden_size,
                    n_harmonic_functions=a.embedder_freq,
                    embedder_scalar=np.pi * 0.9,
                    enable_articulation_idadd=a.enable_articulation_idadd)

        if cfg.enable_lighting:
            li = cfg.cfg_light
            self.netLight = DirectionalLight(
                mlp_layers=li.num_layers, mlp_hidden_size=li.hidden_size,
                intensity_min_max=tuple(map(tuple, li.amb_diff_minmax)))

    # ------------------------------------------------------------------
    def forward_encoder(self, images):
        """images: (B, F, 3, H, W) in [0,1] → features over N = B·F."""
        imgs = images.reshape(-1, *images.shape[2:]) * 2 - 1
        return self.netEncoder(imgs)

    def forward_pose(self, patch_out, patch_key, zeroy=None):
        cfg = self.cfg.cfg_pose
        if zeroy is None:
            zeroy = cfg.lookat_zeroy
        feat = patch_key if cfg.architecture == "encoder_dino_patch_key" \
            else patch_out
        pose = self.netPose(feat)                              # (N, cout)
        trans = jnp.tanh(pose[..., -3:]) * jnp.asarray(self.max_trans_xyz_range)

        if cfg.rot_rep == "euler_angle":
            # (`InstancePredictorBase.py:261-262`) tanh-bounded xyz angles
            rot_pred = jnp.tanh(pose[..., :3]) * jnp.asarray(
                self.max_rot_xyz_range)
            return jnp.concatenate([rot_pred, trans], -1)      # (N, 6)
        if cfg.rot_rep == "quaternion":
            # (`:264-269`) init-shifted, normalized, real part >= 0
            quat = pose[..., :4] + jnp.asarray([0.01, 0.0, 0.0, 0.0])
            quat = quat / jnp.maximum(
                jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
            rot_pred = quat * jnp.sign(quat[..., :1])
            return jnp.concatenate([rot_pred, trans], -1)      # (N, 7)
        if cfg.rot_rep == "lookat":
            # (`:271-276`) single normalized forward vector
            fwd = pose[..., :3]
            if zeroy:
                fwd = fwd * jnp.asarray([1.0, 0.0, 1.0])
            fwd = fwd / jnp.maximum(
                jnp.linalg.norm(fwd, axis=-1, keepdims=True), 1e-12)
            return jnp.concatenate([fwd, trans], -1)           # (N, 6)

        K = self.num_pose_hypos
        rots = pose[..., :K * 4].reshape(-1, K, 4)
        logits = rots[..., :1]
        fwd = rots[..., 1:4]
        xs, ys, zs = fwd[..., 0], fwd[..., 1], fwd[..., 2]
        xs = softplus_with_init(xs, 0.5)
        if cfg.rot_rep == "octlookat":
            ys = softplus_with_init(ys, 0.5)
        if zeroy:
            ys = ys * 0
        zs = softplus_with_init(zs, 0.5)
        fwd = jnp.stack([xs, ys, zs], -1) * jnp.asarray(
            _ORTHANT_SIGNS[cfg.rot_rep][:K])
        fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd, axis=-1, keepdims=True),
                                1e-12)
        rot_pred = jnp.concatenate([logits, fwd], -1).reshape(-1, K * 4)
        return jnp.concatenate([rot_pred, trans], -1)          # (N, K*4+3)

    def sample_pose_hypothesis(self, poses_raw, total_iter, rng,
                               random_sample: bool):
        """(`InstancePredictorBase.py:622-663`) softmax(-logits/T) with
        annealed T, uniform blending, optional exploration."""
        cfg = self.cfg.cfg_pose
        if cfg.rot_rep not in ("quadlookat", "octlookat"):
            # the reference's multi-hypothesis forward asserts the same
            # (`InstancePredictorBase.py:672`); euler/quaternion/lookat are
            # decodable via forward_pose but have no hypothesis sampling
            raise NotImplementedError(
                f"hypothesis sampling requires quad/octlookat, "
                f"got {cfg.rot_rep}")
        K = self.num_pose_hypos
        rots = poses_raw[..., :K * 4].reshape(-1, K, 4)
        N = rots.shape[0]
        logits = rots[..., 0]
        fwd = rots[..., 1:4]
        trans = poses_raw[..., -3:]

        temp = 1.0 / jnp.clip(total_iter / 1000.0 / cfg.rot_temp_scalar,
                              1.0, cfg.temp_clip_high)
        probs = jax.nn.softmax(-logits / temp, axis=1)
        naive_w = jnp.clip(1.0 - (total_iter - cfg.naive_probs_iter) / 2000.0,
                           0.0, 1.0)
        probs = (1.0 / K) * naive_w + probs * (1.0 - naive_w)
        best_idx = jnp.argmax(probs, axis=1)

        if random_sample:
            k1, k2 = jax.random.split(rng)
            rand_idx = jax.random.randint(k1, (N,), 0, K)
            p_best = jnp.clip((total_iter - cfg.best_pose_start_iter) / 2000.0,
                              0.0, 0.8)
            best_flag = (jax.random.uniform(k2, (N,)) < p_best)
            rot_idx = jnp.where(best_flag, best_idx, rand_idx)
            rand_flag = 1 - best_flag.astype(jnp.int32)
        else:
            rot_idx = best_idx
            rand_flag = jnp.zeros((N,), jnp.int32)

        take = lambda a: jnp.take_along_axis(
            a, rot_idx.reshape(-1, *([1] * (a.ndim - 1))), 1)[:, 0]
        rot_sel = take(fwd)
        pose_raw = jnp.concatenate([rot_sel, trans], -1)
        rot_mat = lookat_forward_to_rot_matrix(rot_sel)
        pose = jnp.concatenate([rot_mat.reshape(N, 9), trans], -1)  # (N, 12)
        aux = {"rot_idx": rot_idx, "rot_prob": take(probs),
               "rot_logit": take(logits), "rots_probs": probs,
               "rand_pose_flag": rand_flag}
        return pose_raw, pose, aux

    def get_camera_extrinsics_from_pose(self, pose, znear=0.1, zfar=1000.0,
                                        offset_extra=None):
        """(`InstancePredictorBase.py:606-620`) pose (N,12) → mvp, w2c, campos."""
        cfg = self.cfg.cfg_pose
        N = pose.shape[0]
        R = jnp.swapaxes(pose[:, :9].reshape(N, 3, 3), -1, -2)
        z_off = cfg.cam_pos_z_offset + (offset_extra or 0.0)
        T = pose[:, -3:] + jnp.asarray([0.0, 0.0, -z_off])
        w2c = jnp.zeros((N, 4, 4)).at[:, :3, :3].set(R) \
            .at[:, :3, 3].set(T).at[:, 3, 3].set(1.0)
        proj = jnp.asarray(perspective(cfg.fov / 180 * np.pi, 1.0, znear, zfar))
        mvp = jnp.einsum("ij,bjk->bik", proj, w2c)
        campos = -jnp.einsum("bji,bj->bi", R, T)
        return mvp, w2c, campos

    # ------------------------------------------------------------------
    def forward_deformation(self, mesh: Mesh, feat):
        """(`InstancePredictorBase.py:306-314`) CoordMLP ×0.1 on canonical
        verts, broadcasting the batch-1 prior over feat's batch."""
        verts = mesh.v_pos                       # (1, V, 3)
        N = feat.shape[0]
        verts_b = jnp.broadcast_to(verts, (N, *verts.shape[1:]))
        deform = self.netDeform(verts_b, feat) * 0.1
        mesh = Mesh(v_pos=verts_b, t_pos_idx=mesh.t_pos_idx,
                    v_valid=mesh.v_valid, f_valid=mesh.f_valid,
                    num_verts=mesh.num_verts, num_faces=mesh.num_faces,
                    v_nrm=None, v_tex=jnp.broadcast_to(
                        mesh.v_tex, (N, *verts.shape[1:])),
                    face_gidx=mesh.face_gidx)
        return mesh.deform(deform), deform

    def apply_articulation_constraints(self, angles, phase: Phase):
        """(`InstancePredictorBase.py:435-511`) tanh + per-bone-group clamps."""
        a = self.cfg.cfg_articulation
        angles = angles * a.output_multiplier
        if a.static_root_bones:
            roots = [a.num_body_bones // 2 - 1, a.num_body_bones - 1]
            m = jnp.ones_like(angles).at[:, :, roots].set(0.0)
            angles = angles * m
        angles = jnp.tanh(angles)
        nb = a.num_body_bones
        n_leg_total = a.num_leg_bones * a.num_legs
        if phase.constrain_legs:
            legs = nb + np.arange(n_leg_total)
            scale = jnp.ones_like(angles)
            scale = scale.at[:, :, legs, 2].set(0.3)   # twist
            scale = scale.at[:, :, legs, 1].set(0.3)   # side bend
            angles = angles * scale
            if a.use_fauna_constraints:
                top = [10, 13, 16, 19]
                bottom = [8, 9, 11, 12, 14, 15, 17, 18]
                body = list(range(8))
                scale = jnp.ones_like(angles)
                scale = scale.at[:, :, top, 1].set(0.05)
                scale = scale.at[:, :, top, 2].set(0.05)
                scale = scale.at[:, :, top, 0].set(0.75)
                scale = scale.at[:, :, bottom, 1].set(0.0)
                scale = scale.at[:, :, bottom, 2].set(0.0)
                scale = scale.at[:, :, bottom, 0].set(0.3)
                scale = scale.at[:, :, body, 2].set(0.1)
                angles = angles * scale
        if a.extra_constraints:
            legs_all = list(range(nb, nb + n_leg_total))
            top = [nb + i * a.num_leg_bones for i in range(a.num_legs)]
            bottom = [b for b in legs_all if b not in top]
            scale = jnp.ones_like(angles)
            scale = scale.at[:, :, legs_all, 2].set(0.3)
            scale = scale.at[:, :, legs_all, 1].set(0.3)
            scale = scale.at[:, :, top, 1].set(0.05)
            scale = scale.at[:, :, top, 2].set(0.05)
            scale = scale.at[:, :, bottom, 1].set(0.0)
            scale = scale.at[:, :, bottom, 2].set(0.0)
            angles = angles * scale
        return angles * (a.max_arti_angle / 180.0 * np.pi)

    def get_bones(self, verts, v_valid, feat, patch_feat, mvp, w2c,
                  batch_size, num_frames, attach_legs: bool):
        """(`InstancePredictorBase.py:316-382`) estimate rest bones + build
        per-bone network inputs (detached 2D/3D codes + features)."""
        a = self.cfg.cfg_articulation
        bones, structure = sk.estimate_bones(
            verts, v_valid, n_body_bones=a.num_body_bones, n_legs=a.num_legs,
            n_leg_bones=a.num_leg_bones, body_bones_mode=a.body_bones_mode,
            attach_legs_to_body=attach_legs,
            bone_y_threshold=a.bone_y_threshold,
            legs_to_body_joint_indices=a.legs_to_body_joint_indices)

        bp = bones
        if batch_size > bp.shape[0] or num_frames > bp.shape[1]:
            bp = jnp.broadcast_to(
                bones, (batch_size, num_frames, *bones.shape[2:]))
        K = bp.shape[2]
        N = batch_size * num_frames
        bp = bp.reshape(N, K, 2, 3)

        mid = bp.mean(2)                                        # (N, K, 3)
        mid4 = jnp.concatenate([mid, jnp.ones_like(mid[..., :1])], -1)
        mid_clip = jnp.einsum("nij,nkj->nki", mvp, mid4)
        mid_2d = jax.lax.stop_gradient(
            mid_clip[..., :2] / mid_clip[..., 3:4])             # (N, K, 2)

        bp4 = jnp.concatenate([bp, jnp.ones_like(bp[..., :1])], -1)
        cam = jnp.einsum("nij,nkej->nkei", w2c, bp4)
        cam3 = cam[..., :3] / cam[..., 3:4]
        cam3 = cam3 + jnp.asarray([0.0, 0.0,
                                   self.cfg.cfg_pose.cam_pos_z_offset])
        pos3d = cam3.reshape(N, K, 6) / self.cfg.spatial_scale * 2

        idx_in = ((jnp.arange(K) + 0.5) / K * 2 - 1)
        idx_in = jnp.broadcast_to(idx_in[None, :, None], (N, K, 1))
        pos_in = jax.lax.stop_gradient(
            jnp.concatenate([mid_2d, pos3d, idx_in], -1))       # (N, K, 9)

        if feat is not None and patch_feat is not None:
            g = jnp.broadcast_to(feat[:, None], (N, K, feat.shape[-1]))
            local = grid_sample_bilinear(patch_feat, mid_2d[:, None])[:, 0]
            mode = a.bone_feature_mode
            if mode == "global":
                bones_feat = g
            elif mode == "sample":
                bones_feat = local
            else:
                bones_feat = jnp.concatenate([g, local], -1)
        else:
            bones_feat = None
        return bones, structure, bones_feat, pos_in

    def forward_articulation(self, mesh: Mesh, feat, patch_feat, mvp, w2c,
                             batch_size, num_frames, phase: Phase):
        """(`InstancePredictorBase.py:513-604`) bones → articulation net →
        constraints → skinning → articulated mesh."""
        a = self.cfg.cfg_articulation
        verts = mesh.v_pos
        N = batch_size * num_frames
        if verts.shape[0] == N:
            verts_bf = verts.reshape(batch_size, num_frames, *verts.shape[1:])
        else:
            verts_bf = verts[None]                      # (1, 1, V, 3)

        bones, structure, bones_feat, pos_in = self.get_bones(
            verts_bf, mesh.v_valid, feat, patch_feat, mvp, w2c,
            batch_size, num_frames, phase.attach_legs)

        K = self.num_bones
        angles = self.netArticulation(bones_feat, pos_in) \
            .reshape(batch_size, num_frames, K, 3)
        angles = self.apply_articulation_constraints(angles, phase)

        if a.enable_refine:
            # second pass on the POSED bones
            # (`InstancePredictorBase.py:529-541` + `get_bones_from_
            # articulation:385-433`): skin once to get posed bone endpoints,
            # rebuild the detached per-bone codes from them, then either add
            # a predicted delta or re-predict + re-constrain.
            N = batch_size * num_frames
            _, aux0 = sk.skinning(verts_bf, bones, structure, angles,
                                  output_posed_bones=True,
                                  temperature=a.skinning_temperature,
                                  v_valid=mesh.v_valid)
            pb = aux0["posed_bones"].reshape(N, K, 2, 3)
            mid = pb.mean(2)
            mid4 = jnp.concatenate([mid, jnp.ones_like(mid[..., :1])], -1)
            mid_clip = jnp.einsum("nij,nkj->nki", mvp, mid4)
            mid_2d = jax.lax.stop_gradient(
                mid_clip[..., :2] / mid_clip[..., 3:4])
            pb4 = jnp.concatenate([pb, jnp.ones_like(pb[..., :1])], -1)
            cam = jnp.einsum("nij,nkej->nkei", w2c, pb4)
            cam3 = cam[..., :3] / cam[..., 3:4] + jnp.asarray(
                [0.0, 0.0, self.cfg.cfg_pose.cam_pos_z_offset])
            pos3d = cam3.reshape(N, K, 6) / self.cfg.spatial_scale * 2
            idx_in = jnp.broadcast_to(
                (((jnp.arange(K) + 0.5) / K * 2 - 1))[None, :, None],
                (N, K, 1))
            pos_in2 = jax.lax.stop_gradient(
                jnp.concatenate([mid_2d, pos3d, idx_in], -1))
            feats2 = []
            if "dino_global" in a.refine_feature_mode:
                feats2.append(jnp.broadcast_to(
                    feat[:, None], (N, K, feat.shape[-1])))
            if "dino_sample" in a.refine_feature_mode:
                feats2.append(
                    grid_sample_bilinear(patch_feat, mid_2d[:, None])[:, 0])
            bones_feat2 = jnp.concatenate(feats2, -1)
            if a.predict_delta:
                delta = self.netArticulationRefine(bones_feat2, pos_in2) \
                    .reshape(batch_size, num_frames, K, 3)
                angles = angles + delta
            else:
                angles = self.netArticulationRefine(bones_feat2, pos_in2) \
                    .reshape(batch_size, num_frames, K, 3)
                angles = self.apply_articulation_constraints(angles, phase)

        posed, aux = sk.skinning(verts_bf, bones, structure, angles,
                                 output_posed_bones=True,
                                 temperature=a.skinning_temperature,
                                 v_valid=mesh.v_valid)
        posed = posed.reshape(N, *posed.shape[2:])
        v_tex = mesh.v_tex
        if v_tex.shape[0] != N:
            v_tex = jnp.broadcast_to(v_tex, (N, *v_tex.shape[1:]))
        out_mesh = make_mesh(posed, mesh.t_pos_idx, mesh.v_valid,
                             mesh.f_valid, mesh.num_verts, mesh.num_faces,
                             v_tex=v_tex, face_gidx=mesh.face_gidx)
        return out_mesh, angles, aux

    # ------------------------------------------------------------------
    def __call__(self, images, prior_mesh: Mesh, total_iter, rng,
                 phase: Phase = Phase()):
        """Full instance forward (`InstancePredictorBase.py:665-698`).

        Returns the reference 12-tuple (shape, pose_raw, pose, mvp, w2c,
        campos, texture_feat, im_features, deformation, arti_params,
        light_params, aux). Texture/light are applied lazily by the model
        layer via `self.netTexture` / `self.netLight` closures.
        """
        batch_size, num_frames = images.shape[:2]
        feat_out, feat_key, patch_out, patch_key = self.forward_encoder(images)

        poses_raw = self.forward_pose(patch_out, patch_key, zeroy=phase.zeroy)
        rng_pose, rng = jax.random.split(rng)
        pose_raw, pose, aux = self.sample_pose_hypothesis(
            poses_raw, total_iter, rng_pose,
            random_sample=(phase.is_training and self.cfg.cfg_pose.rand_campos))
        mvp, w2c, campos = self.get_camera_extrinsics_from_pose(pose)

        shape = prior_mesh
        deformation = None
        if self.cfg.enable_deform and phase.deform_on:
            shape, deformation = self.forward_deformation(shape, feat_key)

        arti_params = None
        if self.cfg.enable_articulation and phase.articulation_on:
            shape, arti_params, arti_aux = self.forward_articulation(
                shape, feat_key, patch_key, mvp, w2c, batch_size, num_frames,
                phase)
            aux.update(arti_aux)

        light_params = self.netLight(feat_out) if self.cfg.enable_lighting \
            else None

        return (shape, pose_raw, pose, mvp, w2c, campos, feat_out, feat_key,
                deformation, arti_params, light_params, aux)

    def articulate_with_angles(self, prior_mesh: Mesh, angles):
        """Re-skin the prior with explicit articulation angles (B, F, K, 3) —
        the visualization animation/canonicalization path
        (`visualization/visualize_results.py:409-595`)."""
        a = self.cfg.cfg_articulation
        B, F = angles.shape[:2]
        verts_bf = prior_mesh.v_pos[:1][None]
        bones, structure = sk.estimate_bones(
            verts_bf, prior_mesh.v_valid, n_body_bones=a.num_body_bones,
            n_legs=a.num_legs, n_leg_bones=a.num_leg_bones,
            body_bones_mode=a.body_bones_mode, attach_legs_to_body=True,
            bone_y_threshold=a.bone_y_threshold,
            legs_to_body_joint_indices=a.legs_to_body_joint_indices)
        verts_rep = jnp.broadcast_to(verts_bf, (B, F, *verts_bf.shape[2:]))
        posed, _ = sk.skinning(verts_rep, bones, structure, angles,
                               temperature=a.skinning_temperature,
                               v_valid=prior_mesh.v_valid)
        N = B * F
        posed = posed.reshape(N, *posed.shape[2:])
        v_tex = jnp.broadcast_to(prior_mesh.v_tex[:1],
                                 (N, *prior_mesh.v_tex.shape[1:]))
        return make_mesh(posed, prior_mesh.t_pos_idx, prior_mesh.v_valid,
                         prior_mesh.f_valid, prior_mesh.num_verts,
                         prior_mesh.num_faces, v_tex=v_tex,
                         face_gidx=prior_mesh.face_gidx)

    def frozen_vit_class_token(self, images):
        """images (B, F, 3, H, W) in [0,1] → frozen DINO cls tokens (N, D)."""
        imgs = images.reshape(-1, *images.shape[2:]) * 2 - 1
        return self.netEncoder.class_token(imgs)

    # texture / light entry points for the model layer
    def sample_texture(self, tex_pos, feat):
        return self.netTexture(tex_pos, feat)

    def light(self, feat):
        return self.netLight(feat)

    def init_all(self, images, prior_mesh: Mesh, total_iter, rng):
        """Touch every submodule so `model.init` creates all parameters
        (texture isn't reached by `__call__`; deform/articulation are
        exercised regardless of schedule)."""
        out = self(images, prior_mesh, total_iter, rng, Phase(
            deform_on=self.cfg.enable_deform,
            articulation_on=self.cfg.enable_articulation,
            attach_legs=True,
            constrain_legs=self.cfg.cfg_articulation.constrain_legs,
            zeroy=self.cfg.cfg_pose.lookat_zeroy))
        feat_out = out[6]
        _ = self.sample_texture(jnp.zeros((feat_out.shape[0], 1, 3)), feat_out)
        return out
