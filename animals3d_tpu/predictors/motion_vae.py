"""Ponymation instance predictor: motion-VAE articulation.

Reference: `InstancePredictorMotionVAE`
(`/root/reference/model/predictors/InstancePredictorMotionVAE.py:28-207`):
  * `force_avg_deform` averages the deformation over frames (`:45-60`);
  * stage 2 runs the frozen articulation net as a *teacher* under stop-grad
    and the VAE as the student (`:92-104`); mu/logvar and teacher/student
    angles surface in aux for the Ponymation losses;
  * `generate`: encode ONE frame, sample z ~ 1.5·N(0,1), decode a motion
    sequence applied to that frame's shape (`:137-207`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry import skinning as sk
from animals3d_tpu.geometry.mesh import Mesh, make_mesh
from animals3d_tpu.networks.motion_vae import ArticulationVAE
from animals3d_tpu.phase import Phase
from animals3d_tpu.predictors.instance import InstancePredictor


@dataclasses.dataclass(frozen=True)
class MotionVAEConfig:
    latent_dim: int = 256
    z_token_num: int = 1
    transformer_layer_num: int = 4
    pe_dropout: float = 0.0


class MotionVAEPredictor(InstancePredictor):
    enable_motion_vae: bool = True
    cfg_motion_vae: MotionVAEConfig = MotionVAEConfig()
    render_gt_mesh: bool = False

    def setup(self):
        super().setup()
        if self.enable_motion_vae:
            enc_dim = self.cfg.cfg_encoder.cout
            vit_dim = 768 if self.cfg.cfg_encoder.which_vit == "dino_vitb8" \
                else 384
            self.netVAE = ArticulationVAE(
                njoints=self.num_bones, feat_dim=vit_dim + enc_dim,
                pos_dim=1 + 2 + 3 * 2, n_harmonic_functions=8,
                harmonic_omega0=np.pi * 0.9,
                latent_dim=self.cfg_motion_vae.latent_dim,
                z_token_num=self.cfg_motion_vae.z_token_num,
                transformer_layer_num=self.cfg_motion_vae.transformer_layer_num)

    def forward_deformation(self, mesh: Mesh, feat, batch_size=None,
                            num_frames=None):
        verts = mesh.v_pos                       # (1, V, 3) canonical prior
        N = feat.shape[0]
        verts_b = jnp.broadcast_to(verts, (N, *verts.shape[1:]))
        deform = self.netDeform(verts_b, feat) * 0.1
        if self.cfg.cfg_deform.force_avg_deform and batch_size is not None \
                and N == batch_size * num_frames and N > 1:
            d = deform.reshape(batch_size, num_frames, *deform.shape[1:])
            d = jnp.broadcast_to(d.mean(1, keepdims=True), d.shape)
            deform = d.reshape(-1, *deform.shape[1:])
        out = Mesh(v_pos=verts_b, t_pos_idx=mesh.t_pos_idx,
                   v_valid=mesh.v_valid, f_valid=mesh.f_valid,
                   num_verts=mesh.num_verts, num_faces=mesh.num_faces,
                   v_nrm=None,
                   v_tex=jnp.broadcast_to(mesh.v_tex, (N, *verts.shape[1:])),
                   face_gidx=mesh.face_gidx)
        return out.deform(deform), deform

    def forward_articulation(self, mesh: Mesh, feat, patch_feat, mvp, w2c,
                             batch_size, num_frames, phase: Phase):
        if not self.enable_motion_vae:
            return super().forward_articulation(
                mesh, feat, patch_feat, mvp, w2c, batch_size, num_frames,
                phase)
        verts = mesh.v_pos
        N = batch_size * num_frames
        verts_bf = verts.reshape(batch_size, num_frames, *verts.shape[1:]) \
            if verts.shape[0] == N else verts[None]

        bones, structure, bones_feat, pos_in = self.get_bones(
            verts_bf, mesh.v_valid, feat, patch_feat, mvp, w2c,
            batch_size, num_frames, phase.attach_legs)

        K = self.num_bones
        # teacher: frozen articulation net (stop-grad, `:92-97`)
        angles_gt = self.netArticulation(bones_feat, pos_in) \
            .reshape(batch_size, num_frames, K, 3)
        angles_gt = jax.lax.stop_gradient(
            self.apply_articulation_constraints(angles_gt, phase))

        # student: the VAE (`:100-104`)
        rng = self.make_rng("vae")
        angles_pred, mu, logvar = self.netVAE(bones_feat, pos_in, num_frames,
                                              batch_size, rng)
        angles_pred = self.apply_articulation_constraints(angles_pred, phase)

        posed, aux = sk.skinning(verts_bf, bones, structure, angles_pred,
                                 output_posed_bones=True,
                                 temperature=self.cfg.cfg_articulation
                                 .skinning_temperature, v_valid=mesh.v_valid)
        posed = posed.reshape(N, *posed.shape[2:])
        v_tex = mesh.v_tex
        if v_tex.shape[0] != N:
            v_tex = jnp.broadcast_to(v_tex, (N, *v_tex.shape[1:]))
        out_mesh = make_mesh(posed, mesh.t_pos_idx, mesh.v_valid, mesh.f_valid,
                             mesh.num_verts, mesh.num_faces, v_tex=v_tex,
                             face_gidx=mesh.face_gidx)
        aux.update({"mu_vae": mu, "log_var_vae": logvar,
                    "articulation_angles_gt": angles_gt,
                    "articulation_angles_pred": angles_pred})
        return out_mesh, angles_pred, aux

    # ------------------------------------------------------------------
    def generate(self, images, prior_mesh: Mesh, total_iter, rng,
                 phase: Phase = Phase(), num_sequence: int = 1,
                 num_frames: int = 10):
        """Stage-2 generation (`:167-207`): one random frame's shape/pose +
        a sampled articulation sequence."""
        imgs = images.reshape(-1, *images.shape[2:])
        k_pick, k_vae, k_pose = jax.random.split(rng, 3)
        idx = jax.random.randint(k_pick, (), 0, imgs.shape[0])
        one = jax.lax.dynamic_index_in_dim(imgs, idx, 0,
                                           keepdims=False)[None, None]

        feat_out, feat_key, patch_out, patch_key = self.forward_encoder(one)
        poses_raw = self.forward_pose(patch_out, patch_key, zeroy=phase.zeroy)
        pose_raw, pose, aux = self.sample_pose_hypothesis(
            poses_raw, jnp.inf, k_pose, random_sample=False)
        mvp, w2c, campos = self.get_camera_extrinsics_from_pose(pose)

        shape = prior_mesh
        deformation = None
        if self.cfg.enable_deform:
            shape, deformation = self.forward_deformation(
                shape, feat_key, batch_size=num_sequence,
                num_frames=num_frames)

        # articulation sequence from the prior
        verts_bf = shape.v_pos[:1][None]
        bones, structure, _, _ = self.get_bones(
            verts_bf, shape.v_valid, None, None, mvp, w2c, 1, 1,
            phase.attach_legs)
        angles = self.netVAE.sample(k_vae, num_sequence, num_frames)
        angles = self.apply_articulation_constraints(angles, phase)

        N = num_sequence * num_frames
        verts_rep = jnp.broadcast_to(verts_bf,
                                     (num_sequence, num_frames,
                                      *verts_bf.shape[2:]))
        posed, arti_aux = sk.skinning(
            verts_rep, bones, structure, angles, output_posed_bones=True,
            temperature=self.cfg.cfg_articulation.skinning_temperature,
            v_valid=shape.v_valid)
        posed = posed.reshape(N, *posed.shape[2:])
        v_tex = jnp.broadcast_to(shape.v_tex[:1], (N, *shape.v_tex.shape[1:]))
        out_mesh = make_mesh(posed, shape.t_pos_idx, shape.v_valid,
                             shape.f_valid, shape.num_verts, shape.num_faces,
                             v_tex=v_tex, face_gidx=shape.face_gidx)

        light_params = self.netLight(feat_out) if self.cfg.enable_lighting \
            else None
        rep = lambda x: None if x is None else \
            jnp.broadcast_to(x[:1], (N, *x.shape[1:]))
        aux = {k: rep(v) for k, v in aux.items()}
        aux.update(arti_aux)
        return (out_mesh, rep(pose_raw), rep(pose), rep(mvp), rep(w2c),
                rep(campos), rep(feat_out), rep(feat_key), rep(deformation),
                angles, rep(light_params), aux)

    def init_all(self, images, prior_mesh: Mesh, total_iter, rng):
        out = super().init_all(images, prior_mesh, total_iter, rng)
        if self.enable_motion_vae:
            B, F = images.shape[:2]
            K = self.num_bones
            vit_dim = 768 if self.cfg.cfg_encoder.which_vit == "dino_vitb8" \
                else 384
            feat = jnp.zeros((B * F, K, vit_dim + self.cfg.cfg_encoder.cout))
            pos = jnp.zeros((B * F, K, 9))
            _ = self.netVAE(feat, pos, F, B, self.make_rng("vae"))
        return out
