"""Ponymation: video reconstruction (stage 1) + transformer motion-VAE
generation of articulation sequences (stage 2).

Reference: `/root/reference/model/models/Ponymation.py:19-114`. Mapping:
  * stage is the static `enable_motion_vae` config switch; stage 1 trains
    only `netArticulation`, stage 2 only `netVAE` — expressed as optimizer
    masking (`frozen_param`) instead of requires_grad flips (`:45-63`);
  * stage 2 disables reconstruction losses entirely (`:87-97`) and adds
    teacher-distillation `arti_recon_loss` + `kld_loss` (`:65-85`);
  * stage-2 rendering uses a canonical default camera rotated −120° about y
    with an extra z offset (`get_default_pose`, `:28-37`);
  * at eval with the VAE enabled, the instance forward becomes `generate`
    (`set_eval`, `:39-43`) — here dispatched on `phase.is_training`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu import config as cfglib
from animals3d_tpu.geometry.skinning import euler_angles_to_matrix
from animals3d_tpu.models.animal import AnimalModel, RenderConfig
from animals3d_tpu.phase import Phase
from animals3d_tpu.predictors.motion_vae import (MotionVAEConfig,
                                                 MotionVAEPredictor)
from animals3d_tpu.render.camera import perspective


@dataclasses.dataclass(frozen=True)
class PonymationRenderConfig(RenderConfig):
    offset_extra: float = 4.0


class Ponymation(AnimalModel):
    def __init__(self, cfg: dict):
        pred_inst = cfg.get("cfg_predictor_instance") or {}
        self.enable_motion_vae = bool(pred_inst.get("enable_motion_vae", True))
        self.cfg_motion_vae = cfglib.bind(MotionVAEConfig,
                                          pred_inst.get("cfg_motion_vae"))
        super().__init__(cfg)
        self.cfg_render = cfglib.bind(PonymationRenderConfig,
                                      cfg.get("cfg_render"))
        self._default_cameras = None

    def make_net_instance(self):
        return MotionVAEPredictor(cfg=self.cfg_predictor_instance,
                                  enable_motion_vae=self.enable_motion_vae,
                                  cfg_motion_vae=self.cfg_motion_vae)

    # -- stage-dependent trainability (`:45-63`) ----------------------------
    def frozen_param(self, keys) -> bool:
        if keys[0] != "netInstance" and keys[0] != "netBase":
            return False
        if self.enable_motion_vae:                    # stage 2: only netVAE
            return "netVAE" not in keys
        # stage 1: only netArticulation
        return "netArticulation" not in keys

    # -- default (canonical) camera (`:28-37`) ------------------------------
    def default_cameras(self, N: int):
        if self._default_cameras is None:
            pose_cfg = self.cfg_predictor_instance.cfg_pose
            z_off = pose_cfg.cam_pos_z_offset + self.cfg_render.offset_extra
            w2c = np.eye(4, dtype=np.float32)
            w2c[2, 3] = -z_off
            proj = perspective(pose_cfg.fov / 180 * np.pi)
            mtx = np.eye(4, dtype=np.float32)
            rot = np.asarray(euler_angles_to_matrix(
                jnp.asarray([0.0, -120.0 / 180 * np.pi, 0.0]), "XYZ"))
            mtx[:3, :3] = rot
            w2c_a = (w2c @ mtx).astype(np.float32)
            mvp_a = (proj @ w2c @ mtx).astype(np.float32)
            campos = (np.array([0, 0, z_off], np.float32) @
                      np.linalg.inv(rot).T)
            self._default_cameras = (jnp.asarray(mvp_a), jnp.asarray(w2c_a),
                                     jnp.asarray(campos))
        mvp, w2c, campos = self._default_cameras
        return (jnp.broadcast_to(mvp[None], (N, 4, 4)),
                jnp.broadcast_to(w2c[None], (N, 4, 4)),
                jnp.broadcast_to(campos[None], (N, 3)))

    def render_cameras(self, mvp, w2c, campos):
        if self.cfg_render.render_default:
            return self.default_cameras(mvp.shape[0])
        return mvp, w2c, campos

    # -- stage-2 dispatch to generate ---------------------------------------
    def instance_forward(self, params, images, prior_mesh, total_iter, rngs,
                         phase: Phase):
        if self.enable_motion_vae and not phase.is_training:
            return self.netInstance.apply(
                {"params": params["netInstance"]}, images, prior_mesh,
                total_iter, rngs[1], phase, 1, self.num_frames,
                method="generate", rngs={"vae": rngs[4]})
        return super().instance_forward(params, images, prior_mesh,
                                        total_iter, rngs, phase)

    # -- stage-2 losses ------------------------------------------------------
    def use_recon_losses(self, phase: Phase) -> bool:
        return not self.enable_motion_vae

    def extra_losses(self, params, batch, total_iter, final_losses, metrics,
                     ctx):
        fw_aux = ctx["fw_aux"]
        total = 0.0
        cl = self.cfg_loss
        if cl.arti_recon_loss_weight > 0 and \
                "articulation_angles_gt" in fw_aux:
            recon = jnp.mean((fw_aux["articulation_angles_pred"]
                              - fw_aux["articulation_angles_gt"]) ** 2)
            final_losses["arti_recon_loss"] = recon
            metrics["arti_recon_loss"] = recon
            total = total + recon * cl.arti_recon_loss_weight
        if cl.kld_loss_weight > 0 and "log_var_vae" in fw_aux:
            mu, logvar = fw_aux["mu_vae"], fw_aux["log_var_vae"]
            kld = -0.5 * jnp.mean(
                jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1))
            final_losses["kld_loss"] = kld
            metrics["kld_loss"] = kld
            total = total + kld * cl.kld_loss_weight
        return total
