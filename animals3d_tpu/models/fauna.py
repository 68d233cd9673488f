"""3D-Fauna: pan-category quadruped reconstruction with a semantic base-shape
memory bank and a mask-discriminator GAN loss.

Reference: `/root/reference/model/models/Fauna.py` (FaunaModel `:35-520`).
Functional mapping:

  * netBase → `BankPredictor` (conditional SDF + memory bank); the frozen-ViT
    class token that queries the bank is computed with the *instance*
    encoder's parameters, like the reference's `bank_enc=netInstance.netEncoder`
    threading (`Fauna.py:354-358`);
  * generator-side discriminator loss (random-view mask must look real,
    `:111-212`) is an `extra_losses` hook active in the static
    `phase.disc_on` window; rendered masks are recorded in aux for the
    discriminator step;
  * the discriminator update is a *separate* jitted step
    (`discriminator_loss`) with R1 penalty via jax.grad-of-grad — two
    optimizers sharing one params tree, the trainer alternates them
    (`Trainer.py:248-259`);
  * iteration-scheduled dict weights (`parse_dict_definition`, `:87-109`)
    are traced piecewise-constant functions of total_iter — no recompiles.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu import config as cfglib
from animals3d_tpu.models.animal import AnimalModel, OptimizerConfig
from animals3d_tpu.networks import discriminator as disc_lib
from animals3d_tpu.phase import Phase
from animals3d_tpu.predictors.bank import BankPredictor
from animals3d_tpu.predictors.config import BankConfig
from animals3d_tpu.predictors.fauna import (FaunaAdditionalConfig,
                                            FaunaInstancePredictor)
from animals3d_tpu.render.camera import perspective


@dataclasses.dataclass(frozen=True)
class MaskDiscriminatorConfig:
    enable_iter: Tuple[int, int] = (80000, 300000)
    disc_gt: bool = False
    disc_iv: bool = True
    disc_iv_label: str = "Real"
    mask_disc_loss_weight: float = 0.1
    discriminator_loss_weight: float = 1.0
    disc_reg_mul: float = 10.0


def parse_dict_definition(dict_cfg, total_iter):
    """Iteration-scheduled weight dict → traced piecewise-constant value
    (`Fauna.py:87-109`)."""
    iters = list(dict_cfg.keys())
    weights = list(dict_cfg.values())
    w = jnp.asarray(float(weights[-1]))
    for i in range(len(iters) - 1):
        cond = (float(iters[i]) <= total_iter) & (total_iter < float(iters[i + 1]))
        w = jnp.where(cond, float(weights[i]), w)
    return w


class Fauna(AnimalModel):
    def __init__(self, cfg: dict):
        pred_base = cfg.get("cfg_predictor_base") or {}
        self.cfg_bank = cfglib.bind(BankConfig, pred_base.get("cfg_bank"))
        pred_inst = cfg.get("cfg_predictor_instance") or {}
        self.cfg_additional = cfglib.bind(FaunaAdditionalConfig,
                                          pred_inst.get("cfg_additional"))
        self.cfg_mask_discriminator = cfglib.bind(
            MaskDiscriminatorConfig, cfg.get("cfg_mask_discriminator"))
        self.cfg_optim_discriminator = cfglib.bind(
            OptimizerConfig, cfg.get("cfg_optim_discriminator"))
        super().__init__(cfg)
        # Fauna-specific predictor tweaks (`InstancePredictorFauna.py:33-34,46`)
        inst = self.cfg_predictor_instance
        inst = dataclasses.replace(
            inst,
            cfg_texture=dataclasses.replace(inst.cfg_texture,
                                            in_layer_relu=True),
            cfg_articulation=dataclasses.replace(
                inst.cfg_articulation, enable_articulation_idadd=True,
                bone_y_threshold=self.cfg_additional.bone_y_threshold),
            cfg_pose=dataclasses.replace(inst.cfg_pose, temp_clip_high=10.0))
        self.cfg_predictor_instance = inst
        self.netInstance = self.make_net_instance()
        self.netDisc = disc_lib.DCDiscriminator(
            in_dim=self.cfg_bank.memory_bank_dim + 1,
            img_size=self.out_image_size)

    # -- construction -------------------------------------------------------
    def make_net_base(self):
        return BankPredictor(cfg=self.cfg_predictor_base,
                             bank_cfg=self.cfg_bank)

    def make_net_instance(self):
        return FaunaInstancePredictor(cfg=self.cfg_predictor_instance,
                                      cfg_additional=self.cfg_additional)

    def phase_for_iter(self, total_iter: int, is_training: bool = True) -> Phase:
        p = super().phase_for_iter(total_iter, is_training)
        add = self.cfg_additional
        leg_started = (add.iter_leg_rotation_start > 0 and
                       total_iter > add.iter_leg_rotation_start)
        lo, hi = self.cfg_mask_discriminator.enable_iter
        return p._replace(
            constrain_legs=not leg_started,
            leg_rot_started=bool(leg_started),
            zeroy=bool(self.cfg_predictor_instance.cfg_pose.lookat_zeroy
                       and total_iter < add.nozeroy_start),
            disc_on=bool(is_training and lo < total_iter < hi))

    def init_params(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        params = super().init_params(k1)
        dummy = jnp.zeros((1, self.cfg_bank.memory_bank_dim + 1,
                           self.out_image_size, self.out_image_size))
        params["netDisc"] = jax.jit(self.netDisc.init)(k2, dummy)["params"]
        return params

    def extra_optimizers(self):
        import optax
        cfg = self.cfg_optim_discriminator
        # generator step must not update the discriminator
        return {"disc": optax.set_to_zero()}

    # -- scheduled weights ---------------------------------------------------
    def loss_weight(self, name: str, total_iter):
        if name == "dino_feat_im_loss" and \
                self.cfg_loss.dino_feat_im_loss_weight_dict:
            return parse_dict_definition(
                self.cfg_loss.dino_feat_im_loss_weight_dict, total_iter)
        if name == "mask_disc_loss":
            return self.cfg_mask_discriminator.mask_disc_loss_weight
        if name in ("mask_disc_loss_rv", "mask_disc_loss_iv"):
            return 0.0
        return super().loss_weight(name, total_iter)

    def logit_weight(self, name: str, total_iter):
        cl = self.cfg_loss
        if name == "dino_feat_im_loss" and cl.dino_feat_im_loss_weight_dict \
                and cl.logit_loss_dino_feat_im_loss_multiplier_dict:
            return parse_dict_definition(cl.dino_feat_im_loss_weight_dict,
                                         total_iter) * \
                parse_dict_definition(
                    cl.logit_loss_dino_feat_im_loss_multiplier_dict, total_iter)
        w = self.loss_weight(name, total_iter)
        if name == "mask_loss":
            return w * cl.logit_loss_mask_multiplier
        if name == "mask_inv_dt_loss":
            return w * cl.logit_loss_mask_inv_dt_multiplier
        return w

    # -- bank-conditioned base forward ---------------------------------------
    def forward_base(self, params, grid, v_cap, f_cap, total_iter, rng,
                     phase: Phase, batch):
        images = batch["images"]
        cls_tok = self.netInstance.apply(
            {"params": params["netInstance"]}, images,
            method="frozen_vit_class_token")
        batch_mean, embeddings, weight_aux = self.netBase.apply(
            {"params": params["netBase"]}, cls_tok,
            method="retrieve_memory_bank")
        jitter = rng if phase.is_training else None
        prior_mesh, sdf = self.netBase.apply(
            {"params": params["netBase"]}, grid, v_cap, f_cap, total_iter,
            jitter, batch_mean[None])
        bank_aux = {"bank_embedding": (batch_mean, embeddings, weight_aux)}
        return prior_mesh, sdf, batch_mean[None], bank_aux

    # -- GAN pieces ----------------------------------------------------------
    def get_random_view_mask(self, params, w2c_pred, shape, prior_mesh,
                             num_frames, rng):
        """Render the posed shape from a random azimuth (`Fauna.py:111-173`)."""
        b = shape.v_pos.shape[0]
        angle = jax.random.randint(rng, (b,), 0, 360).astype(jnp.float32) \
            * (2 * np.pi / 360)
        c, s = jnp.cos(angle), jnp.sin(angle)
        zero = jnp.zeros_like(c)
        one = jnp.ones_like(c)
        rot = jnp.stack([
            jnp.stack([c, zero, s, zero], -1),
            jnp.stack([zero, one, zero, zero], -1),
            jnp.stack([-s, zero, c, zero], -1),
            jnp.stack([zero, zero, zero, one], -1)], -2)      # (b, 4, 4)

        w2c = jnp.eye(4)[None].repeat(b, 0)
        w2c = w2c.at[:, 2, 3].set(-self.cfg_render.cam_pos_z_offset * 1.4)
        w2c = w2c.at[:, :3, 3].set(
            jax.lax.stop_gradient(w2c_pred)[:b, :3, 3])
        proj = jnp.asarray(perspective(self.cfg_render.fov / 180 * np.pi))
        mvp = jnp.einsum("ij,bjk->bik", proj, w2c)
        campos = -w2c[:, :3, 3]
        mvp = jnp.einsum("bij,bjk->bik", mvp, rot)
        campos = jnp.einsum("bji,bj->bi", rot[:, :3, :3], campos)

        res = (self.out_image_size, self.out_image_size)
        renders = self.render(
            params, ["shaded"], shape, mvp, w2c, campos, res,
            im_features=None, light_params=None, prior_mesh=prior_mesh,
            num_frames=num_frames)
        mask = jnp.clip(renders["shaded"][:, 3:], 0.0, 1.0)   # (b,1,256,256)
        return mask

    def _with_condition(self, mask, class_vector):
        cond = jax.lax.stop_gradient(class_vector).reshape(1, -1, 1, 1)
        cond = jnp.broadcast_to(
            cond, (mask.shape[0], cond.shape[1], *mask.shape[2:]))
        return jnp.concatenate([mask, cond], 1)

    def extra_losses(self, params, batch, total_iter, final_losses, metrics,
                     ctx):
        phase: Phase = ctx["phase"]
        if not phase.disc_on:
            return 0.0
        mdc = self.cfg_mask_discriminator
        class_vector = ctx["class_vector"][0]                  # (bank_dim,)
        mask_gt = ctx["mask_gt"]
        mask_pred = ctx["mask_pred"]
        B, F = mask_gt.shape[:2]
        shape = ctx["shape"]
        prior_mesh = ctx["prior_mesh"]
        w2c = ctx["w2c"]
        rng = ctx["rngs"][3]

        mask_rv = self.get_random_view_mask(params, w2c, shape, prior_mesh,
                                            F, rng)
        mask_iv = mask_pred.reshape(B * F, 1, *mask_pred.shape[2:])
        mask_gt_ = mask_gt.reshape(B * F, 1, *mask_gt.shape[2:])

        def D(x):
            return self.netDisc.apply({"params": params["netDisc"]}, x)

        d_rv = D(self._with_condition(mask_rv, class_vector))
        gen_loss = disc_lib.bce_loss_target(d_rv, 1.0)
        count = 1
        if mdc.disc_iv and mdc.disc_iv_label != "Real":
            d_iv = D(self._with_condition(mask_iv, class_vector))
            gen_loss = gen_loss + disc_lib.bce_loss_target(d_iv, 1.0)
            count += 1
        gen_loss = gen_loss / count
        final_losses["mask_disc_loss"] = gen_loss
        metrics["mask_disc_loss"] = gen_loss

        # recorded (stop-grad) masks for the discriminator step
        rec = {
            "mask_gt": jax.lax.stop_gradient(
                self._with_condition(mask_gt_, class_vector)),
            "mask_iv": jax.lax.stop_gradient(
                self._with_condition(mask_iv, class_vector)),
            "mask_rv": jax.lax.stop_gradient(
                self._with_condition(mask_rv, class_vector)),
        }
        metrics["_disc_record"] = rec
        return gen_loss * mdc.mask_disc_loss_weight

    def discriminator_loss(self, disc_params, record):
        """Discriminator-side loss (`Fauna.py:214-281`): random view fake,
        input view / GT real with R1 penalty."""
        mdc = self.cfg_mask_discriminator

        def D(x):
            return self.netDisc.apply({"params": disc_params}, x)

        loss = disc_lib.bce_loss_target(D(record["mask_rv"]), 0.0)
        count = 1
        if mdc.disc_gt:
            gp = mdc.disc_reg_mul * disc_lib.r1_penalty(D, record["mask_gt"])
            loss = loss + disc_lib.bce_loss_target(D(record["mask_gt"]), 1.0) + gp
            count += 1
        if mdc.disc_iv:
            if mdc.disc_iv_label == "Real":
                gp = mdc.disc_reg_mul * disc_lib.r1_penalty(D, record["mask_iv"])
                loss = loss + disc_lib.bce_loss_target(D(record["mask_iv"]), 1.0) + gp
            else:
                loss = loss + disc_lib.bce_loss_target(D(record["mask_iv"]), 0.0)
            count += 1
        return loss / count * mdc.discriminator_loss_weight
