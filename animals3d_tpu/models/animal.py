"""AnimalModel: loss orchestration + the jitted training forward.

Reference: `/root/reference/model/models/AnimalModel.py` (losses `:260-354`,
forward `:356-515`). Functional redesign:

  * `forward(params, batch, total_iter, rng, phase)` is a *pure* function
    returning (total_loss, (metrics, aux)) — `jax.value_and_grad` over it is
    the whole backward pass; no DDP dummy-grad hacks are needed (unused
    submodules simply get zero gradients by construction);
  * iteration gating that changes *shapes or control flow* (tet-grid
    resolution, deform/articulation enable, leg attachment) is a static
    `Phase` — at most a handful of compiled graphs over a training run
    (`AnimalModel.py:376-381` + predictor gates); smooth schedules and
    loss-weight gates stay traced;
  * mixed precision: TPU-native bf16 is applied at the train-step level
    (no GradScaler — bf16 keeps f32 range).

Batch contract: a dict with keys
  images (B,F,3,H,W) [0,1] · masks (B,F,1,H,W) · mask_dt (B,F,2,H,W) ·
  mask_valid (B,F,H,W) · flows (B,F-1,2,H,W)|None · bboxs (B,F,8|9) ·
  bg_images (B,F,3,H,W)|None · dino_features (B,F,D,h,w)|None ·
  dino_clusters|None · seq_idx (B,) · frame_idx (B,F)
— the reference 11-tuple (`SURVEY.md` §2.9) with None-ness static.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu import config as cfglib
from animals3d_tpu.geometry import tets as tetlib
from animals3d_tpu.geometry.tets import DeviceTetGrid
from animals3d_tpu.ops.image import resize_nchw
from animals3d_tpu.phase import Phase
from animals3d_tpu.predictors import (BasePredictor, BasePredictorConfig,
                                      InstancePredictor,
                                      InstancePredictorConfig)
from animals3d_tpu.render.render import render_mesh
from animals3d_tpu.utils.smooth_loss import smooth_loss


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 0.0001
    weight_decay: float = 0.0
    # MultiStepLR equivalent (`AnimalModel.py:21-27,102-105`): lr × gamma at
    # each milestone iteration (the reference steps schedulers per iteration,
    # `Trainer.py:305`)
    use_scheduler: bool = False
    scheduler_milestone: tuple = (1, 2, 3, 4, 5)
    scheduler_gamma: float = 0.5


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    spatial_scale: float = 5.0
    background_mode: str = "none"
    render_flow: bool = False
    cam_pos_z_offset: float = 10.0
    fov: float = 25.0
    renderer_spp: int = 1
    render_default: bool = False


@dataclasses.dataclass(frozen=True)
class LossConfig:
    mask_loss_weight: float = 10.0
    mask_dt_loss_weight: float = 0.0
    mask_inv_dt_loss_weight: float = 100.0
    rgb_loss_weight: float = 1.0
    # the reference computes flow_loss (`AnimalModel.py:284-296`) but ships
    # NO flow_loss_weight field anywhere — its getattr lookup (`:451`) would
    # crash for any render_flow=true run. Default 0 keeps totals identical
    # while making the capability actually usable.
    flow_loss_weight: float = 0.0
    dino_feat_im_loss_weight: float = 10.0
    sdf_reg_decay_start_iter: int = 10000
    sdf_bce_reg_loss_weight: float = 0.0
    sdf_gradient_reg_loss_weight: float = 0.01
    logit_loss_weight: float = 1.0
    logit_loss_target_weight: float = 0.0
    logit_loss_dino_feat_im_loss_multiplier: float = 50.0
    arti_reg_loss_iter_range: Tuple[float, float] = (60000, float("inf"))
    arti_reg_loss_weight: float = 0.1
    deform_reg_loss_weight: float = 10.0
    prior_normal_reg_loss_weight: float = 0.0
    instance_normal_reg_loss_weight: float = 0.0
    smooth_type: str = "dislocation"
    loss_type: str = "l2"
    arti_smooth_loss_weight: float = 0.0
    deform_smooth_loss_weight: float = 0.0
    campose_smooth_loss_weight: float = 0.0
    camposevel_smooth_loss_weight: float = 0.0
    artivel_smooth_loss_weight: float = 0.0
    bone_smooth_loss_weight: float = 0.0
    bonevel_smooth_loss_weight: float = 0.0
    arti_recon_loss_weight: float = 0.0
    kld_loss_weight: float = 0.001
    mask_disc_loss_weight: float = 0.1
    mask_disc_loss_rv_weight: float = 0.0
    mask_disc_loss_iv_weight: float = 0.0
    logit_loss_dino_feat_im_loss_multiplier_dict: Any = None
    dino_feat_im_loss_weight_dict: Any = None
    logit_loss_mask_multiplier: float = 0.05
    logit_loss_mask_inv_dt_multiplier: float = 0.05


@dataclasses.dataclass(frozen=True)
class AnimalModelConfig:
    name: str = "MagicPony"
    enable_render: bool = True


def expand_bf(x, b, f):
    return None if x is None else x.reshape(b, f, *x.shape[1:])


def collapse_bf(x):
    return None if x is None else x.reshape(-1, *x.shape[2:])


class AnimalModel:
    """MagicPony base model; Fauna/Ponymation subclass it."""

    def __init__(self, cfg: dict):
        self.cfg_raw = cfg
        self.name = cfg.get("name", "MagicPony")
        self.cfg_model = cfglib.bind(AnimalModelConfig, cfg)
        self.cfg_render = cfglib.bind(RenderConfig, cfg.get("cfg_render"))
        self.cfg_loss = cfglib.bind(LossConfig, cfg.get("cfg_loss"))
        self.cfg_optim_base = cfglib.bind(OptimizerConfig, cfg.get("cfg_optim_base"))
        self.cfg_optim_instance = cfglib.bind(OptimizerConfig, cfg.get("cfg_optim_instance"))
        self.cfg_predictor_base = cfglib.bind(BasePredictorConfig,
                                              cfg.get("cfg_predictor_base"))
        # The banded lattice SDF sweep is exact only for near-eikonal
        # fields, a property held by the BCE/eikonal regularizers. When a
        # config disables BOTH (e.g. train_ponymation_*_stage2), fall back
        # to the dense sweep — perf opt-in must never risk correctness.
        shape_cfg = self.cfg_predictor_base.cfg_shape
        if shape_cfg.sparse_band_eval and \
                self.cfg_loss.sdf_bce_reg_loss_weight == 0 and \
                self.cfg_loss.sdf_gradient_reg_loss_weight == 0:
            self.cfg_predictor_base = dataclasses.replace(
                self.cfg_predictor_base,
                cfg_shape=dataclasses.replace(shape_cfg,
                                              sparse_band_eval=False))
        self.cfg_predictor_instance = cfglib.bind(InstancePredictorConfig,
                                                  cfg.get("cfg_predictor_instance"))
        ds = cfg.get("dataset") or {}
        self.data_type = ds.get("data_type", "image")
        self.in_image_size = ds.get("in_image_size", 256)
        self.out_image_size = ds.get("out_image_size", 256)
        self.num_frames = ds.get("num_frames", 1)
        self.dino_feature_dim = self.cfg_predictor_base.cfg_dino.feature_dim

        self.netBase = self.make_net_base()
        self.netInstance = self.make_net_instance()
        self._grids: Dict[int, DeviceTetGrid] = {}

    # -- construction hooks (overridden by Fauna/Ponymation) ---------------
    def make_net_base(self):
        return BasePredictor(cfg=self.cfg_predictor_base)

    def make_net_instance(self):
        return InstancePredictor(cfg=self.cfg_predictor_instance)

    # -- grids --------------------------------------------------------------
    def grid_for_phase(self, phase: Phase) -> tuple[DeviceTetGrid, int, int]:
        shape_cfg = self.cfg_predictor_base.cfg_shape
        res = shape_cfg.grid_res_coarse if phase.use_coarse_grid \
            else shape_cfg.grid_res
        if res not in self._grids:
            self._grids[res] = DeviceTetGrid(tetlib.load_tet_grid(res))
        v_cap, f_cap = tetlib.default_capacity(
            res, getattr(shape_cfg, "mesh_cap_scale", 6.0))
        return self._grids[res], v_cap, f_cap

    def phase_for_iter(self, total_iter: int, is_training: bool = True) -> Phase:
        shape_cfg = self.cfg_predictor_base.cfg_shape
        inst = self.cfg_predictor_instance
        coarse = shape_cfg.grid_res_coarse_iter_range is not None and \
            cfglib.in_range(total_iter, shape_cfg.grid_res_coarse_iter_range,
                            default_indicator=-1)
        deform = inst.enable_deform and cfglib.in_range(
            total_iter, inst.cfg_deform.deform_iter_range, default_indicator=-1)
        arti = inst.enable_articulation and cfglib.in_range(
            total_iter, inst.cfg_articulation.articulation_iter_range,
            default_indicator=-1)
        attach = inst.enable_articulation and cfglib.in_range(
            total_iter, inst.cfg_articulation.attach_legs_to_body_iter_range,
            default_indicator=-1)
        return Phase(use_coarse_grid=bool(coarse), deform_on=bool(deform),
                     articulation_on=bool(arti), attach_legs=bool(attach),
                     is_training=bool(is_training),
                     constrain_legs=bool(inst.cfg_articulation.constrain_legs),
                     zeroy=bool(inst.cfg_pose.lookat_zeroy))

    # -- init ---------------------------------------------------------------
    def init_params(self, rng) -> dict:
        """Jitted init: flax `init` is eager op-by-op otherwise — thousands
        of tiny dispatches that crawl through a remote-device tunnel. The
        grid is a jit argument (never a closure constant — HLO size)."""
        grid, v_cap, f_cap = self.grid_for_phase(self.phase_for_iter(0))
        k1, k2, k3 = jax.random.split(rng, 3)

        base_init = jax.jit(lambda k, g: self.netBase.init(
            k, g, v_cap, f_cap, method="init_all"))
        base_params = base_init(k1, grid)["params"]

        prior_fn = jax.jit(lambda p, g: self.netBase.apply(
            {"params": p}, g, v_cap, f_cap, method="init_all"))
        prior_mesh, _ = prior_fn(base_params, grid)

        images = jnp.zeros((1, self.num_frames, 3, self.in_image_size,
                            self.in_image_size))
        inst_init = jax.jit(lambda ks, im, pm: self.netInstance.init(
            ks, im, pm, 0, ks["vae"], method="init_all"))
        inst_params = inst_init({"params": k2, "vae": k3}, images,
                                prior_mesh)["params"]
        return {"netBase": base_params, "netInstance": inst_params}

    # -- loss weights -------------------------------------------------------
    def loss_weight(self, name: str, total_iter):
        return getattr(self.cfg_loss, f"{name}_weight")

    def logit_weight(self, name: str, total_iter):
        """Weight of each recon loss inside the logit-loss target
        (`AnimalModel.py:446-460`); Fauna overrides with scheduled dicts and
        mask multipliers (`Fauna.py:428-433`)."""
        weight = self.loss_weight(name, total_iter)
        if name == "dino_feat_im_loss":
            weight = weight * self.cfg_loss.logit_loss_dino_feat_im_loss_multiplier
        return weight

    # -- losses -------------------------------------------------------------
    def compute_reconstruction_losses(self, image_pred, image_gt, mask_pred,
                                      mask_gt, mask_dt, mask_valid, flow_pred,
                                      flow_gt, dino_gt, dino_pred,
                                      background_mode="none"):
        """Per-(B,F) unreduced losses (`AnimalModel.py:260-307`)."""
        losses = {}
        B, F = image_pred.shape[:2]
        mean_bf = lambda x: x.reshape(B, F, -1).mean(2)

        mask_pred_valid = mask_pred * mask_valid
        losses["mask_loss"] = mean_bf((mask_pred_valid - mask_gt) ** 2)
        losses["mask_dt_loss"] = mean_bf(mask_pred * mask_dt[:, :, 1])
        losses["mask_inv_dt_loss"] = mean_bf((1 - mask_pred) * mask_dt[:, :, 0])

        # intersection mask eroded by one pixel (3x3 avgpool > 0.99)
        both = jax.lax.stop_gradient(
            (mask_pred_valid > 0).astype(image_pred.dtype) * mask_gt)
        both = collapse_bf(both)[:, None]                     # (BF,1,H,W)
        kernel = jnp.ones((1, 1, 3, 3), both.dtype) / 9.0
        eroded = jax.lax.conv_general_dilated(both, kernel, (1, 1),
                                              [(1, 1), (1, 1)])
        both = jax.lax.stop_gradient(
            (eroded[:, 0] > 0.99).astype(image_pred.dtype))
        both = expand_bf(both, B, F)                          # (B,F,H,W)

        rgb = jnp.abs(image_pred - image_gt)
        if background_mode not in ("background", "input"):
            rgb = rgb * both[:, :, None]
        losses["rgb_loss"] = mean_bf(rgb)

        if flow_pred is not None and flow_gt is not None and F > 1:
            fl = (flow_pred - flow_gt) ** 2
            fl_mask = jnp.broadcast_to(both[:, :-1, None], flow_gt.shape)
            large = ((jnp.abs(flow_gt) > 0.5) * fl_mask).reshape(B, F - 1, -1) \
                .sum(2) > 0
            fl = fl * fl_mask * (1 - large[:, :, None, None, None]
                                 .astype(fl.dtype))
            denom = jnp.maximum(fl_mask.reshape(B, F - 1, -1).sum(2), 1.0)
            losses["flow_loss"] = fl.reshape(B, F - 1, -1).sum(2) / denom

        if dino_pred is not None and dino_gt is not None:
            dl = (dino_pred - dino_gt) ** 2 * both[:, :, None]
            losses["dino_feat_im_loss"] = mean_bf(dl)
        return losses

    def compute_regularizers(self, params, grid, sdf, prior_mesh, rng,
                             arti_params=None, deformation=None,
                             pose_raw=None, posed_bones=None,
                             class_vector=None, batch_size=1, num_frames=1):
        """(`AnimalModel.py:309-354`)"""
        feats = None if class_vector is None else \
            jax.lax.stop_gradient(class_vector)
        losses = dict(self.netBase.apply(
            {"params": params["netBase"]}, grid, sdf, prior_mesh, rng,
            feats=feats, method="sdf_reg_losses"))
        if arti_params is not None:
            losses["arti_reg_loss"] = jnp.mean(arti_params ** 2)
        if deformation is not None:
            losses["deform_reg_loss"] = jnp.mean(deformation ** 2)
        if prior_mesh is not None and \
                self.cfg_loss.prior_normal_reg_loss_weight > 0:
            faces = prior_mesh.t_pos_idx
            adj = jnp.concatenate([faces[:, 0:2], faces[:, 1:3]], 0)  # (2Fc,2)
            n = prior_mesh.v_nrm[0][adj]                              # (2Fc,2,3)
            diffs = 1.0 - jnp.sum(n[:, 0] * n[:, 1], -1)
            w = jnp.concatenate([prior_mesh.f_valid] * 2).astype(diffs.dtype)
            losses["prior_normal_reg_loss"] = \
                jnp.sum(diffs * w) / jnp.maximum(jnp.sum(w), 1.0)

        if "sequence" in self.data_type and self.num_frames > 1:
            cl = self.cfg_loss
            sm = lambda x: smooth_loss(x, cl.smooth_type, cl.loss_type)
            b, f = batch_size, num_frames
            if cl.deform_smooth_loss_weight > 0 and deformation is not None:
                losses["deform_smooth_loss"] = sm(expand_bf(deformation, b, f))
            if arti_params is not None:
                if cl.arti_smooth_loss_weight > 0:
                    losses["arti_smooth_loss"] = sm(arti_params)
                if cl.artivel_smooth_loss_weight > 0:
                    losses["artivel_smooth_loss"] = sm(
                        arti_params[:, 1:] - arti_params[:, :-1])
            if pose_raw is not None:
                campose = expand_bf(pose_raw, b, f)
                if cl.campose_smooth_loss_weight > 0:
                    losses["campose_smooth_loss"] = sm(campose)
                if cl.camposevel_smooth_loss_weight > 0:
                    losses["camposevel_smooth_loss"] = sm(
                        campose[:, 1:] - campose[:, :-1])
            if posed_bones is not None:
                if cl.bone_smooth_loss_weight > 0:
                    losses["bone_smooth_loss"] = sm(posed_bones)
                if cl.bonevel_smooth_loss_weight > 0:
                    losses["bonevel_smooth_loss"] = sm(
                        posed_bones[:, 1:] - posed_bones[:, :-1])
        return losses

    # -- rendering helpers --------------------------------------------------
    def background_image(self, N, h, w, dtype=jnp.float32):
        mode = self.cfg_render.background_mode
        if mode in ("none", "black"):
            return jnp.zeros((N, h, w, 3), dtype)
        if mode == "white":
            return jnp.ones((N, h, w, 3), dtype)
        if mode == "checkerboard":
            ys = (jnp.arange(h) // 8)[:, None]
            xs = (jnp.arange(w) // 8)[None, :]
            checker = ((ys + xs) % 2).astype(dtype) * 0.5 + 0.25
            return jnp.broadcast_to(checker[None, :, :, None], (N, h, w, 3))
        if mode in ("background", "input"):
            # the training forward passes the real background explicitly;
            # contexts without one (turntables, prior renders) fall back to
            # black rather than raising (the reference raises here,
            # `AnimalModel.py:226-233` — these modes never reach its render)
            return jnp.zeros((N, h, w, 3), dtype)
        raise NotImplementedError(mode)

    def render(self, params, render_modes, shape, mvp, w2c, campos,
               resolution, im_features=None, light_params=None,
               prior_mesh=None, use_dino=False, num_frames=None,
               class_vector=None, spp=None, background=None):
        """Functional analogue of `AnimalModel.render` (`:217-258`)."""
        h, w = resolution
        N = mvp.shape[0]
        material_fn = None
        if im_features is not None:
            material_fn = lambda tex_pos: self.netInstance.apply(
                {"params": params["netInstance"]}, tex_pos, im_features,
                method="sample_texture")
        if class_vector is not None and class_vector.shape[0] == 1 and N > 1:
            class_vector = jnp.broadcast_to(class_vector,
                                            (N, class_vector.shape[1]))
        dino_fn = None
        if use_dino:
            dino_fn = lambda tex_pos: self.netBase.apply(
                {"params": params["netBase"]}, tex_pos, class_vector,
                method="dino_field")
        if background is None:
            background = self.background_image(N, h, w)
        return render_mesh(
            shape, mvp, w2c, campos, (h, w), material_fn=material_fn,
            light_params=light_params, background=background,
            spp=spp or self.cfg_render.renderer_spp,
            render_modes=render_modes, prior_mesh=prior_mesh,
            dino_fn=dino_fn, num_frames=num_frames)

    # -- the training forward ----------------------------------------------
    def forward(self, params, batch, total_iter, rng, phase: Phase,
                grid: DeviceTetGrid = None):
        """Pure loss computation. Returns (total_loss, (metrics, aux)).

        `grid` must be passed as a jit *argument* (not closed over): the tet
        arrays are tens/hundreds of MB and would otherwise be embedded in the
        HLO as constants (which the axon remote-compile endpoint rejects).
        """
        images = batch["images"]
        B, F = images.shape[:2]
        h = w = self.out_image_size
        mask_gt = (batch["masks"][:, :, 0] > 0.9).astype(images.dtype)
        mask_dt = batch["mask_dt"] / self.in_image_size
        mask_valid = batch["mask_valid"]
        flow_gt = batch.get("flows")
        dino_feat_im = batch.get("dino_features")

        dino_gt = None
        if dino_feat_im is not None:
            d = resize_nchw(collapse_bf(dino_feat_im), (h, w))
            dino_gt = expand_bf(d, B, F)[:, :, :self.dino_feature_dim]
        image_gt = images
        if self.out_image_size != self.in_image_size:
            image_gt = expand_bf(
                resize_nchw(collapse_bf(image_gt), (h, w)), B, F)
            if flow_gt is not None:
                flow_gt = expand_bf(
                    resize_nchw(collapse_bf(flow_gt), (h, w)), B, F - 1)

        rngs = jax.random.split(rng, 5)
        _g, v_cap, f_cap = self.grid_for_phase(phase)
        if grid is None:
            grid = _g
        prior_mesh, sdf, class_vector, bank_aux = self.forward_base(
            params, grid, v_cap, f_cap, total_iter, rngs[0], phase, batch)

        (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
         deformation, arti_params, light_params, fw_aux) = \
            self.instance_forward(params, images, prior_mesh, total_iter,
                                  rngs, phase)

        final_losses = {}
        metrics = {}
        mask_pred = image_pred = None
        do_render = self.cfg_model.enable_render or not phase.is_training
        if do_render:
            # B may change at generation time (1 sequence × F frames)
            N_out = mvp.shape[0]
            if N_out != B * F:
                B = N_out // F
            render_flow = self.cfg_render.render_flow and F > 1
            render_modes = ["shaded", "dino_pred"] + \
                (["flow"] if render_flow else [])
            r_mvp, r_w2c, r_campos = self.render_cameras(mvp, w2c, campos)
            # real-background modes: composite the shaded buffer over the
            # input image or the dataset's cropped background frame (the
            # rgb loss is unmasked for these modes, `AnimalModel.py:271-282`)
            background = None
            bg_mode = self.cfg_render.background_mode
            if bg_mode in ("background", "input") and B * F == N_out:
                if bg_mode == "input":
                    bg_src = image_gt
                else:
                    bg_src = batch.get("bg_images")
                    if bg_src is None:
                        raise ValueError(
                            "background_mode=background needs bg_images "
                            "(dataset background_frame.jpg)")
                    if bg_src.shape[-1] != w:
                        bg_src = expand_bf(resize_nchw(
                            collapse_bf(bg_src), (h, w)), B, F)
                background = collapse_bf(bg_src).transpose(0, 2, 3, 1)
            renders = self.render(
                params, render_modes, shape, r_mvp, r_w2c, r_campos, (h, w),
                im_features=im_features, light_params=light_params,
                prior_mesh=prior_mesh, use_dino=True, num_frames=F,
                class_vector=class_vector, background=background)
            shaded = expand_bf(renders["shaded"], B, F)
            dino_pred = expand_bf(renders["dino_pred"], B, F)
            flow_pred = expand_bf(renders["flow"], B, F)[:, :-1] \
                if render_flow else None
            image_pred = shaded[:, :, :3]
            mask_pred = shaded[:, :, 3]

        if do_render and self.use_recon_losses(phase) and \
                image_pred.shape[:2] == image_gt.shape[:2]:
            losses = self.compute_reconstruction_losses(
                image_pred, image_gt, mask_pred, mask_gt, mask_dt, mask_valid,
                flow_pred, flow_gt, dino_gt, dino_pred,
                background_mode=self.cfg_render.background_mode)

            # hypothesis-probability weighting + logit loss (`:446-472`)
            rot_logit = fw_aux["rot_logit"]
            rot_prob = jax.lax.stop_gradient(fw_aux["rot_prob"])
            rot_idx = fw_aux["rot_idx"]
            num_hypos = self.netInstance.num_pose_hypos
            logit_target = jnp.zeros((B, F), images.dtype)
            for name, loss in losses.items():
                weight = self.logit_weight(name, total_iter)
                # pad (B, F-1) losses (flow) to (B, F) for the logit target
                loss_bf = loss if loss.shape[1] == F else jnp.pad(
                    loss, ((0, 0), (0, F - loss.shape[1])))
                logit_target = logit_target + loss_bf * weight

                prob = rot_prob.reshape(B, F)[:, :loss.shape[1]]
                loss = loss * prob * num_hypos
                if name == "flow_loss" and F > 1:
                    ri = rot_idx.reshape(B, F)
                    same = (ri[:, 1:] == ri[:, :-1]).astype(loss.dtype)
                    loss = loss * same
                final_losses[name] = loss.mean()
            logit_target = jax.lax.stop_gradient(collapse_bf(logit_target))
            final_losses["logit_loss"] = jnp.mean(
                (rot_logit - logit_target) ** 2)
            metrics["logit_loss_target"] = logit_target.mean()

        regs = self.compute_regularizers(
            params, grid, sdf, prior_mesh, rngs[2],
            arti_params=arti_params, deformation=deformation,
            pose_raw=pose_raw, posed_bones=fw_aux.get("posed_bones"),
            class_vector=class_vector, batch_size=B, num_frames=F)
        final_losses.update(regs)

        total = 0.0
        for name, loss in final_losses.items():
            weight = self.loss_weight(name, total_iter)
            if isinstance(weight, (int, float)) and weight <= 0:
                continue
            gate = 1.0
            tex_range = self.cfg_predictor_instance.cfg_texture.texture_iter_range
            if name == "rgb_loss":
                gate = _in_range_traced(total_iter, tex_range)
            if name == "arti_reg_loss":
                gate = _in_range_traced(total_iter,
                                        self.cfg_loss.arti_reg_loss_iter_range)
            total = total + loss * weight * gate

        total = total + self.extra_losses(
            params, batch, total_iter, final_losses, metrics, locals())

        metrics.update({k: v for k, v in final_losses.items()})
        metrics["loss"] = total
        aux = {"mask_pred": mask_pred, "image_pred": image_pred,
               "shape": shape, "prior_mesh": prior_mesh, "pose": pose,
               "mvp": mvp, "w2c": w2c, "campos": campos,
               "im_features": im_features, "light_params": light_params,
               "arti_params": arti_params, "class_vector": class_vector,
               # logging-only extras (`AnimalModel.log_visuals`, `:517-636`);
               # DCE'd out of the train step, which returns only metrics
               "pose_raw": pose_raw, "deformation": deformation,
               "sdf": sdf, "mask_gt": mask_gt,
               "dino_pred": dino_pred if do_render else None,
               "dino_gt": dino_gt,
               "flow_pred": flow_pred if do_render else None,
               "flow_gt": flow_gt,
               "rots_probs": fw_aux.get("rots_probs"),
               "posed_bones": fw_aux.get("posed_bones"),
               **{k: fw_aux[k] for k in ("rot_idx", "rand_pose_flag")}}
        return total, (metrics, aux)

    # -- hooks for subclasses ------------------------------------------------
    def instance_forward(self, params, images, prior_mesh, total_iter, rngs,
                         phase: Phase):
        return self.netInstance.apply(
            {"params": params["netInstance"]}, images, prior_mesh,
            total_iter, rngs[1], phase, rngs={"vae": rngs[4]})

    def forward_base(self, params, grid, v_cap, f_cap, total_iter, rng,
                     phase: Phase, batch):
        """netBase forward; Fauna overrides to thread the memory bank."""
        jitter = rng if phase.is_training else None
        prior_mesh, sdf = self.netBase.apply(
            {"params": params["netBase"]}, grid, v_cap, f_cap, total_iter,
            jitter)
        return prior_mesh, sdf, None, {}

    def extra_losses(self, params, batch, total_iter, final_losses, metrics,
                     ctx):
        return 0.0

    def use_recon_losses(self, phase: Phase) -> bool:
        return True

    def render_cameras(self, mvp, w2c, campos):
        return mvp, w2c, campos

    def frozen_param(self, keys) -> bool:
        """Optimizer masking hook; True → parameter never updated."""
        return False


def _in_range_traced(total_iter, rng_pair):
    lo, hi = float(rng_pair[0]), float(rng_pair[1])
    x = jnp.asarray(total_iter, jnp.float32)
    ok = (x >= lo) & ((x < hi) if np.isfinite(hi) else jnp.asarray(True))
    return ok.astype(jnp.float32)
