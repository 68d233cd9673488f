"""Offline visualization: render modes, turntables, animation, finetuning.

Reference: `/root/reference/visualization/visualize_results.py` (609 LoC) and
`visualize_results_fauna.py` (642 LoC): direct netBase/netInstance invocation
without the Trainer; render modes `input_view`, `other_views` (12 azimuths),
`rotation` (75-frame turntable), `animation` (keyframe articulation
interpolation from txt files, `:409-518`), `canonicalization` (morph to the
canonical pose, `:520-595`); test-time texture finetuning (`:144-190`);
keypoint-transfer artifact dumps (`:213-272`, consumed by
`evaluation.evaluate`).

Entry: `python -m animals3d_tpu.visualization --config-name test_magicpony_horse`.
"""
from __future__ import annotations

import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu import checkpoint as ckpt
from animals3d_tpu import config as cfglib
from animals3d_tpu.geometry.skinning import euler_angles_to_matrix
from animals3d_tpu.ops.rasterize import rasterize
from animals3d_tpu.render.camera import xfm_points
from animals3d_tpu.utils import results_io


def azimuth_rotation(angle):
    """4x4 rotation about +y by `angle` (turntable camera orbits)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, zero, s, zero], -1),
        jnp.stack([zero, one, zero, zero], -1),
        jnp.stack([-s, zero, c, zero], -1),
        jnp.stack([zero, zero, zero, one], -1)], -2)


def orbit_cameras(mvp, w2c, campos, angles):
    """Rotate one camera around the object by each angle → batched cameras."""
    rot = azimuth_rotation(jnp.asarray(angles))            # (K, 4, 4)
    mvp_k = jnp.einsum("ij,kjl->kil", mvp, rot)
    w2c_k = jnp.einsum("ij,kjl->kil", w2c, rot)
    campos_k = jnp.einsum("kji,j->ki", rot[:, :3, :3], campos)
    return mvp_k, w2c_k, campos_k


class Visualizer:
    def __init__(self, cfg: dict):
        from animals3d_tpu.models import build_model
        self.cfg = cfg
        model_cfg = dict(cfg.get("model") or {})
        model_cfg["dataset"] = cfg.get("dataset")
        self.model = build_model(model_cfg)
        self.render_modes = tuple(cfg.get("render_modes",
                                          ("input_view",)))
        self.output_dir = cfg.get("output_dir", "visualization")
        self.resolution = int(cfg.get("resolution", 256))
        self.finetune_texture = bool(cfg.get("finetune_texture", False))
        self.finetune_iters = int(cfg.get("finetune_iters", 10))
        self.finetune_lr = float(cfg.get("finetune_lr", 0.001))
        self.evaluate_keypoint = bool(cfg.get("evaluate_keypoint", False))

    # -- weights ------------------------------------------------------------
    def load_params(self):
        model = self.model
        params = model.init_params(jax.random.PRNGKey(0))
        name = self.cfg.get("checkpoint_name")
        cdir = self.cfg.get("checkpoint_dir", ".")
        if name and name.endswith(".pth"):
            from animals3d_tpu import convert
            path = os.path.join(cdir, name)
            converted = convert.convert_checkpoint(path, model)
            from animals3d_tpu.checkpoint import _merge
            from flax import serialization
            init_sd = serialization.to_state_dict(params)
            merged, missing, _ = _merge(init_sd, converted)
            params = serialization.from_state_dict(params, merged)
        else:
            state, _ = ckpt.load_checkpoint(cdir, {"params": params},
                                            checkpoint_name=name)
            params = state["params"]
        return params

    # -- forward ------------------------------------------------------------
    def reconstruct(self, params, images, total_iter=10 ** 9):
        model = self.model
        phase = model.phase_for_iter(total_iter, is_training=False)
        grid, v_cap, f_cap = model.grid_for_phase(phase)
        batch = {"images": images}
        prior_mesh, sdf, class_vector, _ = model.forward_base(
            params, grid, v_cap, f_cap, total_iter, jax.random.PRNGKey(0),
            phase, {"images": images})
        out = model.netInstance.apply(
            {"params": params["netInstance"]}, images, prior_mesh,
            total_iter, jax.random.PRNGKey(1), phase,
            rngs={"vae": jax.random.PRNGKey(2)})
        return prior_mesh, class_vector, out

    def render_views(self, params, shape, prior_mesh, mvp, w2c, campos,
                     im_features, light_params, class_vector=None,
                     modes=("shaded", "geo_normal")):
        h = w = self.resolution
        return self.model.render(
            params, list(modes), shape, mvp, w2c, campos, (h, w),
            im_features=im_features, light_params=light_params,
            prior_mesh=prior_mesh, use_dino=False, num_frames=1,
            class_vector=class_vector, spp=int(self.cfg.get("spp", 4)))

    # -- texture finetuning (`visualize_results.py:144-190`;
    #    fauna hand-rolled variant `visualize_results_fauna.py:150-207`) ----
    def finetune(self, params, batch, total_iter=10 ** 9):
        import optax
        model = self.model
        phase = model.phase_for_iter(total_iter, is_training=False) \
            ._replace(is_training=True)
        grid, _, _ = model.grid_for_phase(phase)
        opt = optax.adam(self.finetune_lr)
        tex_params = params["netInstance"]["netTexture"]
        opt_state = opt.init(tex_params)
        fauna_style = type(model).__name__ == "Fauna" or \
            self.cfg.get("fauna_finetune_loss", False)

        def loss_fn(tex_p):
            p = {**params, "netInstance": {**params["netInstance"],
                                           "netTexture": tex_p}}
            if fauna_style:
                # fauna viz finetune: plain unmasked L1 on the input view,
                # eval-phase nets (`visualize_results_fauna.py:195-203`)
                eval_phase = phase._replace(is_training=False)
                _, (_m, aux) = model.forward(p, batch, total_iter,
                                             jax.random.PRNGKey(0),
                                             eval_phase, grid)
                img_gt = batch["images"].reshape(
                    -1, *batch["images"].shape[2:])
                img_pred = aux["image_pred"].reshape(*img_gt.shape)
                return jnp.mean(jnp.abs(img_pred - img_gt))
            loss, _ = model.forward(p, batch, total_iter,
                                    jax.random.PRNGKey(0), phase, grid)
            return loss

        step = jax.jit(lambda tp, os_: _sgd_step(loss_fn, opt, tp, os_))
        for _ in range(self.finetune_iters):
            tex_params, opt_state, _ = step(tex_params, opt_state)
        return {**params, "netInstance": {**params["netInstance"],
                                          "netTexture": tex_params}}

    # -- keypoint artifacts (`visualize_results.py:213-272`) ----------------
    def dump_keypoint_artifacts(self, prefix, shape, mvp):
        v_clip = xfm_points(shape.v_pos, mvp)
        uv = v_clip[..., :2] / v_clip[..., 3:4]            # (N, V, 2) in -1,1
        res = (self.resolution, self.resolution)
        rast = rasterize(v_clip, shape.t_pos_idx, shape.f_valid, res)
        # vertex visibility: a vertex is visible if any pixel's winning face
        # contains it
        fid = np.asarray(rast.face_id[0])
        faces = np.asarray(shape.t_pos_idx)
        vis = np.zeros(shape.v_pos.shape[1], bool)
        hit = np.unique(fid[fid > 0]) - 1
        vis[faces[hit].ravel()] = True
        results_io.save_txt(prefix + "_2d_projection_uv.txt",
                            np.asarray(uv[0]))
        results_io.save_txt(prefix + "_binary_occlusion.txt",
                            (~vis).astype(np.float32)[:, None], fmt="%d")
        results_io.save_txt(prefix + "_3d_vertices.txt",
                            np.asarray(shape.v_pos[0]))

    # -- main ---------------------------------------------------------------
    def run(self):
        from animals3d_tpu.data import util as dutil
        cfg_ds = self.cfg.get("dataset") or {}
        test_dir = cfg_ds.get("test_data_dir")
        stems = sorted(glob(os.path.join(test_dir, "**/*rgb.jpg"),
                            recursive=True))
        stems = [p[:-len("rgb.jpg")] for p in stems]
        os.makedirs(self.output_dir, exist_ok=True)
        params = self.load_params()
        size = cfg_ds.get("in_image_size", 256)

        for i, stem in enumerate(stems):
            image = dutil.load_image(stem + "rgb.jpg", size)
            images = jnp.asarray(image)[None, None]

            if self.finetune_texture:
                mask = dutil.load_image(stem + "mask.png", size, mode="L")
                batch = _single_image_batch(image, mask, size)
                params = self.finetune(params, batch)

            prior_mesh, class_vector, out = self.reconstruct(params, images)
            (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
             deformation, arti_params, light_params, aux) = out
            prefix = os.path.join(self.output_dir, f"{i:07d}")

            if self.evaluate_keypoint:
                self.dump_keypoint_artifacts(prefix, shape, mvp)
                # pose dump alongside the projections
                # (`visualize_results.py:215-217`)
                results_io.save_txt(prefix + "_pose.txt",
                                    np.asarray(pose)[:1])

            if "input_view" in self.render_modes:
                r = self.render_views(params, shape, prior_mesh, mvp, w2c,
                                      campos, im_features, light_params,
                                      class_vector,
                                      modes=("shaded", "geo_normal",
                                             "shading"))
                results_io.save_image(prefix + "_input_image.png", image)
                results_io.save_image(prefix + "_input_view.png",
                                      np.asarray(r["shaded"][0, :3]))
                results_io.save_image(prefix + "_input_view_geo_normal.png",
                                      np.asarray(r["geo_normal"][0]))
                sh = np.asarray(r["shading"][0])
                results_io.save_image(
                    prefix + "_input_view_shading.png",
                    np.broadcast_to(sh[:1], (3, *sh.shape[1:])))

            if "other_views" in self.render_modes:
                angles = np.linspace(0, 2 * np.pi, 12, endpoint=False)
                frames = self._orbit_frames(params, shape, prior_mesh, mvp,
                                            w2c, campos, im_features,
                                            light_params, angles,
                                            class_vector)
                for k, fr in enumerate(frames):
                    results_io.save_image(prefix + f"_other_view_{k:02d}.png",
                                          fr)

            if "rotation" in self.render_modes:
                angles = np.linspace(0, 2 * np.pi, 75, endpoint=False)
                frames = self._orbit_frames(params, shape, prior_mesh, mvp,
                                            w2c, campos, im_features,
                                            light_params, angles,
                                            class_vector)
                save_video(prefix + "_rotation.mp4", frames)

            if "animation" in self.render_modes and arti_params is not None:
                self._render_animation(prefix, params, out, prior_mesh,
                                       class_vector)

            if "canonicalization" in self.render_modes and \
                    arti_params is not None:
                self._render_canonicalization(prefix, params, out, prior_mesh,
                                              class_vector)
        return self.output_dir

    def _orbit_frames(self, params, shape, prior_mesh, mvp, w2c, campos,
                      im_features, light_params, angles, class_vector):
        frames = []
        for a in angles:
            mvp_k, w2c_k, campos_k = orbit_cameras(mvp[0], w2c[0], campos[0],
                                                   [a])
            light_k = None if light_params is None else light_params[:1]
            if light_k is not None:
                # hold the light fixed in WORLD space while the camera
                # orbits (`visualize_results.py:335-341`): camera-space dir
                # → world via w2c_R → back via the orbit camera's w2c_kᵀ
                d = light_k[..., :3] @ w2c[0, :3, :3] @ w2c_k[0, :3, :3].T
                light_k = jnp.concatenate([d, light_k[..., 3:]], -1)
            r = self.render_views(params, shape, prior_mesh, mvp_k, w2c_k,
                                  campos_k, im_features[:1], light_k,
                                  class_vector, modes=("shaded",))
            frames.append(np.asarray(r["shaded"][0, :3]))
        return frames

    def _apply_articulation(self, params, out, prior_mesh, angles_seq):
        """Re-skin the prior with given articulation angle sequences."""
        model = self.model
        (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
         deformation, arti_params, light_params, aux) = out
        phase = model.phase_for_iter(10 ** 9, is_training=False)
        meshes = []
        for angles in angles_seq:
            posed = model.netInstance.apply(
                {"params": params["netInstance"]}, prior_mesh,
                jnp.asarray(angles)[None, None],
                method="articulate_with_angles")
            meshes.append(posed)
        return meshes

    def _keyframe_sequence(self):
        """Load `arti_params*.txt` keyframes (degrees, (20, 3) each) from
        `cfg.arti_param_dir` and 5-step-interpolate between consecutive
        keyframes (`visualize_results.py:429-443`). → (N, K, 3) rad or
        None when no dir/files are configured."""
        d = self.cfg.get("arti_param_dir")
        files = sorted(glob(os.path.join(d, "arti_params*.txt"))) if d else []
        if not files:
            return None
        key = np.stack([np.loadtxt(f) for f in files], 0) / 180.0 * np.pi
        interp = 5
        seq = []
        for i in range(len(key) - 1):
            seq.append(key[i])
            for j in range(1, interp):
                t = j / interp
                seq.append(key[i] * (1 - t) + key[i + 1] * t)
        seq.append(key[-1])
        return np.stack(seq, 0)

    def _render_animation(self, prefix, params, out, prior_mesh,
                          class_vector):
        (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
         deformation, arti_params, light_params, aux) = out
        base = np.asarray(arti_params).reshape(-1, 3)
        K = base.shape[0]
        keyseq = self._keyframe_sequence()
        if keyseq is not None and keyseq.shape[1] == K:
            # reference keyframe animation (`visualize_results.py:409-518`):
            # canonical camera (identity pose, offset_extra=4) viewed from
            # -120° about y, full azimuth turn over the sequence, fixed
            # gray light (0,0,1, amb .2, diff .7)
            from animals3d_tpu.render.light import fixed_direction_light
            cpose = jnp.concatenate(
                [jnp.eye(3).reshape(-1), jnp.zeros((3,))])[None]
            mvp0, w2c0, campos0 = self.model.netInstance.apply(
                {"params": params["netInstance"]}, cpose, offset_extra=4.0,
                method="get_camera_extrinsics_from_pose")
            seq = list(keyseq)
            n = len(seq)
            view0 = -120.0 / 180.0 * np.pi
            angles = [view0 + 2 * np.pi * i / max(n - 1, 1)
                      for i in range(n)]
            light = fixed_direction_light(jnp.asarray([0.0, 0.0, 1.0]),
                                          0.2, 0.7, 1)
            cams = [orbit_cameras(mvp0[0], w2c0[0], campos0[0], [a])
                    for a in angles]
        else:
            # fallback: rest → predicted → rest on the input-view camera
            ts = np.linspace(0, 1, 15)
            seq = [base * t for t in np.concatenate([ts, ts[::-1]])]
            light = (None if light_params is None else light_params[:1])
            cams = [(mvp[:1], w2c[:1], campos[:1])] * len(seq)
        frames = []
        for angles_k, (mvp_k, w2c_k, campos_k) in zip(seq, cams):
            mesh_k = self.model.netInstance.apply(
                {"params": params["netInstance"]}, prior_mesh,
                jnp.asarray(np.asarray(angles_k).reshape(1, 1, K, 3)),
                method="articulate_with_angles")
            r = self.render_views(params, mesh_k, prior_mesh, mvp_k,
                                  w2c_k, campos_k, im_features[:1],
                                  light, class_vector, modes=("shaded",))
            frames.append(np.asarray(r["shaded"][0, :3]))
        save_video(prefix + "_animation.mp4", frames)

    def _render_canonicalization(self, prefix, params, out, prior_mesh,
                                 class_vector):
        """Morph predicted pose+articulation to the canonical -120° y view
        (`visualize_results.py:520-595`): axis-angle viewpoint interpolation,
        camera distance 10→14 (offset_extra 0→4), translation → 0,
        articulation → first keyframe (or rest), light direction held fixed
        in world space by counter-rotating into each frame's camera."""
        from animals3d_tpu.geometry.skinning import (axis_angle_to_matrix,
                                                     matrix_to_axis_angle)
        (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
         deformation, arti_params, light_params, aux) = out
        base = np.asarray(arti_params).reshape(1, 1, -1, 3)
        K = base.shape[2]
        keyseq = self._keyframe_sequence()
        target = (keyseq[0].reshape(1, 1, K, 3)
                  if keyseq is not None and keyseq.shape[1] == K
                  else np.zeros_like(base))
        R0 = np.asarray(pose)[0, :9].reshape(3, 3)
        T0 = np.asarray(pose)[0, 9:12]
        ori_axis = np.asarray(matrix_to_axis_angle(jnp.asarray(R0.T)))
        canon_axis = np.asarray(matrix_to_axis_angle(
            euler_angles_to_matrix(jnp.asarray([0.0, -120 / 180 * np.pi,
                                                0.0]), "XYZ")))
        n = int(self.cfg.get("canon_frames", 25))
        frames = []
        for fi in range(n):
            t = fi / (n - 1)
            axis = ori_axis * (1 - t) + canon_axis * t
            R = np.asarray(axis_angle_to_matrix(jnp.asarray(axis))).T
            cur_pose = jnp.asarray(np.concatenate(
                [R.reshape(-1), T0 * (1 - t)]).astype(np.float32))[None]
            mvp_k, w2c_k, campos_k = self.model.netInstance.apply(
                {"params": params["netInstance"]}, cur_pose,
                offset_extra=4.0 * t,
                method="get_camera_extrinsics_from_pose")
            angles = base * (1 - t) + target * t
            mesh_k = self.model.netInstance.apply(
                {"params": params["netInstance"]}, prior_mesh,
                jnp.asarray(angles), method="articulate_with_angles")
            light_k = light_params[:1] if light_params is not None else None
            if light_k is not None:
                # world-fixed light: dir @ w2c_R @ cur_w2c_Rᵀ
                d = light_k[..., :3] @ w2c[0, :3, :3] @ w2c_k[0, :3, :3].T
                light_k = jnp.concatenate([d, light_k[..., 3:]], -1)
            r = self.render_views(params, mesh_k, prior_mesh, mvp_k,
                                  w2c_k, campos_k, im_features[:1],
                                  light_k, class_vector, modes=("shaded",))
            frames.append(np.asarray(r["shaded"][0, :3]))
        save_video(prefix + "_canonicalization.mp4", frames)


def _single_image_batch(image, mask, size):
    from animals3d_tpu.data import util as dutil
    box = np.array([0, 100, 100, 512, 512, 1920, 1080, 10.0], np.float32)
    return {
        "images": jnp.asarray(image)[None, None],
        "masks": jnp.asarray(mask)[None, None],
        "mask_dt": jnp.asarray(dutil.compute_distance_transform(mask))[None, None],
        "mask_valid": jnp.asarray(dutil.get_valid_mask(box, size))[None, None],
        "flows": None, "bboxs": jnp.asarray(box)[None, None],
        "bg_images": None, "dino_features": None, "dino_clusters": None,
        "seq_idx": jnp.zeros((1,), jnp.int32),
        "frame_idx": jnp.zeros((1, 1), jnp.int32),
    }


def _sgd_step(loss_fn, opt, params, opt_state):
    import optax
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def save_video(path, frames_chw, fps=10):
    """mp4 via cv2 (the reference uses moviepy/cv2, `misc.py:119-142`)."""
    try:
        import cv2
    except ImportError:
        for i, f in enumerate(frames_chw):
            results_io.save_image(path.replace(".mp4", f"_{i:03d}.png"), f)
        return
    h, w = frames_chw[0].shape[1:]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames_chw:
        img = (np.clip(f, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        vw.write(img[..., ::-1])
    vw.release()


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-name", required=True, dest="config_name")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = cfglib.load_config(args.config_name, overrides=args.overrides)
    out = Visualizer(cfg).run()
    print(f"visualizations written to {out}")


if __name__ == "__main__":
    main()
