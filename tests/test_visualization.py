"""Visualization pipeline test on a tiny trained checkpoint."""
import os

import numpy as np
import pytest

from animals3d_tpu import config as cfglib
from animals3d_tpu.data.synth import write_synth_dataset
from animals3d_tpu.models import build_model
from animals3d_tpu.trainer import Trainer
from animals3d_tpu.visualization import Visualizer

from test_animal_model import TINY_OVERRIDES


def test_visualizer_modes(tmp_path):
    synth = tmp_path / "data"
    write_synth_dataset(str(synth), n=2, size=64, dino_dim=4)
    ckpt_dir = str(tmp_path / "ckpt")
    overrides = TINY_OVERRIDES + [
        f"dataset.train_data_dir={synth}",
        f"dataset.test_data_dir={synth}",
        f"checkpoint_dir={ckpt_dir}",
        "num_iters=1", "save_checkpoint_freq=1", "use_logger=false",
        "dataset.num_workers=1",
    ]
    cfg = cfglib.load_config("train_magicpony_horse", overrides=overrides)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    Trainer(cfg, model).train()

    # two keyframe files -> 6-frame reference-style animation
    anim = tmp_path / "anim"
    anim.mkdir()
    K = model.netInstance.num_bones
    for i, scale in enumerate((0.0, 20.0)):
        np.savetxt(str(anim / f"arti_params_{i:02d}.txt"),
                   np.full((K, 3), scale))

    vis_cfg = dict(cfg)
    vis_cfg["output_dir"] = str(tmp_path / "vis")
    vis_cfg["render_modes"] = ["input_view", "other_views", "animation",
                               "canonicalization"]
    vis_cfg["arti_param_dir"] = str(anim)
    vis_cfg["canon_frames"] = 5
    vis_cfg["resolution"] = 64
    vis_cfg["spp"] = 1
    vis_cfg["evaluate_keypoint"] = True
    out_dir = Visualizer(vis_cfg).run()

    files = os.listdir(out_dir)
    assert any(f.endswith("_input_view.png") for f in files)
    assert any("_other_view_" in f for f in files)
    assert any(f.endswith("_animation.mp4") for f in files)
    assert any(f.endswith("_canonicalization.mp4") for f in files)
    assert any(f.endswith("_2d_projection_uv.txt") for f in files)
    assert any(f.endswith("_binary_occlusion.txt") for f in files)
    # uv projections within clip range for most vertices
    uvf = [f for f in files if f.endswith("_2d_projection_uv.txt")][0]
    uv = np.loadtxt(os.path.join(out_dir, uvf))
    assert uv.shape[1] == 2


def test_articulate_with_angles(tmp_path):
    import jax
    import jax.numpy as jnp
    cfg = cfglib.load_config("train_magicpony_horse", overrides=TINY_OVERRIDES)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    phase = model.phase_for_iter(0)
    grid, v_cap, f_cap = model.grid_for_phase(phase)
    prior_mesh, _, _, _ = model.forward_base(
        params, grid, v_cap, f_cap, 0, None, phase, {})
    K = model.netInstance.num_bones
    zero = model.netInstance.apply(
        {"params": params["netInstance"]}, prior_mesh,
        jnp.zeros((1, 1, K, 3)), method="articulate_with_angles")
    np.testing.assert_allclose(np.asarray(zero.v_pos[0]),
                               np.asarray(prior_mesh.v_pos[0]), atol=1e-4)
    bent = model.netInstance.apply(
        {"params": params["netInstance"]}, prior_mesh,
        jnp.full((1, 1, K, 3), 0.3), method="articulate_with_angles")
    moved = np.abs(np.asarray(bent.v_pos[0]) -
                   np.asarray(prior_mesh.v_pos[0])).max()
    assert moved > 0.01


def test_keyframe_sequence_loading(tmp_path):
    """Reference keyframe scheme (`visualize_results.py:429-443`): degrees →
    radians, 5-step interpolation between consecutive keyframes."""
    d = tmp_path / "anim"
    d.mkdir()
    k0 = np.zeros((20, 3))
    k1 = np.full((20, 3), 90.0)
    k2 = np.full((20, 3), -45.0)
    for i, k in enumerate((k0, k1, k2)):
        np.savetxt(str(d / f"arti_params_{i:02d}.txt"), k)
    vis = Visualizer.__new__(Visualizer)
    vis.cfg = {"arti_param_dir": str(d)}
    seq = vis._keyframe_sequence()
    assert seq.shape == ((3 - 1) * 5 + 1, 20, 3)
    np.testing.assert_allclose(seq[0], 0.0)
    np.testing.assert_allclose(seq[5], np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(seq[-1], -np.pi / 4, rtol=1e-6)
    # linear between keyframes
    np.testing.assert_allclose(seq[1], np.pi / 2 * 0.2, rtol=1e-6)
    vis.cfg = {}
    assert vis._keyframe_sequence() is None
