"""Ponymation tests: stage-1 sequence training, stage-2 VAE, generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animals3d_tpu import config as cfglib
from animals3d_tpu.models import build_model

TINY_PONY = [
    "dataset.in_image_size=64",
    "dataset.out_image_size=64",
    "dataset.batch_size=2",
    "dataset.num_frames=3",
    "model.cfg_predictor_base.cfg_shape.grid_res=8",
    "model.cfg_predictor_base.cfg_shape.grid_res_coarse=8",
    "model.cfg_predictor_base.cfg_shape.num_layers=2",
    "model.cfg_predictor_base.cfg_shape.hidden_size=32",
    "model.cfg_predictor_base.cfg_dino.num_layers=2",
    "model.cfg_predictor_base.cfg_dino.hidden_size=32",
    "model.cfg_predictor_base.cfg_dino.feature_dim=4",
    "model.cfg_predictor_instance.cfg_encoder.cout=32",
    "model.cfg_predictor_instance.cfg_texture.num_layers=2",
    "model.cfg_predictor_instance.cfg_texture.hidden_size=32",
    "model.cfg_predictor_instance.cfg_deform.num_layers=2",
    "model.cfg_predictor_instance.cfg_deform.hidden_size=32",
    "model.cfg_predictor_instance.cfg_articulation.num_layers=1",
    "model.cfg_predictor_instance.cfg_articulation.hidden_size=32",
    "model.cfg_predictor_instance.cfg_light.num_layers=2",
    "model.cfg_predictor_instance.cfg_light.hidden_size=32",
    "model.cfg_predictor_instance.cfg_motion_vae.latent_dim=32",
    "+model.cfg_predictor_instance.cfg_motion_vae.transformer_layer_num=1",
    "model.cfg_render.renderer_spp=1",
    "dataset.dino_feature_dim=4",
]


def _build(stage2: bool):
    name = "train_ponymation_horse_stage2" if stage2 else \
        "train_ponymation_horse_stage1"
    cfg = cfglib.load_config(name, overrides=TINY_PONY)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    return build_model(model_cfg)


def _fake_batch(seed, B=2, F=3, H=64, dino_dim=4):
    r = np.random.default_rng(seed)
    mask = np.zeros((B, F, 1, H, H), np.float32)
    mask[:, :, :, 16:48, 20:44] = 1.0
    return {
        "images": jnp.asarray(r.uniform(0, 1, (B, F, 3, H, H)).astype(np.float32)),
        "masks": jnp.asarray(mask),
        "mask_dt": jnp.asarray(r.uniform(0, 5, (B, F, 2, H, H)).astype(np.float32)),
        "mask_valid": jnp.ones((B, F, H, H)),
        "flows": None,
        "bboxs": jnp.zeros((B, F, 8)),
        "bg_images": None,
        "dino_features": jnp.asarray(
            r.uniform(0, 1, (B, F, dino_dim, 16, 16)).astype(np.float32)),
        "dino_clusters": None,
        "seq_idx": jnp.zeros((B,), jnp.int32),
        "frame_idx": jnp.zeros((B, F), jnp.int32),
    }


def test_stage1_forward_and_masking():
    model = _build(stage2=False)
    assert not model.enable_motion_vae
    # stage 1: only netArticulation trainable
    assert model.frozen_param(("netInstance", "netTexture", "mlp"))
    assert not model.frozen_param(("netInstance", "netArticulation", "block_0"))
    assert model.frozen_param(("netBase", "netSDF"))

    params = model.init_params(jax.random.PRNGKey(0))
    batch = _fake_batch(0)
    phase = model.phase_for_iter(150000)  # articulation + deform on
    total, (metrics, aux) = model.forward(params, batch, 150000,
                                          jax.random.PRNGKey(1), phase)
    assert np.isfinite(float(total))
    # sequence smoothness regularizers active
    assert "campose_smooth_loss" in metrics
    assert "artivel_smooth_loss" in metrics


def test_stage2_vae_losses_and_no_recon():
    model = _build(stage2=True)
    assert model.enable_motion_vae
    assert model.frozen_param(("netInstance", "netArticulation", "block_0"))
    assert not model.frozen_param(("netInstance", "netVAE", "encoder"))

    params = model.init_params(jax.random.PRNGKey(0))
    assert "netVAE" in params["netInstance"]
    batch = _fake_batch(1)
    phase = model.phase_for_iter(150000)
    total, (metrics, aux) = model.forward(params, batch, 150000,
                                          jax.random.PRNGKey(1), phase)
    assert np.isfinite(float(total))
    assert "arti_recon_loss" in metrics and "kld_loss" in metrics
    assert "rgb_loss" not in metrics     # recon losses disabled

    # gradients reach only the VAE among instance nets (others masked by
    # optimizer labels, but check VAE actually receives signal)
    g = jax.grad(lambda p: model.forward(p, batch, 150000,
                                         jax.random.PRNGKey(2), phase)[0])(params)
    vae_norm = sum(float(jnp.abs(l).sum()) for l in
                   jax.tree_util.tree_leaves(g["netInstance"]["netVAE"]))
    assert vae_norm > 0


def test_stage2_generation_path():
    model = _build(stage2=True)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _fake_batch(2)
    phase = model.phase_for_iter(150000, is_training=False)
    total, (metrics, aux) = model.forward(params, batch, 150000,
                                          jax.random.PRNGKey(3), phase)
    # generated sequence: 1 sequence × F frames
    F = model.num_frames
    assert aux["shape"].v_pos.shape[0] == F
    assert aux["arti_params"].shape[:2] == (1, F)
    assert aux["mask_pred"].shape[1] == F


def test_stage1_trainer_test_path_writes_flow_artifacts(tmp_path):
    """Ponymation stage-1 train→test through the Trainer on synthetic
    sequences: the test artifacts include per-frame flow_gt/flow_pred pngs
    (reference `save_results`, `AnimalModel.py:650-656`)."""
    import os
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.trainer import Trainer

    root = tmp_path / "seq_ds"
    write_synth_dataset(str(root), size=64, dino_dim=4, sequences=2,
                        frames=4)
    ckpt_dir = str(tmp_path / "ckpt")
    overrides = TINY_PONY + [
        f"dataset.train_data_dir={root}",
        f"dataset.test_data_dir={root}",
        f"checkpoint_dir={ckpt_dir}",
        "num_iters=1", "save_checkpoint_freq=1",
        "use_logger=false", "dataset.num_workers=1", "run_test=true",
        "checkpoint_path=null",      # no pretrained MagicPony warm start
        "dataset.val_data_dir=null",
        "dataset.load_flow=true",    # exercise the flow batch + artifacts
        # reference default is false (`config/model/ponymation.yaml:23`);
        # enable to exercise flow rendering + flow_pred artifacts
        "model.cfg_render.render_flow=true",
    ]
    cfg = cfglib.load_config("train_ponymation_horse_stage1",
                             overrides=overrides)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    trainer = Trainer(cfg, model)
    trainer.train()
    trainer.test()
    out = os.path.join(ckpt_dir, "test_results_0000001")
    files = os.listdir(out)
    assert any(f.endswith("_image_pred.png") for f in files)
    assert any(f.endswith("_flow_gt.png") for f in files), files[:8]
    assert any(f.endswith("_flow_pred.png") for f in files), files[:8]


def test_sequence_dataset_background_and_flow_loading(tmp_path):
    """Sequence dataset loads per-sequence backgrounds and 16-bit flows
    (`SequenceDataset.py:94-100,136-140`)."""
    from animals3d_tpu.data.sequence_dataset import NFrameSequenceDataset
    from animals3d_tpu.data.synth import write_synth_dataset

    root = str(tmp_path / "seq")
    write_synth_dataset(root, size=32, dino_dim=4, sequences=1, frames=4)
    ds = NFrameSequenceDataset(
        root, num_frames=3, skip_beginning=0, skip_end=0, min_seq_len=2,
        in_image_size=32, out_image_size=32, load_flow=True,
        load_background=True, load_dino_feature=True, dino_feature_dim=4)
    s = ds[0]
    assert s["images"].shape == (3, 3, 32, 32)
    assert s["flows"].shape == (2, 2, 32, 32)
    assert s["bg_images"].shape == (3, 3, 32, 32)
    # flow decode: near-zero motion encoded around 0.5 * 65535
    assert abs(float(s["flows"].mean())) < 0.1
