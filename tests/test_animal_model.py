"""End-to-end MagicPony training-forward test on tiny shapes."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animals3d_tpu import config as cfglib
from animals3d_tpu.models import build_model

TINY_OVERRIDES = [
    "dataset.in_image_size=64",
    "dataset.out_image_size=64",
    "dataset.batch_size=2",
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
    "dataset.dino_feature_dim=4",
]


@pytest.fixture(scope="module")
def model():
    cfg = cfglib.load_config("train_magicpony_horse", overrides=TINY_OVERRIDES)
    cfg["model"]["dataset"] = cfg["dataset"]
    return build_model(cfg["model"])


def _fake_batch(rng, B=2, F=1, H=64, dino_dim=4):
    r = np.random.default_rng(rng)
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


def test_forward_loss_finite(model):
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _fake_batch(0)
    phase = model.phase_for_iter(20000)   # articulation on, deform off
    assert phase.articulation_on and not phase.deform_on
    total, (metrics, aux) = model.forward(params, batch, 20000,
                                          jax.random.PRNGKey(1), phase)
    assert np.isfinite(float(total))
    for k in ("mask_loss", "mask_inv_dt_loss", "rgb_loss",
              "dino_feat_im_loss", "logit_loss", "sdf_gradient_reg_loss",
              "arti_reg_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert aux["mask_pred"].shape == (2, 1, 64, 64)


def test_grads_flow_to_all_trainable_params(model):
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _fake_batch(1)
    phase = model.phase_for_iter(95000)   # deform + articulation on
    assert phase.deform_on

    grad_fn = jax.grad(lambda p: model.forward(p, batch, 95000,
                                               jax.random.PRNGKey(2), phase)[0])
    g = grad_fn(params)

    flat = jax.tree_util.tree_leaves_with_path(g)
    zero_paths = []
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        norm = float(jnp.abs(leaf).sum())
        assert np.isfinite(norm), name
        if norm == 0 and "ViT" not in name:
            zero_paths.append(name)
    # frozen ViT gets zero grads by design; everything else must receive some
    nonvit = [p for p in zero_paths if "ViT" not in p]
    # allow a small number of dead paths (e.g. unused ks/nrm texture rows)
    assert len(nonvit) < 8, nonvit


def test_phase_schedule(model):
    p0 = model.phase_for_iter(0)
    assert p0.use_coarse_grid and not p0.articulation_on and not p0.deform_on
    p1 = model.phase_for_iter(15000)
    assert p1.articulation_on and not p1.attach_legs
    p2 = model.phase_for_iter(70000)
    assert p2.attach_legs
    p3 = model.phase_for_iter(120000)
    assert not p3.use_coarse_grid and p3.deform_on


def test_background_modes_input_and_background():
    """background_mode input|background: shaded composites over a real image
    and the rgb loss is unmasked (`AnimalModel.py:271-282`)."""
    for mode, with_bg in (("input", False), ("background", True)):
        cfg = cfglib.load_config(
            "train_magicpony_horse",
            overrides=TINY_OVERRIDES + [
                f"model.cfg_render.background_mode={mode}",
                f"dataset.background_mode={mode}"])
        cfg["model"]["dataset"] = cfg["dataset"]
        m = build_model(cfg["model"])
        params = m.init_params(jax.random.PRNGKey(0))
        batch = _fake_batch(3)
        if with_bg:
            batch["bg_images"] = batch["images"] * 0.0 + 0.75
        phase = m.phase_for_iter(20000)
        loss, (metrics, aux) = jax.jit(
            lambda p, b, r: m.forward(p, b, 20000, r, phase))(
            params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        # outside the silhouette the prediction equals the background, so
        # the unmasked rgb loss sees it: shaded buffer must not be black
        # everywhere outside the mask
        img = np.asarray(aux["image_pred"])         # (B, F, 3, H, W)
        mask = np.asarray(aux["mask_pred"])         # (B, F, H, W)
        outside = img[np.broadcast_to((mask < 0.5)[:, :, None], img.shape)]
        assert outside.mean() > 0.05, f"{mode}: background not composited"


def test_image_dataset_loads_background(tmp_path):
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.data.image_dataset import ImageDataset
    d = write_synth_dataset(str(tmp_path / "s"), n=2, size=64, dino_dim=4)
    ds = ImageDataset(d, in_image_size=64, out_image_size=64,
                      load_background=True)
    s = ds[0]
    assert s["bg_images"].shape == (1, 3, 64, 64)
    assert 0.0 < s["bg_images"].mean() < 1.0
