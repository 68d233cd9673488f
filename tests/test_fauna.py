"""Fauna end-to-end tests: bank retrieval, GAN losses, category batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animals3d_tpu import config as cfglib
from animals3d_tpu.data.synth import write_synth_dataset
from animals3d_tpu.models import build_model
from animals3d_tpu.models.fauna import parse_dict_definition

TINY_FAUNA = [
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
    "model.cfg_predictor_base.cfg_bank.memory_bank_size=14",
    "+model.cfg_predictor_base.cfg_bank.memory_bank_topk=3",
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
    cfg = cfglib.load_config("train_fauna", overrides=TINY_FAUNA)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    return build_model(model_cfg)


def _fake_batch(seed, B=2, F=1, H=64, dino_dim=4):
    r = np.random.default_rng(seed)
    mask = np.zeros((B, F, 1, H, H), np.float32)
    mask[:, :, :, 16:48, 20:44] = 1.0
    return {
        "images": jnp.asarray(r.uniform(0, 1, (B, F, 3, H, H)).astype(np.float32)),
        "masks": jnp.asarray(mask),
        "mask_dt": jnp.asarray(r.uniform(0, 5, (B, F, 2, H, H)).astype(np.float32)),
        "mask_valid": jnp.ones((B, F, H, H)),
        "flows": None,
        "bboxs": jnp.zeros((B, F, 9)),
        "bg_images": None,
        "dino_features": jnp.asarray(
            r.uniform(0, 1, (B, F, dino_dim, 16, 16)).astype(np.float32)),
        "dino_clusters": None,
        "seq_idx": jnp.zeros((B,), jnp.int32),
        "frame_idx": jnp.zeros((B, F), jnp.int32),
    }


def test_fauna_phases(model):
    p = model.phase_for_iter(100000)
    assert p.disc_on and p.constrain_legs and not p.leg_rot_started
    assert not p.zeroy          # nozeroy_start = 20000
    p2 = model.phase_for_iter(350000)
    assert not p2.disc_on and p2.leg_rot_started and not p2.constrain_legs
    p3 = model.phase_for_iter(10000)
    assert p3.zeroy and not p3.disc_on


def test_parse_dict_definition():
    d = {0: 10.0, 300000: 1.0}
    assert float(parse_dict_definition(d, jnp.asarray(100.0))) == 10.0
    assert float(parse_dict_definition(d, jnp.asarray(300001.0))) == 1.0


def test_fauna_forward_with_disc(model):
    params = model.init_params(jax.random.PRNGKey(0))
    assert "netDisc" in params
    batch = _fake_batch(0)
    phase = model.phase_for_iter(100000)   # disc window, articulation on
    total, (metrics, aux) = model.forward(params, batch, 100000,
                                          jax.random.PRNGKey(1), phase)
    assert np.isfinite(float(total))
    assert "mask_disc_loss" in metrics
    rec = metrics["_disc_record"]
    assert rec["mask_rv"].shape[1] == model.cfg_bank.memory_bank_dim + 1

    # discriminator step: loss finite, R1 penalty flows
    dloss, dgrads = jax.value_and_grad(model.discriminator_loss)(
        params["netDisc"], rec)
    assert np.isfinite(float(dloss))
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(dgrads))
    assert gnorm > 0


def test_fauna_gradients(model):
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _fake_batch(1)
    phase = model.phase_for_iter(30000)    # pre-disc, articulation on

    g = jax.grad(lambda p: model.forward(p, batch, 30000,
                                         jax.random.PRNGKey(2), phase)[0])(params)
    # memory bank and keys get gradients (bank key grads flow via cosine
    # weights; values via the blended embedding)
    mb = g["netBase"]["memory_bank"]
    assert np.isfinite(np.asarray(mb)).all() and float(jnp.abs(mb).sum()) > 0


def test_fauna_dataset_single_category_batches(tmp_path):
    root = tmp_path / "fauna_ds"
    for cat, n in (("bear", 5), ("cow", 3), ("horse", 4)):
        write_synth_dataset(str(root / "large_scale" / cat), n=n, size=32,
                            dino_dim=4)
    from animals3d_tpu.data.fauna_dataset import FaunaDataset
    ds = FaunaDataset(str(root), batch_size=2, load_dino_feature=True,
                      dino_feature_dim=4, in_image_size=32, out_image_size=32)
    assert ds.all_category_names == ["bear", "cow", "horse"]
    # each batch_size block maps to one category
    for start in range(0, 12, 2):
        labels = {int(ds[i]["bboxs"][0, 8]) for i in range(start, start + 2)}
        assert len(labels) == 1
    # all categories visited across consecutive blocks
    seen = {int(ds[start]["bboxs"][0, 8]) for start in range(0, 6, 2)}
    assert seen == {0, 1, 2}


def test_fauna_back_view_oversampling(tmp_path):
    """`few_shot_*_back` sibling trees are oversampled to (n//5)*4 entries
    and prepended (reference `FaunaDataset._more_back_views`,
    `/root/reference/model/dataset/FaunaDataset.py:313-323`)."""
    root = tmp_path / "fauna_ds"
    write_synth_dataset(str(root / "few_shot_web" / "panda"), n=12, size=32,
                        dino_dim=4)
    write_synth_dataset(str(root / "few_shot_web_back" / "panda"), n=3,
                        size=32, dino_dim=4)
    write_synth_dataset(str(root / "few_shot_web" / "okapi"), n=7, size=32,
                        dino_dim=4)  # no back tree
    from animals3d_tpu.data.fauna_dataset import FaunaDataset
    cats = FaunaDataset._parse_categories(str(root))
    # `_back` trees are not categories of their own
    assert sorted(cats) == ["okapi", "panda"]
    # 12 regular + (12//5)*4 = 8 oversampled back views, back views first
    assert len(cats["panda"]) == 20
    back = [s for s in cats["panda"] if "few_shot_web_back" in s]
    assert len(back) == 8 and cats["panda"][:8] == back
    # cyclic repeat of the 3 back stems: 2 full + 2 pad
    uniq = sorted(set(back))
    assert len(uniq) == 3 and back == uniq * 2 + uniq[:2]
    assert len(cats["okapi"]) == 7


def test_fauna_trainer_loop_with_disc(tmp_path):
    """Two Fauna training iterations inside the disc window: main step +
    discriminator step both execute and the checkpoint includes netDisc."""
    import os
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.trainer import Trainer

    root = tmp_path / "fauna_ds"
    for cat in ("bear", "cow"):
        write_synth_dataset(str(root / "large_scale" / cat), n=2, size=64,
                            dino_dim=4)
    ckpt_dir = str(tmp_path / "ckpt")
    overrides = TINY_FAUNA + [
        f"dataset.train_data_dir={root}",
        f"checkpoint_dir={ckpt_dir}",
        "num_iters=2", "save_checkpoint_freq=2", "log_loss_freq=1",
        "use_logger=false", "dataset.num_workers=1",
        # pull the disc window down so iteration 1-2 are inside it
        "model.cfg_mask_discriminator.enable_iter=[0, 100]",
        "model.cfg_predictor_instance.cfg_articulation.articulation_iter_range=[0, inf]",
    ]
    cfg = cfglib.load_config("train_fauna", overrides=overrides)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    assert model.phase_for_iter(1).disc_on
    trainer = Trainer(cfg, model)
    trainer.train()
    names = os.listdir(ckpt_dir)
    assert any(n.startswith("checkpoint") for n in names)


def test_fauna_visualizer_input_view(tmp_path):
    """Fauna visualization end-to-end: memory-bank class conditioning at
    test time (`visualize_results_fauna.py:218-223`) through the shared
    Visualizer — input_view render + keypoint artifacts from a trained
    tiny checkpoint."""
    import os
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.trainer import Trainer
    from animals3d_tpu.visualization import Visualizer

    root = tmp_path / "fauna_ds"
    write_synth_dataset(str(root / "large_scale" / "bear"), n=2, size=64,
                        dino_dim=4)
    ckpt_dir = str(tmp_path / "ckpt")
    overrides = TINY_FAUNA + [
        f"dataset.train_data_dir={root}",
        f"checkpoint_dir={ckpt_dir}",
        "num_iters=1", "save_checkpoint_freq=1",
        "use_logger=false", "dataset.num_workers=1",
    ]
    cfg = cfglib.load_config("train_fauna", overrides=overrides)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    Trainer(cfg, build_model(model_cfg)).train()

    vis_cfg = dict(cfg)
    vis_cfg["dataset"] = dict(cfg["dataset"])
    vis_cfg["dataset"]["test_data_dir"] = str(root / "large_scale" / "bear")
    vis_cfg["output_dir"] = str(tmp_path / "vis")
    vis_cfg["render_modes"] = ["input_view"]
    vis_cfg["resolution"] = 64
    vis_cfg["spp"] = 1
    vis_cfg["evaluate_keypoint"] = True
    out_dir = Visualizer(vis_cfg).run()
    files = os.listdir(out_dir)
    assert any(f.endswith("_input_view.png") for f in files)
    assert any(f.endswith("_2d_projection_uv.txt") for f in files)


def test_fauna_remake_dataloader_mid_training(tmp_path):
    """Fauna curriculum re-split (`Trainer.py:237-242`): at
    remake_dataloader_iter the loaders are rebuilt with
    dataset_split_num pseudo-categories and training continues."""
    import os
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.trainer import Trainer

    root = tmp_path / "fauna_ds"
    for cat in ("bear", "cow"):
        write_synth_dataset(str(root / "large_scale" / cat), n=4, size=64,
                            dino_dim=4)
    ckpt_dir = str(tmp_path / "ckpt")
    overrides = TINY_FAUNA + [
        f"dataset.train_data_dir={root}",
        f"checkpoint_dir={ckpt_dir}",
        "num_iters=3", "save_checkpoint_freq=3", "log_loss_freq=1",
        "use_logger=false", "dataset.num_workers=1",
        "remake_dataloader_iter=2", "remake_dataloader_num=2",
    ]
    cfg = cfglib.load_config("train_fauna", overrides=overrides)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    trainer = Trainer(cfg, build_model(model_cfg))
    trainer.train()
    assert trainer.cfg_dataset.dataset_split_num == 2
    assert any(n.startswith("checkpoint") for n in os.listdir(ckpt_dir))


def test_fauna_epoch_reshuffle_through_loader(tmp_path):
    """The Loader triggers FaunaDataset.set_epoch at each epoch boundary
    (reference `_shuffle_all`, `Trainer.py:224-225`): sample order changes
    across epochs while every batch stays single-category."""
    from animals3d_tpu.data.fauna_dataset import FaunaDataset
    from animals3d_tpu.data.loaders import Loader
    from animals3d_tpu.data.synth import write_synth_dataset

    root = tmp_path / "ds"
    for cat in ("bear", "cow"):
        write_synth_dataset(str(root / "large_scale" / cat), n=6, size=32,
                            dino_dim=4)
    ds = FaunaDataset(str(root), batch_size=2, in_image_size=32,
                      out_image_size=32, shuffle=True)
    loader = Loader(ds, 2, shuffle=False, num_workers=1, drop_last=True,
                    seed=0, infinite=False)

    def run_epoch():
        for b in loader:
            ids = np.asarray(b["bboxs"])[:, 0, -1]       # category column
            assert (ids == ids[0]).all()                 # single-category
        return {k: list(v) for k, v in ds._padded.items()}

    order0 = run_epoch()
    order1 = run_epoch()      # second epoch: set_epoch(1) reshuffles
    assert ds._epoch == 1
    assert order0 != order1   # within-category order changed
