"""End-to-end training-loop test on a synthetic tiny dataset."""
import json
import os

import numpy as np
import pytest

from animals3d_tpu import config as cfglib
from animals3d_tpu.data.synth import write_synth_dataset
from animals3d_tpu.models import build_model
from animals3d_tpu.trainer import Trainer

from test_animal_model import TINY_OVERRIDES


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    write_synth_dataset(str(d / "train"), n=4, size=64, dino_dim=4)
    write_synth_dataset(str(d / "test"), n=2, size=64, dino_dim=4)
    return d


def _cfg(synth_dir, ckpt_dir, extra=()):
    overrides = TINY_OVERRIDES + [
        f"dataset.train_data_dir={synth_dir}/train",
        f"dataset.val_data_dir={synth_dir}/test",
        f"dataset.test_data_dir={synth_dir}/test",
        f"checkpoint_dir={ckpt_dir}",
        "dataset.num_workers=2",
        "num_iters=3",
        "save_checkpoint_freq=2",
        "log_loss_freq=1",
        "use_logger=false",
        *extra,
    ]
    return cfglib.load_config("train_magicpony_horse", overrides=overrides)


def test_train_loop_and_resume(synth_dir, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = _cfg(synth_dir, ckpt_dir, extra=["save_train_result_freq=3"])
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    trainer = Trainer(cfg, model)
    trainer.train()

    # checkpoint + metrics written
    names = sorted(os.listdir(ckpt_dir))
    assert any(n.startswith("checkpoint") for n in names), names
    with open(os.path.join(ckpt_dir, "metrics.json")) as f:
        data = json.load(f)
    losses = [m["loss"] for m in data["train"]]
    assert all(np.isfinite(l) for l in losses)

    # save_train_result_freq wrote eval-mode artifacts (`Trainer.py:281-284`)
    train_res = os.path.join(ckpt_dir, "train_results")
    assert os.path.isdir(train_res) and \
        any(f.endswith("_mesh.obj") for f in os.listdir(train_res))

    # resume: second trainer starts from the saved iteration
    cfg2 = _cfg(synth_dir, ckpt_dir, extra=["num_iters=4"])
    model2 = build_model({**dict(cfg2["model"]), "dataset": cfg2["dataset"]})
    trainer2 = Trainer(cfg2, model2)
    trainer2.train()
    names2 = sorted(os.listdir(ckpt_dir))
    assert any("0000004" in n for n in names2), names2


def test_test_path_writes_artifacts(synth_dir, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt_t")
    cfg = _cfg(synth_dir, ckpt_dir, extra=["num_iters=1"])
    model = build_model({**dict(cfg["model"]), "dataset": cfg["dataset"]})
    Trainer(cfg, model).train()

    cfg_t = _cfg(synth_dir, ckpt_dir,
                 extra=["run_train=false", "run_test=true",
                        "dataset.batch_size=2"])
    model_t = build_model({**dict(cfg_t["model"]), "dataset": cfg_t["dataset"]})
    result_dir = Trainer(cfg_t, model_t).test()
    files = os.listdir(result_dir)
    assert any(f.endswith("_mesh.obj") for f in files)
    assert any(f.endswith("_image_pred.png") for f in files)
    assert any(f.endswith("_pose.txt") for f in files)


def test_save_results_flow_artifacts(tmp_path):
    """Sequence-config test artifacts include flow_gt/flow_pred pngs
    (`AnimalModel.save_results`, `AnimalModel.py:650-656`)."""
    import numpy as np
    from animals3d_tpu.utils import results_io

    B, F, H = 1, 2, 16

    class Sh:
        pass

    sh = Sh()
    sh.v_valid = np.ones(4, bool)
    sh.f_valid = np.ones(2, bool)
    sh.t_pos_idx = np.zeros((2, 3), np.int32)
    sh.v_pos = np.zeros((B * F, 4, 3), np.float32)
    batch = {"images": np.zeros((B, F, 3, H, H)),
             "masks": np.zeros((B, F, 1, H, H)),
             "flows": np.full((B, F - 1, 2, H, H), 0.25)}
    aux = {"mask_pred": np.zeros((B, F, H, H)),
           "image_pred": np.zeros((B, F, 3, H, H)),
           "pose": np.zeros((B * F, 12)), "shape": sh,
           "flow_pred": np.full((B, F - 1, 2, H, H), -0.25)}
    results_io.save_results(None, batch, aux, str(tmp_path))
    fs = os.listdir(str(tmp_path))
    assert any(f.endswith("_flow_gt.png") for f in fs)
    assert any(f.endswith("_flow_pred.png") for f in fs)
    from PIL import Image
    img = np.asarray(Image.open(
        str(tmp_path / "0000000_00_flow_gt.png"))) / 255.0
    np.testing.assert_allclose(img[..., 0], 0.75, atol=0.01)  # 0.25 + 0.5
    np.testing.assert_allclose(img[..., 2], 0.5, atol=0.01)   # zero + 0.5


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not mounted")
def test_warm_start_from_reference_pth(tmp_path):
    """`checkpoint_path: *.pth` warm start (finetune/stage configs,
    `AnimalModel.py:127-132` strict=False): a REAL torch .pth with only
    netBase (built from the reference's own modules) converts, merges
    tolerantly, and training starts from those weights."""
    import sys
    import torch
    import jax
    import jax.numpy as jnp
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.models import build_model
    from animals3d_tpu.trainer import Trainer
    from animals3d_tpu import convert

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from compare_to_reference import (ensure_tets_npz, import_reference_dmtet,
                                      reference_netbase_sd)

    cfg = cfglib.load_config("train_magicpony_horse", overrides=TINY_OVERRIDES)
    cfg["model"]["dataset"] = cfg["dataset"]
    model = build_model(cfg["model"])
    base_cfg = model.cfg_predictor_base
    npz, _nv = ensure_tets_npz(None, base_cfg.cfg_shape.grid_res,
                               str(tmp_path))
    dm = import_reference_dmtet(npz)
    _geom, _dino, sd = reference_netbase_sd(
        dm, base_cfg.cfg_shape, base_cfg.cfg_dino, None, rng_seed=3)
    pth = str(tmp_path / "pretrained.pth")
    torch.save({"netBase": sd}, pth)

    synth = tmp_path / "data"
    write_synth_dataset(str(synth), n=2, size=64, dino_dim=4)
    overrides = TINY_OVERRIDES + [
        f"dataset.train_data_dir={synth}",
        f"checkpoint_dir={tmp_path / 'ckpt'}",
        f"+checkpoint_path={pth}",
        "num_iters=1", "save_checkpoint_freq=1", "use_logger=false",
        "dataset.num_workers=1",
    ]
    cfg2 = cfglib.load_config("train_magicpony_horse", overrides=overrides)
    model_cfg = dict(cfg2["model"])
    model_cfg["dataset"] = cfg2["dataset"]
    model2 = build_model(model_cfg)
    trainer = Trainer(cfg2, model2)

    # the warm-started params must carry the converted reference weights
    params = model2.init_params(jax.random.PRNGKey(0))
    warm = trainer._warm_start(params, pth)
    want = convert.convert_net_base(
        {k: v.detach().numpy() for k, v in sd.items()}
        if hasattr(next(iter(sd.values())), "detach") else sd, model2)
    got_leaf = jax.tree_util.tree_leaves(warm["netBase"])[0]
    want_leaf = jax.tree_util.tree_leaves(want)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(want_leaf),
                               atol=1e-6)
    # netInstance absent from the .pth -> kept at init
    init_leaf = jax.tree_util.tree_leaves(params["netInstance"])[0]
    warm_inst = jax.tree_util.tree_leaves(warm["netInstance"])[0]
    np.testing.assert_array_equal(np.asarray(init_leaf),
                                  np.asarray(warm_inst))
    trainer.train()    # one iteration from the warm start runs green


def test_logging_path_writes_tensorboard_events(tmp_path, capsys):
    """use_logger=true end-to-end: scalar logging + the full `log_visuals`
    path (grids, histograms, bone overlays, turntable videos —
    `utils/visual_log.py`, reference `AnimalModel.log_visuals:517-636`)
    run through two training iterations and write tensorboard event files."""
    from animals3d_tpu.data.synth import write_synth_dataset
    from animals3d_tpu.models import build_model
    from animals3d_tpu.trainer import Trainer

    synth = tmp_path / "data"
    write_synth_dataset(str(synth), n=4, size=64, dino_dim=4)
    ckpt_dir = str(tmp_path / "ckpt")
    overrides = TINY_OVERRIDES + [
        f"dataset.train_data_dir={synth}",
        f"dataset.val_data_dir={synth}",
        f"checkpoint_dir={ckpt_dir}",
        "num_iters=2", "save_checkpoint_freq=2",
        "use_logger=true", "log_loss_freq=1", "log_image_freq=2",
        "log_train=true", "log_val=true",
        "dataset.num_workers=1",
        # articulation on so bone overlays + posed histograms render
        "model.cfg_predictor_instance.cfg_articulation.articulation_iter_range=[0, inf]",
    ]
    cfg = cfglib.load_config("train_magicpony_horse", overrides=overrides)
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    trainer = Trainer(cfg, build_model(model_cfg))
    trainer.train()
    logdir = os.path.join(ckpt_dir, "logs")
    events = [f for f in os.listdir(logdir) if "tfevents" in f]
    assert events, os.listdir(logdir)
    assert os.path.getsize(os.path.join(logdir, events[0])) > 1000
    # the trainer swallows visual-logging exceptions to protect training;
    # the test must NOT — any silent skip is a failure here
    out = capsys.readouterr().out
    assert "log_visuals failed" not in out, out
    assert "turntable logging skipped" not in out, out
