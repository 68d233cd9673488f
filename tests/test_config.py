import dataclasses
import math

from animals3d_tpu import config


def test_compose_train_magicpony_horse():
    cfg = config.load_config("train_magicpony_horse")
    assert cfg["run_train"] is True
    assert cfg["num_iters"] == 140000
    assert cfg["dataset"]["batch_size"] == 10
    assert cfg["dataset"]["load_dino_feature"] is True
    # model group composed
    assert cfg["model"]["name"] == "MagicPony"
    # interpolation: spatial_scale propagated from cfg_render
    shape = cfg["model"]["cfg_predictor_base"]["cfg_shape"]
    assert shape["spatial_scale"] == 7
    assert cfg["model"]["cfg_predictor_instance"]["spatial_scale"] == 7
    assert cfg["model"]["cfg_predictor_instance"]["cfg_pose"]["fov"] == 25
    # 'inf' parsed to float
    assert shape["grid_res_coarse_iter_range"] == [0, 100000]
    tex = cfg["model"]["cfg_predictor_instance"]["cfg_texture"]
    assert math.isinf(tex["texture_iter_range"][1])
    # model-level dataset alias resolved to the root dataset node
    assert cfg["model"]["dataset"]["batch_size"] == 10


def test_overrides():
    cfg = config.load_config("train_magicpony_horse",
                             overrides=["num_iters=5", "dataset.batch_size=2"])
    assert cfg["num_iters"] == 5
    assert cfg["dataset"]["batch_size"] == 2


def test_bind_dataclass_defaults():
    @dataclasses.dataclass
    class Inner:
        a: int = 1
        b: float = 2.0

    @dataclasses.dataclass
    class Outer:
        x: int = 0
        inner: Inner = dataclasses.field(default_factory=Inner)

    out = config.bind(Outer, {"x": 5, "inner": {"a": 7}})
    assert out.x == 5 and out.inner.a == 7 and out.inner.b == 2.0
    # missing sub-dict falls back entirely to defaults
    out2 = config.bind(Outer, {"x": 1})
    assert out2.inner.a == 1


def test_in_range():
    assert config.in_range(5, (0, 10))
    assert not config.in_range(10, (0, 10))
    assert config.in_range(10**9, (0, float("inf")))
    assert config.in_range(3, (-1, 10), default_indicator=-1)
