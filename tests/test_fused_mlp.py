"""Parity tests for the fused CoordMLP lattice sweep (ops/fused_mlp.py).

Oracle: the flax CoordMLP path itself (networks/mlp.py), exact f32 on CPU
(interpret mode). The fused kernel must match forward values AND the
parameter VJP — it replaces the netSDF dense sweep inside the train graph
(`predictors/base.py:get_prior_mesh`, reference behavior
`/root/reference/model/geometry/dmtet.py:294-310`).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animals3d_tpu.networks.mlp import CoordMLP, harmonic_embedding
from animals3d_tpu.ops import fused_mlp


SCALAR = 2 * np.pi / 7 * 0.9


def _make(num_layers=5, n=1000, freq=8, seed=0):
    mlp = CoordMLP(3, 1, num_layers, nf=256, activation=None, min_max=None,
                   n_harmonic_functions=freq, embedder_scalar=SCALAR,
                   embed_concat_pts=True)
    r = np.random.default_rng(seed)
    pts = jnp.asarray(r.uniform(-3, 3, (n, 3)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(seed), pts)["params"]
    e = jnp.concatenate([pts, harmonic_embedding(pts, freq, SCALAR)], -1)
    return mlp, params, pts, e


@pytest.mark.parametrize("num_layers,n", [(5, 1000), (2, 257), (5, 2048)])
def test_fwd_parity(num_layers, n):
    mlp, params, pts, e = _make(num_layers, n)
    ref = mlp.apply({"params": params}, pts)[:, 0]
    got = fused_mlp.mlp_sweep(params, e, num_layers=num_layers, tb=512)
    assert got.shape == (n,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vjp_parity():
    num_layers, n = 5, 1500
    mlp, params, pts, e = _make(num_layers, n)
    r = np.random.default_rng(1)
    w = jnp.asarray(r.normal(size=(n,)).astype(np.float32))

    def loss_ref(p):
        return jnp.sum(mlp.apply({"params": p}, pts)[:, 0] * w)

    def loss_fused(p):
        return jnp.sum(
            fused_mlp.mlp_sweep(p, e, num_layers=num_layers, tb=512) * w)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    v_f, g_f = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    assert len(flat_ref) == len(flat_f)
    for path, leaf in flat_ref:
        got = flat_f[path]
        scale = np.abs(np.asarray(leaf)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(leaf) / scale,
            rtol=0, atol=3e-6,
            err_msg=jax.tree_util.keystr(path))


def test_bf16_mode_close_to_f32():
    """bf16 compute tracks the f32 oracle to bf16-roundoff tolerances and
    matches the flax bf16 path closely (same per-layer truncation)."""
    from animals3d_tpu.precision import set_mixed_precision
    mlp, params, pts, e = _make(5, 1000)
    ref32 = mlp.apply({"params": params}, pts)[:, 0]
    try:
        set_mixed_precision("bf16")
        ref16 = mlp.apply({"params": params}, pts)[:, 0]
        got16 = fused_mlp.mlp_sweep(params, e, num_layers=5, tb=512)
    finally:
        set_mixed_precision(None)
    scale = float(jnp.abs(ref32).max())
    # fused-bf16 vs flax-bf16: identical truncation points, tiny accum diff
    assert float(jnp.abs(got16 - ref16).max()) / scale < 0.02
    # and both within bf16 roundoff of the f32 oracle
    assert float(jnp.abs(got16 - ref32).max()) / scale < 0.05


def test_integration_get_prior_mesh(monkeypatch):
    """A3D_FUSED_SDF=1 produces the same sdf + mesh as the flax sweep
    through BasePredictor.get_prior_mesh (f32, CPU interpret)."""
    from animals3d_tpu.geometry import tets as tetlib
    from animals3d_tpu.geometry.tets import DeviceTetGrid
    from animals3d_tpu.predictors.base import BasePredictor
    from animals3d_tpu.predictors.config import (BasePredictorConfig,
                                                 DINOConfig, ShapeConfig)

    cfg = BasePredictorConfig(
        cfg_shape=ShapeConfig(grid_res=16, spatial_scale=7.0, num_layers=5,
                              hidden_size=256, embedder_freq=8,
                              init_sdf="ellipsoid", jitter_grid=0.05,
                              symmetrize=True),
        cfg_dino=DINOConfig(feature_dim=4, num_layers=2, hidden_size=32))
    mod = BasePredictor(cfg)
    grid = DeviceTetGrid(tetlib.load_tet_grid(16, data_dir="/tmp/tets_cache"))
    v_cap, f_cap = 4096, 8192
    params = mod.init(jax.random.PRNGKey(0), grid, v_cap, f_cap,
                      method=BasePredictor.init_all)["params"]

    def run():
        mesh, sdf = mod.apply({"params": params}, grid, v_cap, f_cap,
                              0, jax.random.PRNGKey(7))
        return mesh, sdf

    # jitter_rng is passed below (training path), where the fused sweep is
    # now the DEFAULT — force =0 for the flax oracle arm
    monkeypatch.setenv("A3D_FUSED_SDF", "0")
    m0, s0 = run()
    monkeypatch.setenv("A3D_FUSED_SDF", "1")
    m1, s1 = run()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-5, atol=2e-5)
    assert int(m0.num_verts) == int(m1.num_verts)
    np.testing.assert_allclose(np.asarray(m1.v_pos), np.asarray(m0.v_pos),
                               atol=1e-4)
    # grads through the fused path exist and match
    def loss(p, fused):
        monkeypatch.setenv("A3D_FUSED_SDF", "1" if fused else "0")
        mesh, sdf = mod.apply({"params": p}, grid, v_cap, f_cap,
                              0, jax.random.PRNGKey(7))
        return jnp.sum(jnp.abs(sdf)) * 1e-3 + jnp.sum(mesh.v_pos ** 2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def test_fused_training_trajectory_matches_flax(monkeypatch):
    """The fused sweep is the TRAINING default: K adam steps through
    get_prior_mesh + marching tets + a mesh loss must track the flax
    trajectory (CPU f32, identical keys). Guards the default flip — a
    silent VJP bug would diverge within a few steps (the full model's
    amplification is ~1e5 over 30 steps, scripts/chaos_probe.py, so even
    tiny systematic grad errors would blow past this tolerance)."""
    import optax
    from animals3d_tpu.geometry import tets as tetlib
    from animals3d_tpu.geometry.tets import DeviceTetGrid
    from animals3d_tpu.predictors.base import BasePredictor
    from animals3d_tpu.predictors.config import (BasePredictorConfig,
                                                 DINOConfig, ShapeConfig)

    cfg = BasePredictorConfig(
        cfg_shape=ShapeConfig(grid_res=12, spatial_scale=7.0, num_layers=5,
                              hidden_size=256, embedder_freq=8,
                              init_sdf="ellipsoid", jitter_grid=0.05,
                              symmetrize=True),
        cfg_dino=DINOConfig(feature_dim=4, num_layers=2, hidden_size=32))
    mod = BasePredictor(cfg)
    grid = DeviceTetGrid(tetlib.load_tet_grid(12, data_dir="/tmp/tets_cache"))
    v_cap, f_cap = 2048, 4096
    params0 = mod.init(jax.random.PRNGKey(0), grid, v_cap, f_cap,
                       method=BasePredictor.init_all)["params"]
    tgt = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, v_cap, 3)).astype(np.float32)) * 0.1

    def loss_fn(p, key):
        mesh, sdf = mod.apply({"params": p}, grid, v_cap, f_cap, 0, key)
        # pull the surface toward a fixed target + keep sdf bounded:
        # grads flow through marching-tets interpolation into the MLP
        return (jnp.sum((mesh.v_pos - tgt) ** 2 * mesh.v_valid[None, :, None])
                + 1e-3 * jnp.sum(sdf ** 2))

    def run(fused):
        monkeypatch.setenv("A3D_FUSED_SDF", "1" if fused else "0")
        opt = optax.adam(1e-3)
        p = params0
        st = opt.init(p)
        losses = []
        for k in range(8):
            val, g = jax.value_and_grad(loss_fn)(p, jax.random.PRNGKey(k))
            up, st = opt.update(g, st, p)
            p = optax.apply_updates(p, up)
            losses.append(float(val))
        return losses

    la, lb = run(False), run(True)
    np.testing.assert_allclose(lb, la, rtol=2e-4)
