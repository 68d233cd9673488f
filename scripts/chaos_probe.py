"""Quantify trajectory chaos in the train step: how much does a tiny
parameter perturbation move the bench loss after K adam steps?

Context (VERDICT r4 weak #2): the bench train loss moved 13.532 (r3) →
21.956 (r4) on identical seeds/config. The optimizer rewrite shipped in
r4 is proven update-equivalent (tests/test_config.py::
test_flattened_adam_equals_per_leaf — identical CPU loss trajectories to
6 decimals), so the remaining suspects are (a) cross-compilation rounding
differences (XLA re-fuses a changed module; reduction splits change ⇒
last-ulp differences in grads) amplified by (b) a chaotic trajectory.
This script measures (b): inject a relative perturbation δ into ONE
parameter leaf and report |Δloss|/|loss| after K steps vs δ.

Usage: python scripts/chaos_probe.py [K] [delta]  (CPU by default — the
trainer graph is identical math at tiny shapes.)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def run(K=30, delta=1e-6):
    from animals3d_tpu import config as cfglib
    from animals3d_tpu.models import build_model
    from animals3d_tpu.trainer import make_optimizer
    from __graft_entry__ import _fake_batch

    overrides = [
        "dataset.in_image_size=64", "dataset.out_image_size=64",
        "dataset.batch_size=2",
        "model.cfg_predictor_base.cfg_shape.grid_res=8",
        "model.cfg_predictor_base.cfg_shape.grid_res_coarse=8",
        "model.cfg_predictor_base.cfg_shape.num_layers=2",
        "model.cfg_predictor_base.cfg_shape.hidden_size=32",
        "model.cfg_predictor_base.cfg_dino.feature_dim=4",
        "dataset.dino_feature_dim=4",
    ]
    cfg = cfglib.load_config("train_magicpony_horse", overrides=overrides)
    from animals3d_tpu.precision import set_mixed_precision
    set_mixed_precision(cfg.get("mixed_precision"))
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    IT = 50000
    phase = model.phase_for_iter(IT)
    grid, v_cap, f_cap = model.grid_for_phase(phase)
    optimizer = make_optimizer(model, params)
    batch = _fake_batch(model, 2)

    @jax.jit
    def step(params, opt_state, i):
        b2 = jax.tree.map(
            lambda x: x + i.astype(x.dtype) * 1e-6
            if jnp.issubdtype(x.dtype, jnp.floating) else x, batch)
        (loss, _), grads = jax.value_and_grad(model.forward, has_aux=True)(
            params, b2, IT, jax.random.fold_in(jax.random.PRNGKey(1), i),
            phase, grid)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def trajectory(p0):
        opt_state = optimizer.init(p0)
        p = p0
        losses = []
        for i in range(K):
            p, opt_state, loss = step(p, opt_state, jnp.int32(i))
            losses.append(float(loss))
        return losses

    base = trajectory(params)

    # perturb ONE nonzero kernel leaf (biases are zero-init: a relative
    # perturbation of a zero leaf is a no-op) by relative delta
    def perturb(p):
        leaves = jax.tree_util.tree_leaves_with_path(p)
        target = None
        for path, leaf in leaves:
            if "netSDF" in jax.tree_util.keystr(path) \
                    and "kernel" in jax.tree_util.keystr(path) \
                    and float(jnp.abs(leaf).max()) > 0:
                target = path
                break
        assert target is not None
        print(f"perturbing {jax.tree_util.keystr(target)}")

        def f(path, leaf):
            return leaf * (1.0 + delta) if path == target else leaf
        return jax.tree_util.tree_map_with_path(f, p)

    pert = trajectory(perturb(params))
    print(f"K={K} delta={delta:g}")
    for k in (0, 4, 9, 14, 19, K - 1):
        rel = abs(pert[k] - base[k]) / max(abs(base[k]), 1e-9)
        amp = rel / delta
        print(f"  step {k + 1:3d}: loss {base[k]:.6f} vs {pert[k]:.6f} "
              f"rel-dev {rel:.2e} amplification {amp:.1e}x")
    return base, pert


if __name__ == "__main__":
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    d = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6
    run(K, d)
