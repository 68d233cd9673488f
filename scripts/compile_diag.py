"""Diagnose cold-compile cost of the bench graphs (no TPU needed).

Lowers the full-size recon and train-step graphs on CPU, reporting
Python-trace time, StableHLO size, and per-op-kind counts — the levers
that drive the remote XLA compile time (BENCH_r01: 482 s cold).
"""
from __future__ import annotations

import collections
import os
import re
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon sitecustomize forces the TPU platform programmatically; env vars
# alone aren't enough (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from animals3d_tpu import config as cfglib
    from animals3d_tpu.models import build_model
    from animals3d_tpu.precision import set_mixed_precision

    cfg = cfglib.load_config("train_magicpony_horse",
                             overrides=["dataset.batch_size=10"])
    set_mixed_precision(cfg.get("mixed_precision"))
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    params = model.init_params(rng)
    print(f"init_params: {time.time() - t0:.1f}s")

    H = model.in_image_size
    F = model.num_frames
    batch = 10
    r = np.random.default_rng(0)
    images = jnp.asarray(r.uniform(0, 1, (batch, F, 3, H, H)).astype(np.float32))
    phase = model.phase_for_iter(50000)
    grid, v_cap, f_cap = model.grid_for_phase(phase)

    def recon(params, images, rng, grid):
        prior_mesh, _sdf = model.netBase.apply(
            {"params": params["netBase"]}, grid, v_cap, f_cap, 50000, None)
        out = model.netInstance.apply(
            {"params": params["netInstance"]}, images, prior_mesh, 50000,
            rng, phase._replace(is_training=False))
        (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
         deformation, arti_params, light_params, aux) = out
        renders = model.render(
            params, ["shaded"], shape, mvp, w2c, campos, (H, H),
            im_features=im_features, light_params=light_params,
            prior_mesh=prior_mesh, num_frames=F)
        return jnp.sum(renders["shaded"])

    K = 5

    def recon_many(params, images0, rng, grid):
        def body(i, acc):
            im = images0 + i.astype(jnp.float32) * 1e-6
            return acc + recon(params, im, jax.random.fold_in(rng, i), grid)
        return lax.fori_loop(0, K, body, 0.0)

    def report(name, fn, *args, **kw):
        t0 = time.time()
        lowered = jax.jit(fn, **kw).lower(*args)
        t_trace = time.time() - t0
        txt = lowered.as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(r"= \"?([\w.]+)\"?\(", txt))
        total = sum(ops.values())
        print(f"\n== {name}: trace+lower {t_trace:.1f}s, "
              f"stablehlo {len(txt)/1e6:.1f} MB, {total} ops")
        for k, v in ops.most_common(18):
            print(f"  {k:32s} {v}")
        return lowered

    report("recon_many (K=5)", recon_many, params, images, rng, grid)

    import optax
    from animals3d_tpu.trainer import make_optimizer
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _fake_batch

    optimizer = make_optimizer(model, params)
    opt_state = optimizer.init(params)
    tbatch = _fake_batch(model, batch)
    IT = 50000
    KT = 3

    def train_step(carry, i, tbatch, rng, grid):
        params, opt_state, acc = carry
        b2 = jax.tree.map(
            lambda x: x + i.astype(x.dtype) * 1e-6
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tbatch)
        (loss, _aux), grads = jax.value_and_grad(
            model.forward, has_aux=True)(
                params, b2, IT, jax.random.fold_in(rng, i), phase, grid)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, acc + loss

    def train_many(params, opt_state, tbatch, rng, grid):
        return lax.fori_loop(
            0, KT, lambda i, c: train_step(c, i, tbatch, rng, grid),
            (params, opt_state, 0.0))

    report("train_many (KT=3)", train_many, params, opt_state, tbatch,
           jax.random.PRNGKey(1), grid, donate_argnums=(0, 1))


if __name__ == "__main__":
    main()
