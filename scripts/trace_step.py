"""Capture a jax.profiler device trace of the bench recon / train step and
print a per-op time attribution table.

Usage:
    python scripts/trace_step.py [recon|train|both] [--topk 40]

The axon tunnel supports jax.profiler.start_trace (PERF_NOTES session 3);
the trace lands under /tmp/a3d_trace/**/ *.trace.json.gz with an "XLA Ops"
lane carrying real device op durations + HLO metadata. This script runs ONE
traced dispatch after a warm-up dispatch, then aggregates op durations by
a coarse family key so the table maps onto optimization targets.

Shares bench.py's model/shape setup via environment-compatible overrides
(BENCH_ITER, BENCH_OVERRIDES, BENCH_CONFIG honored).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = os.environ.get("A3D_TRACE_DIR", "/tmp/a3d_trace")


def _family(name: str) -> str:
    """Coarse attribution family for an XLA op name."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas-kernel"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "dot" in n or "conv" in n:
        return "matmul/conv"
    if "gather" in n:
        return "gather"
    if "scatter" in n:
        return "scatter"
    if "sort" in n:
        return "sort"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n:
        return "reduce"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def parse_trace(trace_dir: str, topk: int = 40):
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print(f"no trace files under {trace_dir}", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find the XLA Ops / TensorFlow Op lanes: pick pids whose thread/process
    # names mention 'XLA Ops'
    name_by_pid_tid = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            name_by_pid_tid[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_lanes = {k for k, v in name_by_pid_tid.items() if "XLA Ops" in v}
    if not op_lanes:
        # fall back: ONE lane per device process (lanes on the same device
        # pid overlap in time — summing all of them double-counts)
        dev_pids = {p for p, n in pid_names.items()
                    if "TPU" in n or "/device" in n.lower()}
        seen_pids = set()
        op_lanes = set()
        for k in sorted(name_by_pid_tid):
            if k[0] in dev_pids and k[0] not in seen_pids:
                seen_pids.add(k[0])
                op_lanes.add(k)
    # EXCLUSIVE (self) time per op: lane events nest (while/call spans
    # contain their body ops), so flat summing double-counts — subtract
    # each child's duration from its enclosing span via a nesting stack.
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    by_lane = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        by_lane[(e["pid"], e.get("tid"))].append(e)
    for lane_events in by_lane.values():
        lane_events.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []   # (ts, dur, name)
        for e in lane_events:
            ts, dur, nm = e["ts"], e.get("dur", 0), e.get("name", "?")
            while stack and ts >= stack[-1][0] + stack[-1][1]:
                stack.pop()
            if stack:
                per_op[stack[-1][2]] -= dur / 1e3
            else:
                total += dur / 1e3        # top-level spans = wall time
            per_op[nm] += dur / 1e3
            per_op_n[nm] += 1
            stack.append((ts, dur, nm))
    fam = collections.Counter()
    for nm, ms in per_op.items():
        fam[_family(nm)] += ms
    print(f"\n== trace {os.path.basename(files[-1])}: "
          f"{total:.1f} ms total device op time ==")
    print("\n-- by family --")
    for k, v in fam.most_common():
        print(f"  {v:9.2f} ms  {k}")
    print(f"\n-- top {topk} ops --")
    for nm, ms in per_op.most_common(topk):
        print(f"  {ms:9.2f} ms  x{per_op_n[nm]:<4d} {nm[:110]}")


def run_and_trace(which: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from animals3d_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    from animals3d_tpu import config as cfglib
    from animals3d_tpu.models import build_model
    from animals3d_tpu.precision import set_mixed_precision

    overrides = ["dataset.batch_size=10"]
    overrides += os.environ.get("BENCH_OVERRIDES", "").split()
    cfg = cfglib.load_config(os.environ.get("BENCH_CONFIG",
                                            "train_magicpony_horse"),
                             overrides=overrides)
    set_mixed_precision(cfg.get("mixed_precision"))
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)
    batch = 10
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    H = model.in_image_size
    F = model.num_frames
    r = np.random.default_rng(0)
    images = jnp.asarray(r.uniform(0, 1, (batch, F, 3, H, H)).astype(np.float32))
    IT = int(os.environ.get("BENCH_ITER", "50000"))
    phase = model.phase_for_iter(IT)
    grid, v_cap, f_cap = model.grid_for_phase(phase)

    K = 2

    def recon(params, images, rng, grid):
        prior_mesh, _sdf = model.netBase.apply(
            {"params": params["netBase"]}, grid, v_cap, f_cap, IT, None)
        out = model.netInstance.apply(
            {"params": params["netInstance"]}, images, prior_mesh, IT,
            rng, phase._replace(is_training=False))
        (shape, pose_raw, pose, mvp, w2c, campos, im_features, feat_key,
         deformation, arti_params, light_params, aux) = out
        renders = model.render(
            params, ["shaded"], shape, mvp, w2c, campos, (H, H),
            im_features=im_features, light_params=light_params,
            prior_mesh=prior_mesh, num_frames=F)
        return jnp.sum(renders["shaded"])

    def recon_many(params, images0, rng, grid):
        def body(i, acc):
            im = images0 + i.astype(jnp.float32) * 1e-6
            return acc + recon(params, im, jax.random.fold_in(rng, i), grid)
        return lax.fori_loop(0, K, body, 0.0)

    if which in ("recon", "both"):
        fn = jax.jit(recon_many)
        c = fn.lower(params, images, rng, grid).compile()
        float(c(params, images, rng, grid))
        float(c(params, images + 1e-5, jax.random.PRNGKey(7), grid))
        jax.profiler.start_trace(TRACE_DIR)
        float(c(params, images + 2e-5, jax.random.PRNGKey(8), grid))
        jax.profiler.stop_trace()
        print(f"[trace] recon dispatch traced (K={K})", file=sys.stderr)
        parse_trace(TRACE_DIR)

    if which in ("train", "both"):
        import optax
        from animals3d_tpu.trainer import make_optimizer
        from __graft_entry__ import _fake_batch
        optimizer = make_optimizer(model, params)
        opt_state = optimizer.init(params)
        tbatch = _fake_batch(model, batch)

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
                0, K, lambda i, c: train_step(c, i, tbatch, rng, grid),
                (params, opt_state, 0.0))

        jstep = jax.jit(train_many, donate_argnums=(0, 1))
        tc = jstep.lower(params, opt_state, tbatch,
                         jax.random.PRNGKey(1), grid).compile()
        params, opt_state, loss = tc(params, opt_state, tbatch,
                                     jax.random.PRNGKey(1), grid)
        float(loss)
        params, opt_state, loss = tc(params, opt_state, tbatch,
                                     jax.random.PRNGKey(2), grid)
        float(loss)
        jax.profiler.start_trace(TRACE_DIR + "_train")
        params, opt_state, loss = tc(params, opt_state, tbatch,
                                     jax.random.PRNGKey(3), grid)
        float(loss)
        jax.profiler.stop_trace()
        print(f"[trace] train dispatch traced (K={K}, loss={float(loss)/K:.3f})",
              file=sys.stderr)
        parse_trace(TRACE_DIR + "_train")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which == "parse":
        parse_trace(sys.argv[2] if len(sys.argv) > 2 else TRACE_DIR)
    else:
        run_and_trace(which)
