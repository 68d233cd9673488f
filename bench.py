"""Benchmark: single-image reconstruction throughput at 256² on one chip.

Headline metric (BASELINE.json): imgs/sec/chip for single-image 3D
reconstruction at 256² — the full inference path (prior SDF → marching tets →
instance nets → differentiable render of the input view), i.e. what
`test_magicpony_horse` runs per image. Also reports the full training-step
throughput as a secondary line on stderr.

`vs_baseline` is DERIVED, not assumed (the reference repo publishes no
numbers — BASELINE.md): we count this model's actual per-image forward
FLOPs with XLA's `compiled.cost_analysis()` and bound the reference's A100
throughput as `A100_PEAK_BF16 (312 TFLOP/s) × REF_ASSUMED_MFU ÷
flops_per_image`. REF_ASSUMED_MFU = 0.10 is deliberately GENEROUS to the
reference: a torch-eager pipeline of small MLPs + nvdiffrast rasterization
+ per-pixel gathers is memory/launch-bound, and 10% MFU on A100 is at the
high end for such workloads (typical published MFU for non-transformer
vision pipelines is 3–10%). A generous denominator makes `vs_baseline`
conservative. Derivation details in BASELINE.md.

Also reports achieved TFLOP/s and MFU vs the v5e peak (197 bf16 TFLOP/s)
for both the recon and train paths.

Measurement protocol (run-to-run tunnel contention is ±30%; PERF_NOTES
session-3/8): every timed number is the MEDIAN of `BENCH_REPEATS` (default
8) individually-timed dispatches, each amortizing K iterations inside one
jit with unique inputs. The JSON carries median + min + the full per-repeat
list + spread ((max-min)/median); spread > 15% sets `"contended": true` —
treat such runs as unreliable for <30% comparisons.

Interleaved A/B mode — the only trustworthy way to adjudicate a lever on
this tunnel: `BENCH_AB="VAR=a|b"` builds FOUR executables in XYYX order
(env var VAR set per arm before each trace — all levers are read at trace
time; same-HLO rebuilds hit the persistent cache) and interleaves timed
dispatches across all four, pooling two mirrored-creation-order slots per
arm. The XYYX scheme exists because A/A controls measured a reproducible
~+2.6-2.8% penalty tracking executable CREATION order (identical graphs,
any dispatch order) — a plain A,B scheme biases every verdict by ~+3%
against B. Per-arm stats + the paired median delta go to an extra JSON
line. Empty value = unset ("A3D_NO_ZSKIP=|1" = off vs on). Train A/B
gives each slot its own params/opt_state copy (donation) and reports each
arm's final loss. BENCH_AB_SAMEKEYS=1 feeds both arms identical
rng/batch sequences (exact loss comparability for optimizer A/Bs) — only
safe when the two graphs differ, else the remote result cache can serve
arm B from arm A's entries.

Env: BENCH_TINY=1 shrinks shapes for CPU smoke runs. BENCH_SKIP_RECON=1
skips the recon graph (compile-heavy) for train-focused A/Bs.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

A100_PEAK_BF16_TFLOPS = 312.0
V5E_PEAK_BF16_TFLOPS = 197.0
REF_ASSUMED_MFU = 0.10            # generous to the reference; see docstring
REF_A100_IMGS_PER_SEC_FALLBACK = 10.0   # used only if cost_analysis fails
# Algorithmic FLOPs of the DEFAULT workload (train_magicpony_horse, b10,
# 256², grid 128), measured once from XLA cost_analysis on the DENSE graphs
# (BENCH_r03). These pin the reference denominator and the MFU numerator:
# our own graph's cost_analysis drifts as we optimize (e.g. `lax.cond` in
# the banded SDF sweep counts BOTH branches), but the reference's per-image
# work — the dense sweep, `/root/reference/model/geometry/dmtet.py:294-310`
# — is fixed. Non-default BENCH_CONFIGs fall back to the live number.
DENSE_RECON_GFLOPS_PER_IMG = 65.7
DENSE_TRAIN_GFLOPS_PER_STEP_B10 = 2678.7
CONTENTION_SPREAD = 0.15


def _flops_of(compiled) -> float:
    """Total FLOPs of a compiled executable per XLA's cost analysis.

    Returns 0.0 when the backend exposes no analysis (older runtimes /
    the axon tunnel on some paths) — callers fall back to the documented
    provisional constant.
    """
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):   # some backends return [dict]
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _stats(ts_s):
    """Per-repeat dispatch times (s) -> dict of ms stats (median-first)."""
    ms = np.asarray(sorted(1000.0 * t for t in ts_s))
    med = float(np.median(ms))
    spread = float((ms[-1] - ms[0]) / med) if med > 0 else 0.0
    return {
        "median_ms": med,
        "min_ms": float(ms[0]),
        "max_ms": float(ms[-1]),
        "spread": spread,
        "contended": spread > CONTENTION_SPREAD,
        "reps_ms": [round(float(x), 1) for x in ms],
        "n": int(ms.size),
    }


def _parse_ab():
    """BENCH_AB="VAR=a|b" -> [(VAR, a), (VAR, b)] or [None] (single arm)."""
    ab = os.environ.get("BENCH_AB", "")
    if not ab:
        return [None]
    var, _, vals = ab.partition("=")
    if "|" not in vals:
        raise SystemExit(f"BENCH_AB must be VAR=a|b, got {ab!r}")
    va, vb = vals.split("|", 1)
    return [(var, va), (var, vb)]


def _set_arm(arm):
    if arm is None:
        return
    var, val = arm
    if val == "":
        os.environ.pop(var, None)
    else:
        os.environ[var] = val


def _arm_name(arm):
    return "default" if arm is None else f"{arm[0]}={arm[1] or '<unset>'}"


def main():
    import jax
    # BENCH_CPU=1: force the CPU backend IN-PROCESS. The JAX_PLATFORMS env
    # var does NOT work here — the axon sitecustomize registers its TPU
    # backend and wins — so an env-var-only "cpu" run silently claims the
    # tunnel and serializes against real device work.
    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    # the axon tunnel, when down, makes jax.devices() hang FOREVER at the
    # device claim (observed: multi-hour outage). Probe it in a subprocess
    # with a timeout so the driver gets a clear failure line, not a hang.
    # Skipped when the process already forced the CPU platform.
    plats = str(getattr(jax.config, "jax_platforms", "") or "")
    if plats.split(",")[0] != "cpu":    # axon default is 'axon,cpu'
        import subprocess
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices()"],
                timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", "300")),
                check=False, capture_output=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({
                "metric": "single_image_recon_256_imgs_per_sec_per_chip",
                "value": 0.0, "unit": "imgs/s/chip", "vs_baseline": 0.0,
                "error": "TPU tunnel unreachable (device claim timed out)",
            }))
            sys.exit(1)
    import jax.numpy as jnp
    from animals3d_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    tiny = os.environ.get("BENCH_TINY") == "1"
    arms = _parse_ab()
    samekeys = os.environ.get("BENCH_AB_SAMEKEYS") == "1"

    from animals3d_tpu import config as cfglib
    from animals3d_tpu.models import build_model

    if tiny:
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
        batch, warmup = 2, 1
        reps = int(os.environ.get("BENCH_REPEATS", "3"))
    else:
        # training-phase grid (coarse 128); full 256 nets.
        # BENCH_BATCH overrides the batch (batch-scaling studies); the
        # default 10 mirrors the reference train config.
        batch = int(os.environ.get("BENCH_BATCH", "10"))
        overrides = [f"dataset.batch_size={batch}"]
        warmup = 2
        reps = int(os.environ.get("BENCH_REPEATS", "8"))
    # A/B lever: BENCH_OVERRIDES="k=v k=v" appends config overrides
    # (pair with BENCH_AB env toggles for kernel A/Bs);
    # BENCH_CONFIG switches the run config (e.g. train_fauna)
    extra = os.environ.get("BENCH_OVERRIDES", "").split()
    overrides += extra

    cfg = cfglib.load_config(os.environ.get("BENCH_CONFIG",
                                            "train_magicpony_horse"),
                             overrides=overrides)
    from animals3d_tpu.precision import set_mixed_precision
    set_mixed_precision(cfg.get("mixed_precision"))   # bf16 per base.yaml
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    model = build_model(model_cfg)

    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)

    H = model.in_image_size
    F = model.num_frames
    r = np.random.default_rng(0)
    images = jnp.asarray(r.uniform(0, 1, (batch, F, 3, H, H)).astype(np.float32))

    # BENCH_ITER picks the training phase: 50000 = coarse grid (128) +
    # articulation (the default measured phase); e.g. 150000 = fine grid 256
    IT = int(os.environ.get("BENCH_ITER", "50000"))
    phase = model.phase_for_iter(IT)
    grid, v_cap, f_cap = model.grid_for_phase(phase)

    # ---- inference path: recon + input-view render ----
    # the manual netBase→netInstance→render chain below is MagicPony-shaped;
    # Fauna/Ponymation configs (BENCH_CONFIG) report only the train-step line
    from animals3d_tpu.models.magicpony import MagicPony
    # BENCH_SKIP_RECON=1: train-step-only run (A/B iterations — the recon
    # graph's compile alone can dominate a bounded bench slot)
    do_recon = (isinstance(model, MagicPony)
                and os.environ.get("BENCH_SKIP_RECON") != "1")

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
        # scalar checksum: forces the full render while keeping the timed
        # loop to ONE dispatch per iteration (a separate jnp.sum dispatch
        # costs an extra ~31 ms tunnel roundtrip)
        return jnp.sum(renders["shaded"])

    # K recons per dispatch (lax.fori_loop, input varied per step so no
    # iteration can be CSE'd or served from a cache): measures steady-state
    # DEVICE throughput. Per-dispatch timing through the axon tunnel carries
    # ~90 ms of host/tunnel overhead per call that no amount of async
    # queueing hides (the remote executor serializes), which is a harness
    # artifact, not chip time — production serving runs the loop on-device.
    K = 5 if not tiny else 2
    from jax import lax

    def recon_many(params, images0, rng, grid):
        def body(i, acc):
            im = images0 + i.astype(jnp.float32) * 1e-6
            return acc + recon(params, im, jax.random.fold_in(rng, i), grid)
        return lax.fori_loop(0, K, body, 0.0)

    recon_jit = jax.jit(recon_many)
    # fresh inputs per call + forced device reads: repeated identical calls
    # can be served from result caches in the remote-execution stack and
    # produce fantasy numbers. The distinct buffers are staged on device
    # BEFORE timing (a synchronous 8 MB H2D through the tunnel costs ~250 ms
    # and would swamp the measurement).
    fresh = [jax.device_put(r.uniform(0, 1, (batch, F, 3, H, H))
                            .astype(np.float32)) for _ in range(8)]
    for x in fresh:
        jax.block_until_ready(x)
    imgs_per_sec = 0.0
    recon_stats = [None] * len(arms)
    recon_compile_s = [0.0] * len(arms)
    recon_tflops = recon_mfu = 0.0
    recon_flops_per_img = recon_flops_raw = 0.0
    # A/B executable slots, XYYX-counterbalanced: A/A controls measured a
    # reproducible ~+2.6-2.8% penalty tracking the ORDER executables are
    # created in (identical graphs, both plain and ABBA dispatch orders —
    # v5e 2026-08-20), so each arm gets TWO executables at mirrored
    # creation positions (A,B,B,A; same-HLO recompiles hit the persistent
    # cache) and its samples pool across both. Single-arm runs keep one.
    # …and the FIRST-created executable of a process runs measurably
    # faster than all later ones (A/A per-arm pools stayed +2.5% under
    # XYYX; arm-A samples were bimodal — slot-0 ~7% below slots 1-3), so
    # A/B runs compile a BURN-IN executable first that is never timed.
    slots = [0, 1, 1, 0] if len(arms) == 2 else [0]
    if do_recon:
        recon_exec = []
        burn = None
        if len(arms) == 2:
            _set_arm(arms[0])
            # kept ALIVE through the timed loop: deleting it frees its
            # (first-allocated) buffers and the next executable inherits
            # the advantaged placement — A/A showed slot 0 ~7% faster
            # whenever the burn-in was deleted before the timed compiles
            burn = recon_jit.lower(params, images, rng, grid).compile()
            _ = float(burn(params, images, rng, grid))
        for s, a in enumerate(slots):
            _set_arm(arms[a])
            t0 = time.time()
            c = recon_jit.lower(params, images, rng, grid).compile()
            _ = float(c(params, images, rng, grid))
            if s == a or len(slots) == 1:
                recon_compile_s[a] = time.time() - t0
            recon_exec.append(c)
        recon_flops_raw = _flops_of(recon_exec[0]) / (K * batch * F)
        recon_flops_per_img = recon_flops_raw
        if os.environ.get("BENCH_CONFIG", "train_magicpony_horse") == \
                "train_magicpony_horse" and not tiny and batch == 10:
            recon_flops_per_img = DENSE_RECON_GFLOPS_PER_IMG * 1e9
        for i in range(warmup):
            for s, a in enumerate(slots):
                _ = float(recon_exec[s](
                    params, fresh[(i * len(slots) + s) % 8],
                    jax.random.PRNGKey(100 + i * 4 + s), grid))
        # interleaved timed dispatches over the XYYX slots, ROTATING the
        # starting slot each repeat: A/A controls showed a persistent
        # ~20 ms advantage for the first dispatch of each rep group (the
        # burn-in executable did NOT absorb it), and rotation is the only
        # scheme that neutralizes it regardless of whether the cause is
        # rep-position or executable identity — the advantaged position
        # cycles A,B,B,A over repeats
        rts = [[] for _ in arms]
        rts_slot = [[] for _ in slots]
        for i in range(reps):
            for j in range(len(slots)):
                s = (i + j) % len(slots)
                a = slots[s]
                key = jax.random.PRNGKey(i) if (samekeys or len(arms) == 1) \
                    else jax.random.fold_in(jax.random.PRNGKey(i), s)
                # ONE buffer per rep for ALL slots: per-slot diagnostics
                # (A/A #7) traced the residual arm bias to the INPUT
                # buffer identity — the 8 pre-staged `fresh` buffers
                # differ by ±4% recon time (HBM placement), and the
                # (i·L+s)%8 assignment gave each slot only 2 of the 8,
                # correlating buffer quality with arm. Same buffer per
                # rep ⇒ the buffer effect cancels exactly in the paired
                # delta (keys still differ per slot — no result-cache
                # aliasing).
                t0 = time.time()
                _ = float(recon_exec[s](params, fresh[i % 8], key, grid))
                dt_s = time.time() - t0
                rts[a].append(dt_s)
                rts_slot[s].append(dt_s)
        recon_stats = [_stats(ts) for ts in rts]
        s0 = recon_stats[0]
        imgs_per_sec = batch * F * K / (s0["median_ms"] / 1000.0)
        recon_tflops = recon_flops_per_img * imgs_per_sec / 1e12
        recon_mfu = recon_tflops / V5E_PEAK_BF16_TFLOPS

        print(f"[bench] device={jax.devices()[0].device_kind} "
              f"compile={recon_compile_s[0]:.1f}s recon "
              f"{imgs_per_sec:.2f} imgs/s "
              f"(median {s0['median_ms'] / K:.1f} ms/batch{batch}, "
              f"min {s0['min_ms'] / K:.1f}, spread {s0['spread']:.0%}, "
              f"n={s0['n']}, K={K}/dispatch) "
              f"{recon_flops_per_img / 1e9:.1f} GF/img "
              f"{recon_tflops:.2f} TF/s MFU={recon_mfu * 100:.1f}%",
              file=sys.stderr)
        if len(arms) == 2:
            sA, sB = recon_stats
            d = (sB["median_ms"] - sA["median_ms"]) / sA["median_ms"]
            print(f"[bench] recon A/B {_arm_name(arms[0])} vs "
                  f"{_arm_name(arms[1])}: median {sA['median_ms']:.1f} vs "
                  f"{sB['median_ms']:.1f} ms/dispatch ({d:+.1%} B vs A)",
                  file=sys.stderr)

    # BENCH_SKIP_TRAIN=1: recon-only run (halves the compile bill of
    # recon-focused A/Bs; the recon JSON line is still emitted last)
    if do_recon and os.environ.get("BENCH_SKIP_TRAIN") == "1":
        if recon_flops_per_img > 0:
            ref_a100 = (A100_PEAK_BF16_TFLOPS * 1e12 * REF_ASSUMED_MFU
                        / recon_flops_per_img)
        else:
            ref_a100 = REF_A100_IMGS_PER_SEC_FALLBACK
        if len(arms) == 2:
            rA, rB = recon_stats
            print(json.dumps({
                "metric": f"ab_{os.environ.get('BENCH_AB')}",
                "arm_a": _arm_name(arms[0]), "arm_b": _arm_name(arms[1]),
                "recon_median_ms_a": round(rA["median_ms"] / K, 1),
                "recon_median_ms_b": round(rB["median_ms"] / K, 1),
                "recon_delta_b_vs_a":
                    round((rB["median_ms"] - rA["median_ms"])
                          / rA["median_ms"], 4),
                "recon_reps_ms_a": [round(x / K, 1) for x in rA["reps_ms"]],
                "recon_reps_ms_b": [round(x / K, 1) for x in rB["reps_ms"]],
                "recon_slot_ms": [
                    [round(1000 * x / K, 1) for x in sl] for sl in rts_slot],
            }))
        s0 = recon_stats[0]
        print(json.dumps({
            "metric": "single_image_recon_256_imgs_per_sec_per_chip"
            if not tiny else "single_image_recon_tiny_imgs_per_sec",
            "value": round(imgs_per_sec, 3), "unit": "imgs/s/chip",
            "vs_baseline": round(imgs_per_sec / ref_a100, 3),
            "recon_batch_ms": round(s0["median_ms"] / K, 1),
            "recon_batch_ms_min": round(s0["min_ms"] / K, 1),
            "recon_spread": round(s0["spread"], 3),
            "recon_contended": s0["contended"],
            "compile_s": round(recon_compile_s[0], 1),
        }))
        return

    # ---- training step (fwd+bwd+optimizer): the actual workload -----------
    import optax
    from animals3d_tpu.trainer import make_optimizer
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _fake_batch

    tbatch = _fake_batch(model, batch)

    # KT steps per dispatch (fori_loop over donated state, batch varied per
    # step so nothing folds) — same tunnel-overhead amortization as recon
    KT = 3 if not tiny else 2

    # per-SLOT executables + state (donated, so each slot owns a params
    # copy); slots are XYYX-counterbalanced — see the recon comment
    slots = [0, 1, 1, 0] if len(arms) == 2 else [0]
    train_exec, train_states, train_compile_s = [], [], [0.0] * len(arms)
    train_flops_raw = 0.0
    # burn-in executable (see recon comment): (None, 0) compiles arm 0's
    # graph once, runs one dispatch, and is discarded untimed
    slot_plan = list(enumerate(slots))
    if len(arms) == 2:
        slot_plan = [(None, 0)] + slot_plan
    for s, a in slot_plan:
        arm = arms[a]
        _set_arm(arm)
        optimizer = make_optimizer(model, params)

        def train_step(carry, i, tbatch, rng, grid, optimizer=optimizer):
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

        # tbatch AND grid must be jit ARGUMENTS: closed over, their arrays
        # get baked into the StableHLO as constant literals (measured: 90 MB
        # module — 51 MB of it grid.verts alone — vs 0.8 MB for recon),
        # bloating the remote compile service round-trip
        def train_many(params, opt_state, tbatch, rng, grid,
                       train_step=train_step):
            return lax.fori_loop(
                0, KT, lambda i, c: train_step(c, i, tbatch, rng, grid),
                (params, opt_state, 0.0))

        p = params if len(slots) == 1 else jax.tree.map(jnp.array, params)
        opt_state = optimizer.init(p)
        jstep = jax.jit(train_many, donate_argnums=(0, 1))
        t0 = time.time()
        tc = jstep.lower(p, opt_state, tbatch,
                         jax.random.PRNGKey(1), grid).compile()
        if s == 0 or (s is None and len(arms) == 2):
            train_flops_raw = _flops_of(tc) / KT
        p, opt_state, loss = tc(p, opt_state, tbatch,
                                jax.random.PRNGKey(1), grid)
        jax.block_until_ready(loss)
        if s is None:        # burn-in: never timed, kept alive (see recon)
            _burn_keep = (tc, p, opt_state)   # noqa: F841
            continue
        if s == a or len(slots) == 1:
            train_compile_s[a] = time.time() - t0
        train_exec.append(tc)
        train_states.append((p, opt_state))

    train_flops_per_step = train_flops_raw
    if os.environ.get("BENCH_CONFIG", "train_magicpony_horse") == \
            "train_magicpony_horse" and not tiny and batch == 10:
        train_flops_per_step = DENSE_TRAIN_GFLOPS_PER_STEP_B10 * 1e9

    for i in range(warmup):
        for s, tc in enumerate(train_exec):
            p, o = train_states[s]
            p, o, loss = tc(p, o, tbatch, jax.random.PRNGKey(2 + i), grid)
            float(loss)
            train_states[s] = (p, o)
    tts = [[] for _ in arms]
    tts_slot = [[] for _ in slots]
    train_loss = [0.0] * len(arms)
    # Train A/A forensics (PERF_NOTES session 9): with per-slot donated
    # state copies, arm bias reached +10.6-10.9% on IDENTICAL graphs and
    # per-slot medians split cleanly by ARM (slots 0/3 fast, 1/2 slow) —
    # the bias rides the STATE buffers' placement, not the executables.
    # Mid-run, swap states between arm-crossed slot pairs (0↔1, 3↔2) so
    # each arm's samples average both placements. Only valid when the two
    # arms' state pytrees match structurally (all kernel levers; NOT e.g.
    # A3D_NO_FLATTEN) and never under samekeys (it would mix the
    # per-arm loss trajectories).
    swap_at = reps // 2 if len(slots) == 4 and not samekeys else -1
    if swap_at > 0:
        s0 = jax.tree_util.tree_structure(train_states[0])
        if any(jax.tree_util.tree_structure(train_states[k]) != s0
               for k in (1, 2, 3)):
            swap_at = -1
            print("[bench] A/B arms have different state structures; "
                  "state-swap debiasing disabled", file=sys.stderr)
    for i in range(reps):
        if i == swap_at:
            train_states[0], train_states[1] = \
                train_states[1], train_states[0]
            train_states[3], train_states[2] = \
                train_states[2], train_states[3]
        # XYYX slot interleave with rotated start — see the recon comment
        for j in range(len(slots)):
            s = (i + j) % len(slots)
            a = slots[s]
            tc = train_exec[s]
            key = jax.random.PRNGKey(100 + i) if (samekeys or len(arms) == 1) \
                else jax.random.fold_in(jax.random.PRNGKey(100 + i), a)
            p, o = train_states[s]
            t0 = time.time()
            p, o, loss = tc(p, o, tbatch, key, grid)
            train_loss[a] = float(loss) / KT
            dt_s = time.time() - t0
            tts[a].append(dt_s)
            tts_slot[s].append(dt_s)
            train_states[s] = (p, o)
    train_stats = [_stats(ts) for ts in tts]
    t0s = train_stats[0]
    tdt = t0s["median_ms"] / 1000.0 / KT          # median per-step seconds
    train_imgs = batch * F / tdt
    train_tflops = train_flops_per_step / tdt / 1e12
    train_mfu = train_tflops / V5E_PEAK_BF16_TFLOPS
    print(f"[bench] train step {tdt * 1000:.1f} ms/b{batch} (median, "
          f"min {t0s['min_ms'] / KT:.1f}, spread {t0s['spread']:.0%}, "
          f"n={t0s['n']}) "
          f"-> {train_imgs:.2f} imgs/s (compile {train_compile_s[0]:.1f}s, "
          f"loss {train_loss[0]:.3f}) "
          f"{train_flops_per_step / 1e9:.1f} GF/step "
          f"{train_tflops:.2f} TF/s MFU={train_mfu * 100:.1f}%",
          file=sys.stderr)
    if len(arms) == 2:
        sA, sB = train_stats
        d = (sB["median_ms"] - sA["median_ms"]) / sA["median_ms"]
        print(f"[bench] train A/B {_arm_name(arms[0])} vs "
              f"{_arm_name(arms[1])}: median {sA['median_ms'] / KT:.1f} vs "
              f"{sB['median_ms'] / KT:.1f} ms/step ({d:+.1%} B vs A); "
              f"loss {train_loss[0]:.4f} vs {train_loss[1]:.4f}",
              file=sys.stderr)

    # ---- secondary: big-batch training throughput -------------------------
    # The prior-shape sweep + marching tets are batch-invariant (one prior
    # mesh per step regardless of B — the reference evaluates netBase once
    # per step too, `AnimalModel.py:384-386`), so a larger per-chip batch
    # amortizes them: measured +37% imgs/s at b32 (PERF_NOTES session 9).
    # The b10 line above mirrors the reference train config; this line
    # reports the production-recommended batch. BENCH_BATCH2=0 disables.
    b2 = int(os.environ.get("BENCH_BATCH2", "32"))
    if (not tiny and len(arms) == 1 and b2 > 0 and b2 != batch
            and os.environ.get("BENCH_SKIP_RECON") != "1"):
        try:
            tb2 = _fake_batch(model, b2)
            p2, o2 = train_states[0]
            t0 = time.time()
            tc2 = jstep.lower(p2, o2, tb2, jax.random.PRNGKey(7),
                              grid).compile()
            p2, o2, loss2 = tc2(p2, o2, tb2, jax.random.PRNGKey(7), grid)
            jax.block_until_ready(loss2)
            c2 = time.time() - t0
            ts2 = []
            for i in range(4):
                t0 = time.time()
                p2, o2, loss2 = tc2(p2, o2, tb2,
                                    jax.random.PRNGKey(300 + i), grid)
                float(loss2)
                ts2.append(time.time() - t0)
            s2 = _stats(ts2)
            step2 = s2["median_ms"] / KT
            print(f"[bench] train step {step2:.1f} ms/b{b2} -> "
                  f"{b2 * F / step2 * 1000:.2f} imgs/s (batch-{b2} "
                  f"amortized prior; compile {c2:.1f}s)", file=sys.stderr)
            print(json.dumps({
                "metric": f"{os.environ.get('BENCH_CONFIG', 'train_magicpony_horse')}"
                          f"_train_step_b{b2}_imgs_per_sec_per_chip",
                "value": round(b2 * F / step2 * 1000, 3),
                "unit": "imgs/s/chip", "vs_baseline": 0.0,
                "train_step_ms": round(step2, 1), "train_batch": b2,
                "train_spread": round(s2["spread"], 3),
                "compile_s": round(c2, 1),
            }))
        except Exception as e:   # never let the secondary kill the bench
            print(f"[bench] b{b2} train measurement failed: {e}",
                  file=sys.stderr)

    # derived A100 denominator: same per-image FLOPs at generous ref MFU
    if recon_flops_per_img > 0:
        ref_a100 = (A100_PEAK_BF16_TFLOPS * 1e12 * REF_ASSUMED_MFU
                    / recon_flops_per_img)
        denom_note = (f"derived: {recon_flops_per_img / 1e9:.1f} GF/img @ "
                      f"A100 312 TF/s x {REF_ASSUMED_MFU:.0%} MFU")
    else:
        ref_a100 = REF_A100_IMGS_PER_SEC_FALLBACK
        denom_note = "fallback constant (cost_analysis unavailable)"

    # A/B result line (diagnostic; never the headline)
    if len(arms) == 2:
        sA, sB = train_stats
        rec = {}
        if do_recon and recon_stats[0] is not None:
            rA, rB = recon_stats
            rec = {"recon_median_ms_a": round(rA["median_ms"], 1),
                   "recon_median_ms_b": round(rB["median_ms"], 1),
                   "recon_delta_b_vs_a":
                       round((rB["median_ms"] - rA["median_ms"])
                             / rA["median_ms"], 4)}
        print(json.dumps({
            "metric": f"ab_{os.environ.get('BENCH_AB')}",
            "arm_a": _arm_name(arms[0]), "arm_b": _arm_name(arms[1]),
            "train_median_ms_a": round(sA["median_ms"] / KT, 1),
            "train_median_ms_b": round(sB["median_ms"] / KT, 1),
            "train_delta_b_vs_a":
                round((sB["median_ms"] - sA["median_ms"])
                      / sA["median_ms"], 4),
            "train_reps_ms_a": [round(x / KT, 1) for x in sA["reps_ms"]],
            "train_reps_ms_b": [round(x / KT, 1) for x in sB["reps_ms"]],
            "train_slot_ms": [
                [round(1000 * x / KT, 1) for x in sl] for sl in tts_slot],
            "loss_a": round(train_loss[0], 6), "loss_b": round(train_loss[1], 6),
            "samekeys": samekeys, **rec,
        }))

    # train-step metric line — ALWAYS emitted (regressions must be visible
    # to the driver); the LAST line stays the headline metric it parses
    cfg_name = os.environ.get("BENCH_CONFIG", "train_magicpony_horse")
    print(json.dumps({
        "metric": f"{cfg_name}_train_step_imgs_per_sec_per_chip",
        "value": round(train_imgs, 3),
        "unit": "imgs/s/chip",
        "vs_baseline": 0.0,
        "train_step_ms": round(tdt * 1000, 1),
        "train_step_ms_min": round(t0s["min_ms"] / KT, 1),
        "train_step_ms_reps": [round(x / KT, 1) for x in t0s["reps_ms"]],
        "train_spread": round(t0s["spread"], 3),
        "train_contended": t0s["contended"],
        "train_loss": round(train_loss[0], 4),
        "train_batch": batch,
        "train_gflops_per_step": round(train_flops_per_step / 1e9, 1),
        "train_gflops_raw_cost_analysis": round(train_flops_raw / 1e9, 1),
        "train_tflops_per_sec": round(train_tflops, 2),
        "train_mfu_v5e": round(train_mfu, 4),
        "compile_s": round(train_compile_s[0], 1),
    }))
    if do_recon:
        s0 = recon_stats[0]
        print(json.dumps({
            "metric": "single_image_recon_256_imgs_per_sec_per_chip"
            if not tiny else "single_image_recon_tiny_imgs_per_sec",
            "value": round(imgs_per_sec, 3),
            "unit": "imgs/s/chip",
            "vs_baseline": round(imgs_per_sec / ref_a100, 3),
            "ref_a100_imgs_per_sec": round(ref_a100, 2),
            "ref_denominator": denom_note,
            "recon_batch_ms": round(s0["median_ms"] / K, 1),
            "recon_batch_ms_min": round(s0["min_ms"] / K, 1),
            "recon_batch_ms_reps": [round(x / K, 1) for x in s0["reps_ms"]],
            "recon_spread": round(s0["spread"], 3),
            "recon_contended": s0["contended"],
            "recon_gflops_per_img": round(recon_flops_per_img / 1e9, 2),
            "recon_gflops_raw_cost_analysis": round(recon_flops_raw / 1e9, 2),
            "recon_tflops_per_sec": round(recon_tflops, 2),
            "recon_mfu_v5e": round(recon_mfu, 4),
            "compile_s": round(recon_compile_s[0], 1),
            "train_step_ms": round(tdt * 1000, 1),
            "train_imgs_per_sec": round(train_imgs, 3),
            "train_batch": batch,
        }))


if __name__ == "__main__":
    main()
