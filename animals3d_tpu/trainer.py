"""Trainer: the jitted training loop, checkpointing, logging.

Reference: `/root/reference/model/Trainer.py` (config `:15-50`, train loop
`:232-311`, test `:129-146`). TPU redesign:

  * one jitted, phase-keyed `train_step(params, opt_state, batch, it, rng)`
    with donated state — forward+backward+update is a single XLA program;
  * data parallelism: batch sharded over the `dp` mesh axis, params
    replicated; gradient psum is inserted by XLA (parallel/mesh.py);
  * optimizers: optax adam per predictor via multi_transform partitions
    (`AnimalModel.get_optimizer`, `AnimalModel.py:756-758`), frozen ViT
    masked to zero updates;
  * checkpoints: orbax with iteration naming / retention / tolerant restore
    (checkpoint.py); metrics: meters + tensorboardX + metrics.json.
"""
from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from animals3d_tpu import checkpoint as ckpt
from animals3d_tpu import config as cfglib
from animals3d_tpu.data.loaders import DataLoaderConfig, get_data_loaders
from animals3d_tpu.parallel import mesh as meshlib
from animals3d_tpu.utils.meters import MetricsTrace, StandardMetrics


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    run_train: bool = False
    run_test: bool = False
    seed: int = 0
    num_iters: int = 1
    checkpoint_dir: str = "results"
    checkpoint_name: Optional[str] = None
    save_checkpoint_freq: int = 5000
    keep_num_checkpoint: int = 2
    resume: bool = True
    archive_code: bool = False
    test_result_dir: Optional[str] = None
    checkpoint_path: Optional[str] = None   # warm-start file (ours or .pth)
    load_optim: bool = True
    use_logger: bool = True
    logger_type: str = "tensorboard"
    log_loss_freq: int = 50
    log_image_freq: int = 500
    log_train: bool = True
    log_val: bool = True
    fix_log_batch: bool = False
    save_train_result_freq: Optional[int] = None
    mixed_precision: Optional[str] = "bf16"
    # sanitizer (SURVEY §5.2): jax_debug_nans makes XLA re-run the first
    # NaN-producing op eagerly and raise AT the op instead of at the
    # loss-is-finite check below — slow, debugging only
    debug_nans: bool = False
    disc_train: bool = False
    remake_dataloader_iter: int = -1
    remake_dataloader_num: int = -1
    shuffle_dataset_paths: bool = True
    mesh_shape: Optional[Any] = None


def make_optimizer(model, params):
    """Per-predictor adam + frozen-ViT masking via multi_transform."""

    def label_fn(params):
        def label(path, leaf):
            keys = [getattr(p, "key", str(p)) for p in path]
            if any("ViT" == k for k in keys):
                return "frozen"
            if getattr(model, "frozen_param", None) and model.frozen_param(keys):
                return "frozen"      # stage-dependent masking (Ponymation)
            if keys[0] == "netBase":
                return "base"
            if keys[0] == "netDisc":
                return "disc"        # updated by the separate GAN step
            return "instance"
        return jax.tree_util.tree_map_with_path(label, params)

    def adam(cfg):
        lr = cfg.lr
        if getattr(cfg, "use_scheduler", False):
            # MultiStepLR: lr × gamma at each milestone iteration
            # (`AnimalModel.py:102-105` + per-iteration step `Trainer.py:305`)
            lr = optax.piecewise_constant_schedule(
                cfg.lr, {int(m): cfg.scheduler_gamma
                         for m in cfg.scheduler_milestone})
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay) \
            if cfg.weight_decay else optax.adam(lr)
        # flatten: run the adam math on ONE raveled vector per partition
        # instead of per-leaf — the per-leaf update was ~4.3k scalar-shaped
        # ops/step ≈ 38 ms of pure dispatch overhead on v5e (device trace
        # 2026-08-19); identical math, update order is elementwise.
        # A stage-frozen model can leave a partition EMPTY (every leaf
        # masked, e.g. Ponymation stage 1's base partition): flatten's
        # init would concatenate zero arrays — fall back to the plain
        # transform there (no leaves ⇒ no dispatch overhead either).
        # A3D_NO_FLATTEN=1: bisect/A-B lever — plain per-leaf adam (the
        # flattened form is the production default). Two caveats: (1) the
        # optimizer-STATE pytrees differ (raveled vector vs per-leaf), so a
        # checkpoint saved under one form cannot restore under the other —
        # pick one form for a run's lifetime; (2) the env var is read HERE,
        # when make_optimizer is called — flipping it later in the process
        # has no effect (run each A/B arm in its own process, or rebuild
        # the optimizer per arm as bench.py's BENCH_AB does). The two forms
        # are update-equivalent to f32 tolerance
        # (tests/test_config.py::test_flattened_adam_equals_per_leaf).
        import os
        if os.environ.get("A3D_NO_FLATTEN") == "1":
            return tx
        flat = optax.flatten(tx)

        def init(params):
            return (flat if jax.tree_util.tree_leaves(params) else tx) \
                .init(params)

        def update(updates, state, params=None):
            return (flat if jax.tree_util.tree_leaves(updates) else tx) \
                .update(updates, state, params)

        return optax.GradientTransformation(init, update)

    transforms = {
        "base": adam(model.cfg_optim_base),
        "instance": adam(model.cfg_optim_instance),
        "frozen": optax.set_to_zero(),
    }
    extra = getattr(model, "extra_optimizers", None)
    if extra:
        transforms.update(extra())
    return optax.multi_transform(transforms, label_fn)


def _host_local_value(a):
    """This host's view of a possibly multi-process-sharded jax.Array.

    Batch-sharded global arrays yield this host's contiguous slice
    (concat of its addressable shards in index order, duplicates from
    replication deduped); fully-addressable arrays transfer whole. This
    mirrors the reference, which saves only the main process's LOCAL
    batch (`Trainer.py:281-284` under accelerate).
    """
    if not isinstance(a, jax.Array) or a.is_fully_addressable:
        return np.asarray(a)
    by_index = {}
    for s in a.addressable_shards:
        by_index.setdefault(s.index, s.data)
    if len(by_index) == 1:
        return np.asarray(next(iter(by_index.values())))

    def _start(idx):
        sl = idx[0]
        return sl.start if isinstance(sl, slice) and sl.start else 0
    parts = [np.asarray(d) for _, d in
             sorted(by_index.items(), key=lambda kv: _start(kv[0]))]
    return np.concatenate(parts, axis=0)


class Trainer:
    def __init__(self, cfg: dict, model):
        self.cfg_full = cfg
        self.cfg = cfglib.bind(TrainerConfig, cfg)
        self.model = model
        from animals3d_tpu.precision import set_mixed_precision
        set_mixed_precision(self.cfg.mixed_precision)
        if self.cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        ds_cfg = dict(cfg.get("dataset") or {})
        ds_cfg.pop("path", None)
        self.cfg_dataset = cfglib.bind(DataLoaderConfig, ds_cfg)
        self.mesh = meshlib.get_mesh(self.cfg.mesh_shape)
        bs = self.cfg_dataset.batch_size
        if self.cfg.mesh_shape is None and bs % self.mesh.size != 0:
            # default mesh (all devices) but the batch can't fill it: use
            # the largest dp that divides the batch instead of raising in
            # shard_batch (an EXPLICIT mesh_shape stays strict)
            import math
            dp = math.gcd(self.mesh.size, bs)
            print(f"dp mesh {self.mesh.size} does not divide batch {bs}; "
                  f"using dp={dp}")
            self.mesh = meshlib.get_mesh({"dp": dp})
        self.metrics_trace = MetricsTrace()
        self._train_steps = {}       # phase.key -> compiled step
        self._disc_step = None
        self._eval_step = None
        self._writer = None
        self._fixed_val_batch = None
        self._val_iter = None

    # ------------------------------------------------------------------
    def _logger(self):
        if not self.cfg.use_logger or self._writer is not None:
            return self._writer
        logdir = os.path.join(self.cfg.checkpoint_dir, "logs")
        os.makedirs(logdir, exist_ok=True)
        if self.cfg.logger_type == "wandb":
            from animals3d_tpu.utils.wandb_writer import WandbWriter
            self._writer = WandbWriter(config=self.cfg_full)
        else:
            try:
                from tensorboardX import SummaryWriter
                self._writer = SummaryWriter(logdir, flush_secs=10)
            except ImportError:
                self._writer = None
        return self._writer

    def _archive_code(self):
        """Zip the package source next to the checkpoints
        (`misc.archive_code`, `misc.py:75-85`)."""
        import zipfile
        import animals3d_tpu
        pkg = os.path.dirname(animals3d_tpu.__file__)
        os.makedirs(self.cfg.checkpoint_dir, exist_ok=True)
        out = os.path.join(self.cfg.checkpoint_dir, "code.zip")
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith((".py", ".yaml")):
                        p = os.path.join(root, fn)
                        zf.write(p, os.path.relpath(p, os.path.dirname(pkg)))

    def _log_visuals(self, writer, params, batch, total_iter,
                     prefix="train_"):
        """Rich visual logging every log_image_freq (`Trainer.py:283-303` /
        `AnimalModel.log_visuals`, `AnimalModel.py:517-636`)."""
        if writer is None:
            return
        from animals3d_tpu.utils import visual_log
        model = self.model
        phase = self.model.phase_for_iter(total_iter, is_training=False)
        if self._eval_step is None:
            self._eval_step = {}
        if phase.key not in self._eval_step:

            def eval_fn(params, batch, total_iter, rng, grid, _phase=phase):
                _, (m, aux) = model.forward(params, batch, total_iter, rng,
                                            _phase, grid)
                extra = None
                if aux.get("mvp") is not None and \
                        model.cfg_model.enable_render:
                    h = w = model.out_image_size
                    extra = model.render(
                        params, ["geo_normal", "kd", "shading"],
                        aux["shape"], aux["mvp"], aux["w2c"], aux["campos"],
                        (h, w), im_features=aux["im_features"],
                        light_params=aux["light_params"],
                        prior_mesh=aux["prior_mesh"],
                        num_frames=model.num_frames,
                        class_vector=aux.get("class_vector"))
                return aux, extra
            self._eval_step[phase.key] = jax.jit(eval_fn)
        grid, _, _ = self.model.grid_for_phase(phase)
        device_batch = meshlib.shard_batch(batch, self.mesh,
                                           allow_uneven=True)
        aux, extra = jax.device_get(
            self._eval_step[phase.key](params, device_batch, total_iter,
                                       jax.random.PRNGKey(0), grid))
        visual_log.log_visuals(model, writer, batch, aux, extra, total_iter,
                               prefix=prefix)
        try:
            vids = self._turntable_videos(params, aux)
            visual_log.log_videos(writer, vids, total_iter, prefix=prefix)
        except Exception as e:
            print(f"turntable logging skipped: {e}")

    def _turntable_videos(self, params, aux, num_frames=15):
        """15-frame azimuth turntables of the posed and prior shapes
        (`AnimalModel.render_rotation_frames`, `:665-701`)."""
        from animals3d_tpu.visualization import orbit_cameras
        model = self.model
        if aux.get("mvp") is None:
            return {}
        if not hasattr(self, "_turn_step"):
            h = w = model.out_image_size

            def turn(params, shape, prior_mesh, mvp, w2c, campos, feats,
                     light, class_vector, mode_idx):
                renders = model.render(
                    params, ["geo_normal", "shaded"], shape, mvp, w2c,
                    campos, (h, w), im_features=feats, light_params=light,
                    prior_mesh=prior_mesh, num_frames=1,
                    class_vector=class_vector)
                return jnp.where(mode_idx == 0,
                                 renders["geo_normal"][:, :3],
                                 renders["shaded"][:, :3])
            self._turn_step = jax.jit(turn)

        def to_dev(tree):
            return jax.tree_util.tree_map(jnp.asarray, tree)

        shape = to_dev(aux["shape"])
        prior = to_dev(aux["prior_mesh"])
        mvp = jnp.asarray(aux["mvp"][:1])
        w2c = jnp.asarray(aux["w2c"][:1])
        campos = jnp.asarray(aux["campos"][:1])
        feats = None if aux.get("im_features") is None else \
            jnp.asarray(aux["im_features"][:1])
        light = None if aux.get("light_params") is None else \
            jnp.asarray(aux["light_params"][:1])
        cvec = None if aux.get("class_vector") is None else \
            jnp.asarray(aux["class_vector"][:1])
        shape1 = shape.first_n(1)

        angles = np.linspace(0, 2 * np.pi, num_frames, endpoint=False)
        vids = {"instance_normal_rotation": [],
                "prior_image_rotation": [], "prior_normal_rotation": []}
        for a in angles:
            mvp_k, w2c_k, campos_k = orbit_cameras(mvp[0], w2c[0], campos[0],
                                                   [float(a)])
            vids["instance_normal_rotation"].append(np.asarray(
                self._turn_step(params, shape1, prior, mvp_k, w2c_k,
                                campos_k, feats, light, cvec, 0)[0]))
            vids["prior_image_rotation"].append(np.asarray(
                self._turn_step(params, prior, prior, mvp_k, w2c_k,
                                campos_k, feats, light, cvec, 1)[0]))
            vids["prior_normal_rotation"].append(np.asarray(
                self._turn_step(params, prior, prior, mvp_k, w2c_k,
                                campos_k, feats, light, cvec, 0)[0]))
        return vids

    def _train_step_for(self, phase, optimizer):
        key = phase.key
        if key not in self._train_steps:
            model = self.model

            def step(params, opt_state, batch, total_iter, rng, grid):
                (loss, (metrics, _aux)), grads = jax.value_and_grad(
                    model.forward, has_aux=True)(params, batch, total_iter,
                                                 rng, phase, grid)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, metrics

            # static phase via closure; the tet grid is an argument so its
            # arrays are jit parameters, not embedded HLO constants
            self._train_steps[key] = jax.jit(step, donate_argnums=(0, 1),
                                             static_argnums=())
        return self._train_steps[key]

    def _eval_step_for(self, it):
        """Jitted eval-mode forward returning aux (phase-keyed cache)."""
        phase = self.model.phase_for_iter(it, is_training=False)
        key = ("eval", phase.key)
        if key not in self._train_steps:
            model = self.model

            def eval_step(params, batch, total_iter, rng, grid):
                _, (_metrics, aux) = model.forward(params, batch, total_iter,
                                                   rng, phase, grid)
                return aux

            self._train_steps[key] = jax.jit(eval_step)
        grid, _, _ = self.model.grid_for_phase(phase)
        return self._train_steps[key], grid

    def _disc_step_for(self):
        """Separate jitted GAN discriminator step (`Trainer.py:248-259`)."""
        if self._disc_step is None:
            model = self.model
            disc_opt = optax.adam(model.cfg_optim_discriminator.lr)

            def step(disc_params, disc_opt_state, record):
                loss, grads = jax.value_and_grad(model.discriminator_loss)(
                    disc_params, record)
                updates, disc_opt_state = disc_opt.update(
                    grads, disc_opt_state, disc_params)
                disc_params = optax.apply_updates(disc_params, updates)
                return disc_params, disc_opt_state, loss

            self._disc_step = (jax.jit(step, donate_argnums=(0, 1)), disc_opt)
        return self._disc_step

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)

        params = self.model.init_params(init_rng)
        optimizer = make_optimizer(self.model, params)
        opt_state = optimizer.init(params)

        total_iter = 0
        if cfg.resume:
            state = {"params": params, "opt_state": opt_state}
            state, total_iter = ckpt.load_checkpoint(cfg.checkpoint_dir, state)
            params, opt_state = state["params"], state["opt_state"]
        if total_iter == 0 and cfg.checkpoint_path:
            # warm start (`config/train_ponymation_horse_stage1.yaml:48`:
            # stage configs resume from a MagicPony / stage-1 checkpoint)
            params = self._warm_start(params, cfg.checkpoint_path)
            if not cfg.load_optim:
                opt_state = optimizer.init(params)

        params = meshlib.replicate(params, self.mesh)
        opt_state = meshlib.replicate(opt_state, self.mesh)

        train_loader, val_loader, _ = get_data_loaders(self.cfg_dataset, host_id=jax.process_index(), num_hosts=jax.process_count())
        assert train_loader is not None, "train_data_dir not configured"
        writer = self._logger()
        if self.cfg.archive_code and jax.process_index() == 0:
            self._archive_code()
        metrics = StandardMetrics()
        epoch_len = max(len(train_loader), 1)

        print(f"training {self.model.name}: {cfg.num_iters} iters, "
              f"batch {self.cfg_dataset.batch_size}, mesh {self.mesh.shape}")
        t_start = time.time()
        train_iter = iter(train_loader)
        while total_iter < cfg.num_iters:
            if cfg.remake_dataloader_iter > 0 and \
                    total_iter == cfg.remake_dataloader_iter:
                # Fauna curriculum re-split (`Trainer.py:237-242`): rebuild
                # loaders with pseudo-category splitting mid-training
                import dataclasses as _dc
                self.cfg_dataset = _dc.replace(
                    self.cfg_dataset,
                    dataset_split_num=cfg.remake_dataloader_num)
                train_loader, val_loader, _ = get_data_loaders(self.cfg_dataset, host_id=jax.process_index(), num_hosts=jax.process_count())
                train_iter = iter(train_loader)
            try:
                batch = next(train_iter)
            except StopIteration:
                train_iter = iter(train_loader)
                batch = next(train_iter)

            phase = self.model.phase_for_iter(total_iter)
            step_fn = self._train_step_for(phase, optimizer)
            grid, _, _ = self.model.grid_for_phase(phase)
            rng, step_rng = jax.random.split(rng)
            device_batch = meshlib.shard_batch(batch, self.mesh)
            params, opt_state, step_metrics = step_fn(
                params, opt_state, device_batch, total_iter, step_rng, grid)

            # Fauna GAN: alternate discriminator update on recorded masks
            disc_record = step_metrics.pop("_disc_record", None)
            if disc_record is not None and phase.disc_on and \
                    hasattr(self.model, "discriminator_loss"):
                disc_step, disc_opt = self._disc_step_for()
                if not hasattr(self, "_disc_opt_state"):
                    self._disc_opt_state = disc_opt.init(params["netDisc"])
                new_disc, self._disc_opt_state, disc_loss = disc_step(
                    params["netDisc"], self._disc_opt_state, disc_record)
                params = {**params, "netDisc": new_disc}
                step_metrics["discriminator_loss"] = disc_loss
            total_iter += 1

            if total_iter % cfg.log_loss_freq == 0 or total_iter == 1:
                host_metrics = {k: float(v) for k, v in
                                jax.device_get(step_metrics).items()
                                if np.ndim(v) == 0}
                if not math.isfinite(host_metrics.get("loss", 0.0)):
                    # reference drops into pdb on NaN loss
                    # (`AnimalModel.py:504-506`); fail fast with context
                    raise FloatingPointError(
                        f"non-finite loss at iter {total_iter}: "
                        f"{host_metrics}")
                bsz = batch["images"].shape[0]
                metrics.update(host_metrics, bsz)
                epoch = total_iter // epoch_len
                print(f"T{total_iter:07d}/{epoch:04d}/{metrics}")
                if writer is not None:
                    for k, v in host_metrics.items():
                        writer.add_scalar(f"train_loss/{k}", v, total_iter)
                    writer.add_scalar("train/speed", metrics.speed.get(),
                                      total_iter)
                self.metrics_trace.push(epoch, "train", host_metrics)

            if cfg.save_train_result_freq and \
                    total_iter % cfg.save_train_result_freq == 0:
                # eval-mode forward on the current batch, artifacts to
                # train_results/ (`Trainer.py:281-284`). The jitted eval
                # forward over globally-sharded arrays is a collective:
                # EVERY process must enter it (and fetch its addressable
                # shards); only the file-writing is rank-0-guarded, as for
                # checkpointing.
                from animals3d_tpu.utils import results_io
                eval_fn, eval_grid = self._eval_step_for(total_iter - 1)
                aux_dev = eval_fn(params, device_batch, total_iter - 1,
                                  step_rng, eval_grid)
                aux = jax.tree_util.tree_map(_host_local_value, aux_dev)
                if jax.process_index() == 0:
                    train_result_dir = os.path.join(cfg.checkpoint_dir,
                                                    "train_results")
                    os.makedirs(train_result_dir, exist_ok=True)
                    results_io.save_results(self.model, batch, aux,
                                            train_result_dir,
                                            start_index=total_iter)

            if cfg.log_image_freq and total_iter % cfg.log_image_freq == 0 \
                    and self.cfg_model_enable_render():
                try:
                    if cfg.log_train:
                        self._log_visuals(writer, params, batch, total_iter)
                    if cfg.log_val and val_loader is not None:
                        # one val batch with eval behavior (`Trainer.py:291-303`)
                        if self._val_iter is None:
                            self._val_iter = iter(val_loader)
                        try:
                            val_batch = self._fixed_val_batch if \
                                self._fixed_val_batch is not None else \
                                next(self._val_iter)
                        except StopIteration:
                            self._val_iter = iter(val_loader)
                            val_batch = next(self._val_iter)
                        if cfg.fix_log_batch:
                            self._fixed_val_batch = val_batch
                        self._log_visuals(writer, params, val_batch,
                                          total_iter, prefix="val_")
                except Exception as e:   # logging must never kill training
                    print(f"log_visuals failed: {e}")

            if total_iter % cfg.save_checkpoint_freq == 0 and \
                    jax.process_index() == 0:
                ckpt.save_checkpoint(
                    cfg.checkpoint_dir, total_iter,
                    {"params": params, "opt_state": opt_state},
                    keep_num=cfg.keep_num_checkpoint)
                self.metrics_trace.save(
                    os.path.join(cfg.checkpoint_dir, "metrics.json"))

        if jax.process_index() == 0:
            ckpt.save_checkpoint(cfg.checkpoint_dir, total_iter,
                                 {"params": params, "opt_state": opt_state},
                                 keep_num=cfg.keep_num_checkpoint)
            os.makedirs(cfg.checkpoint_dir, exist_ok=True)
            self.metrics_trace.save(
                os.path.join(cfg.checkpoint_dir, "metrics.json"))
        wall = time.time() - t_start
        print(f"done: {total_iter} iters in {wall:.1f}s "
              f"({metrics.speed.get():.2f} imgs/s)")
        return params

    def _warm_start(self, params, path):
        """Tolerant warm start from our checkpoint dir/file or a reference
        `.pth` (strict=False semantics, `AnimalModel.py:127-132`)."""
        from flax import serialization
        if path.endswith(".pth"):
            from animals3d_tpu import convert
            loaded = convert.convert_checkpoint(path, self.model)
        else:
            state, _ = ckpt.load_checkpoint(
                os.path.dirname(path) or ".", {"params": params},
                checkpoint_name=os.path.basename(path))
            return state["params"]
        init_sd = serialization.to_state_dict(params)
        merged, missing, _ = ckpt._merge(init_sd, loaded)
        if missing:
            print(f"warm start: {len(missing)} keys kept at init")
        return serialization.from_state_dict(params, merged)

    def cfg_model_enable_render(self):
        return getattr(self.model, "cfg_model", None) is None or \
            self.model.cfg_model.enable_render

    # ------------------------------------------------------------------
    def test(self):
        cfg = self.cfg
        params = self.model.init_params(jax.random.PRNGKey(cfg.seed))
        state = {"params": params}
        state, total_iter = ckpt.load_checkpoint(
            cfg.checkpoint_dir, state, checkpoint_name=cfg.checkpoint_name)
        params = state["params"]

        _, _, test_loader = get_data_loaders(self.cfg_dataset, host_id=jax.process_index(), num_hosts=jax.process_count())
        assert test_loader is not None, "test_data_dir not configured"
        result_dir = cfg.test_result_dir or os.path.join(
            cfg.checkpoint_dir, f"test_results_{total_iter:07d}")
        os.makedirs(result_dir, exist_ok=True)

        from animals3d_tpu.utils import results_io
        it = max(total_iter, 1) - 1
        phase = self.model.phase_for_iter(it, is_training=False)
        model = self.model

        @jax.jit
        def eval_step(params, batch, rng, grid):
            _, (metrics, aux) = model.forward(params, batch, it, rng, phase,
                                              grid)
            return aux

        grid, _, _ = self.model.grid_for_phase(phase)
        count = 0
        for batch in test_loader:
            device_batch = meshlib.shard_batch(batch, self.mesh,
                                               allow_uneven=True)
            rng = jax.random.PRNGKey(cfg.seed + count)
            aux = jax.device_get(eval_step(params, device_batch, rng, grid))
            results_io.save_results(self.model, batch, aux, result_dir,
                                    start_index=count)
            count += batch["images"].shape[0]
        print(f"saved {count} test results to {result_dir}")
        return result_dir
