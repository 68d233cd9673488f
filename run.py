"""CLI entry point: `python run.py --config-name <name> [key=value ...]`.

Reference API: `/root/reference/run.py:7-15` (Hydra main). Same surface,
backed by the in-package config composer (`animals3d_tpu.config`).
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", required=True, dest="config_name")
    parser.add_argument("--config-dir", default=None, dest="config_dir")
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args(argv)

    from animals3d_tpu import config as cfglib
    from animals3d_tpu.models import build_model
    from animals3d_tpu.trainer import Trainer
    from animals3d_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    cfg = cfglib.load_config(args.config_name, overrides=args.overrides,
                             config_dir=args.config_dir)
    model_cfg = dict(cfg.get("model") or {})
    model_cfg["dataset"] = cfg.get("dataset")
    model = build_model(model_cfg)
    trainer = Trainer(cfg, model)
    if cfg.get("run_train"):
        trainer.train()
    if cfg.get("run_test"):
        trainer.test()


if __name__ == "__main__":
    main(sys.argv[1:])
