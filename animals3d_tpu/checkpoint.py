"""Checkpoint save/load with the reference's retention + tolerant-restore
semantics.

Reference: `Trainer.save_checkpoint`/`load_checkpoint`
(`/root/reference/model/Trainer.py:79-127`) — `checkpoint{total_iter}` named
by iteration, latest-by-digits resume, keep-newest-K pruning, and
`strict=False` loading (finetune/stage-2 configs warm-start across model
variants, `AnimalModel.py:127-132`). Storage is orbax PyTree checkpoints.
"""
from __future__ import annotations

import os
import re
import shutil

import jax
import orbax.checkpoint as ocp
from flax import serialization


def _ckpt_iter(name: str):
    m = re.findall(r"\d+", name)
    return int(m[-1]) if m else -1


def list_checkpoints(checkpoint_dir: str):
    if not os.path.isdir(checkpoint_dir):
        return []
    names = [n for n in os.listdir(checkpoint_dir)
             if n.startswith("checkpoint") and
             os.path.isdir(os.path.join(checkpoint_dir, n))]
    return sorted(names, key=_ckpt_iter)


def save_checkpoint(checkpoint_dir: str, total_iter: int, state: dict,
                    keep_num: int = 2):
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(checkpoint_dir,
                                        f"checkpoint{total_iter:07d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path,
                   serialization.to_state_dict(jax.device_get(state)),
                   force=True)
    if keep_num > 0:
        names = list_checkpoints(checkpoint_dir)
        for name in names[:-keep_num]:
            shutil.rmtree(os.path.join(checkpoint_dir, name),
                          ignore_errors=True)
    return path


def _merge(target, loaded, path=""):
    """Copy loaded leaves into target where paths match (strict=False)."""
    if isinstance(target, dict) and isinstance(loaded, dict):
        out = {}
        missing, unexpected = [], [k for k in loaded if k not in target]
        for k, v in target.items():
            if k in loaded:
                merged, miss2, unexp2 = _merge(v, loaded[k], f"{path}/{k}")
                out[k] = merged
                missing += miss2
                unexpected += [f"{path}/{k}/{u}" for u in unexp2] \
                    if isinstance(unexp2, list) else []
            else:
                out[k] = v
                missing.append(f"{path}/{k}")
        return out, missing, unexpected
    if loaded is None:
        return target, [path], []
    if hasattr(target, "shape") and hasattr(loaded, "shape") and \
            tuple(target.shape) != tuple(loaded.shape):
        return target, [f"{path} (shape mismatch)"], []
    return loaded, [], []


def load_checkpoint(checkpoint_dir: str, init_state: dict,
                    checkpoint_name: str | None = None):
    """Restore the latest (or named) checkpoint, tolerantly merged into
    `init_state`. Returns (state, total_iter) or (init_state, 0)."""
    if checkpoint_name is not None:
        path = os.path.join(checkpoint_dir, checkpoint_name)
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
    else:
        names = list_checkpoints(checkpoint_dir)
        if not names:
            return init_state, 0
        path = os.path.join(checkpoint_dir, names[-1])
    with ocp.PyTreeCheckpointer() as ckptr:
        loaded = ckptr.restore(os.path.abspath(path))
    init_sd = serialization.to_state_dict(init_state)
    merged_sd, missing, unexpected = _merge(init_sd, loaded)
    merged = serialization.from_state_dict(init_state, merged_sd)
    if missing:
        print(f"checkpoint: {len(missing)} missing keys (kept init): "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    if unexpected:
        print(f"checkpoint: {len(unexpected)} unexpected keys ignored: "
              f"{unexpected[:5]}{'...' if len(unexpected) > 5 else ''}")
    total_iter = _ckpt_iter(os.path.basename(path))
    return merged, max(total_iter, 0)
