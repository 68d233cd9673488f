"""Mixed-precision policy — the TPU-native counterpart of the reference's
torch.autocast rings (`AnimalModel.py:382-394,410-415,434-439,475-480` and
`Trainer.py:207-218`).

torch autocast runs matmul-like ops in half precision while keeping
reductions and pointwise math in fp32. The JAX equivalent is flax's
computation-dtype knob: every Dense/Conv/attention matmul computes in
`compute_dtype()` (params stay fp32), and module outputs are cast back to
fp32 at network boundaries. bf16 keeps fp32 range, so no GradScaler is
needed (the reference's fp16 GradScaler path has no TPU analogue on
purpose).

Geometry-sensitive math (marching-tets interpolation, camera transforms,
rasterization coefficients, losses) is plain jnp and stays fp32 — exactly
the ops torch autocast would also leave in fp32.

The policy is set once at model build time from the run config's
`mixed_precision` key ("bf16" | "fp16" | false); it is trace-time static.
"""
from __future__ import annotations

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_mixed_precision(mode) -> None:
    global _COMPUTE_DTYPE
    if mode in (None, False, "false", "none", "no"):
        _COMPUTE_DTYPE = jnp.float32
    elif mode in ("bf16", "bfloat16", True, "fp16", "float16"):
        # fp16 configs map to bf16 on TPU: same matmul throughput on the
        # MXU, fp32 range, no loss scaling required
        _COMPUTE_DTYPE = jnp.bfloat16
    else:
        raise ValueError(f"unknown mixed_precision mode: {mode!r}")


def compute_dtype():
    return _COMPUTE_DTYPE
