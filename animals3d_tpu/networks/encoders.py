"""Convolutional encoders (flax.linen, NCHW call contract).

Reference: `Encoder` / `Encoder32` (`/root/reference/model/networks/encoders.py:33-89`).
Internally NHWC (TPU conv layout); the call boundary accepts NCHW to keep the
reference contract.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from animals3d_tpu.networks.mlp import get_activation


def _conv(features, kernel, stride, padding, use_bias=False, name=None):
    from animals3d_tpu.precision import compute_dtype
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   use_bias=use_bias, name=name, dtype=compute_dtype(),
                   param_dtype=jnp.float32,
                   kernel_init=nn.initializers.variance_scaling(
                       1 / 3, "fan_in", "uniform"))  # ~torch conv default


class Encoder32(nn.Module):
    """32×32 feature map → vector: 3× (stride-2 conv + GroupNorm + LeakyReLU)
    then a valid 4×4 conv to 1×1 (`encoders.py:68-89`)."""
    cout: int
    nf: int = 256
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):          # x: (B, C, S, S); S=32 in the reference
        x = jnp.transpose(x, (0, 2, 3, 1))
        # stride-2 downsampling to 4x4 (3 convs for the reference's 32x32),
        # then a valid conv collapsing the rest to 1x1
        size = x.shape[1]
        i = 0
        while size > 4:
            x = _conv(self.nf, 4, 2, 1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=self.nf // 4, name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            size //= 2
            i += 1
        x = _conv(self.cout, size, 1, 0, name="conv_out")(x)
        x = get_activation(self.activation)(x)
        return x.reshape(x.shape[0], -1)


class Encoder(nn.Module):
    """Generic 64×64+ image encoder (`encoders.py:33-65`): stride-2 conv
    stack with GroupNorm/LeakyReLU down to 1×1."""
    cout: int
    nf: int = 64
    in_size: int = 128
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):          # (B, C, H, W)
        x = jnp.transpose(x, (0, 2, 3, 1))
        nf = self.nf
        size = x.shape[1]
        i = 0
        while size > 4:
            x = _conv(min(nf, 512), 4, 2, 1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(nf, 512) // 4, name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            size //= 2
            nf = min(nf * 2, 512)
            i += 1
        x = _conv(self.cout, 4, 1, 0, name="conv_out")(x)
        x = get_activation(self.activation)(x)
        return x.reshape(x.shape[0], -1)
