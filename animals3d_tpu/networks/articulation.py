"""Articulation network: per-bone Euler angles from bone features + pose codes.

Reference: `ArticulationNetwork` (`/root/reference/model/networks/ArticulationNetwork.py:10-67`)
with its vendored ViT attention blocks (`:71-157`) — heads=8, mlp_ratio=2,
qkv_bias=False. Input: bone feature ⊕ [positional code ⊕ harmonics(code)];
attention runs over the K=20 bone tokens.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from animals3d_tpu.networks.mlp import MLP, get_activation, harmonic_embedding


class AttnBlock(nn.Module):
    dim: int
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        B, N, C = h.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * hd ** -0.5, -1)
        a = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, name="proj")(a)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2")(h)
        return x + h


class ArticulationNetwork(nn.Module):
    net_type: str                 # 'mlp' | 'attention'
    feat_dim: int
    posenc_dim: int               # raw positional-code dim (9)
    num_layers: int
    nf: int
    n_harmonic_functions: int = 0
    embedder_scalar: float = 1.0
    activation: Optional[str] = None
    enable_articulation_idadd: bool = False

    @nn.compact
    def __call__(self, x, pos):
        # x: (N, K, feat_dim); pos: (N, K, posenc_dim)
        pos_in = pos
        if self.n_harmonic_functions > 0:
            pos = jnp.concatenate(
                [pos, harmonic_embedding(pos, self.n_harmonic_functions,
                                         self.embedder_scalar)], -1)
        x = jnp.concatenate([x, pos], -1)
        if self.enable_articulation_idadd:
            x = x + pos_in[..., -1:]
        if self.net_type == "mlp":
            return MLP(3, self.num_layers, self.nf, self.activation,
                       name="network")(x)
        if self.net_type == "attention":
            h = nn.Dense(self.nf, name="in_linear")(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.LayerNorm(epsilon=1e-5, name="in_norm")(h)
            for i in range(self.num_layers):
                h = AttnBlock(self.nf, name=f"block_{i}")(h)
            out = nn.Dense(3, name="out_linear")(h)
            return get_activation(self.activation)(out)
        raise NotImplementedError(self.net_type)
