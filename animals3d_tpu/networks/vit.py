"""DINO ViT-S/8 image encoder (flax.linen), with functional key extraction.

Reference: the torch.hub DINO ViT wrapped by `ViTEncoder`
(`/root/reference/model/networks/encoders.py:148-261`). The reference pulls
block-11 attention *keys* out with forward hooks (`:181-204`); being
functional, this implementation simply returns them. The encoder is frozen in
every config, so it is a pure inference function whose weights come from a
converted DINO checkpoint (or random init when unavailable — zero-egress
environments can't fetch torch.hub weights).

Architecture (dino_vits8): 8×8 patch embed, cls token, learned pos embeddings
bicubically resized to the input grid (DINO's interpolate_pos_encoding),
12 pre-norm transformer blocks (dim 384, 6 heads, mlp ratio 4, qkv bias),
final LayerNorm.

TPU notes: attention over 1025 tokens at dim 384 is small; everything maps to
plain batched matmuls. bf16-safe.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from animals3d_tpu.precision import compute_dtype

# ImageNet normalization DINO models expect
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Torch `get_cubic_upsample_coefficients`: 4 taps at offsets -1..2
    around floor(src), cubic-convolution kernel with A=-0.75 (torch's
    bicubic; NOT the Keys a=-0.5 kernel `jax.image.resize` uses)."""
    def k1(x):   # |x| <= 1
        return ((a + 2) * x - (a + 3)) * x * x + 1
    def k2(x):   # 1 < |x| < 2
        return ((a * x - 5 * a) * x + 8 * a) * x - 4 * a
    return np.stack([k2(t + 1), k1(t), k1(1 - t), k2(2 - t)], -1)


def torch_bicubic_matrix(in_size: int, out_size: int,
                         scale_factor: float) -> np.ndarray:
    """(out, in) interpolation matrix reproducing
    `F.interpolate(mode='bicubic', scale_factor=sf, align_corners=False)`:
    src = (dst + 0.5) / sf - 0.5, 4 cubic taps, edge-clamped indices.
    DINO resizes pos embeddings with sf = (grid + 0.1) / pos_grid
    (facebookresearch/dino `interpolate_pos_encoding`), which the reference
    consumes via torch.hub (`/root/reference/model/networks/encoders.py:151`).
    Computed host-side once; inside the graph it is one constant matmul."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / scale_factor - 0.5
    x0 = np.floor(src).astype(np.int64)
    w = _cubic_weights(src - x0)                       # (out, 4)
    mat = np.zeros((out_size, in_size), np.float64)
    for k in range(4):
        idx = np.clip(x0 - 1 + k, 0, in_size - 1)
        np.add.at(mat, (dst.astype(np.int64), idx), w[:, k])
    return mat.astype(np.float32)


class ViTSelfAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        cd = compute_dtype()
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=cd,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)  # 3,B,H,N,hd
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(0, 1, 3, 2)) * jnp.asarray(hd ** -0.5, cd)
        # softmax in fp32 (torch autocast keeps softmax fp32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(cd)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=cd, name="proj")(out)
        if return_qkv:
            return out, (q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32))
        return out


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, return_qkv: bool = False):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if return_qkv:
            a, qkv = ViTSelfAttention(self.dim, self.num_heads,
                                      name="attn")(h, return_qkv=True)
        else:
            a = ViTSelfAttention(self.dim, self.num_heads, name="attn")(h)
            qkv = None
        x = x + a.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        cd = compute_dtype()
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=cd, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=cd, name="fc2")(h)
        x = x + h.astype(jnp.float32)
        if return_qkv:
            return x, qkv
        return x


class DinoViT(nn.Module):
    """Returns (tokens, key11): final-norm tokens (B, N+1, C) and block-11
    attention keys (B, heads, N+1, head_dim)."""
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    pos_grid: int = 28          # native DINO grid (224/8)
    key_block: int = 11

    @nn.compact
    def __call__(self, x):       # x: (B, 3, H, W), ImageNet-normalized
        B, C, H, W = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(self.dim, (self.patch_size,) * 2, (self.patch_size,) * 2,
                    padding="VALID", name="patch_embed")(x)     # (B,gh,gw,C)
        x = x.reshape(B, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pos_grid * self.pos_grid + 1, self.dim))
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            patch_pos = pos[:, 1:].reshape(self.pos_grid, self.pos_grid,
                                           self.dim)
            # DINO quirk: the *width* grid drives the height scale factor
            # (scale_factor=(w0/√N, h0/√N) onto (H, W) axes); square inputs
            # everywhere, so keep per-axis factors in that order.
            wh = jnp.asarray(torch_bicubic_matrix(
                self.pos_grid, gh, (gw + 0.1) / self.pos_grid))
            ww = jnp.asarray(torch_bicubic_matrix(
                self.pos_grid, gw, (gh + 0.1) / self.pos_grid))
            patch_pos = jnp.einsum("oi,ijd->ojd", wh, patch_pos)
            patch_pos = jnp.einsum("pj,ojd->opd", ww, patch_pos)
            pos = jnp.concatenate([pos[:, :1],
                                   patch_pos.reshape(1, gh * gw, self.dim)], 1)

        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], 1)
        x = x + pos

        key11 = None
        for i in range(self.depth):
            if i == self.key_block:
                x, (q, k, v) = ViTBlock(self.dim, self.num_heads,
                                        self.mlp_ratio,
                                        name=f"block_{i}")(x, return_qkv=True)
                key11 = k
            else:
                x = ViTBlock(self.dim, self.num_heads, self.mlp_ratio,
                             name=f"block_{i}")(x)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return tokens, key11


def normalize_imagenet(images: jax.Array) -> jax.Array:
    """(B, 3, H, W) in [0,1] → ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, images.dtype).reshape(1, 3, 1, 1)
    return (images - mean) / std
