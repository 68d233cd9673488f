"""Torch oracle: DINO VisionTransformer (dino_vits8 family), forward only.

The reference consumes this architecture via
`torch.hub.load('facebookresearch/dino:main', 'dino_vits8')`
(`/root/reference/model/networks/encoders.py:151`) and extracts block-11
attention keys with forward hooks (`:181-204`). torch.hub is unreachable in
this zero-egress environment, so this is a from-scratch transcription of the
public DINO `vision_transformer.py` forward semantics (pre-norm blocks,
qkv-bias attention, GELU MLP, eps=1e-6 LayerNorms, and the
`interpolate_pos_encoding` bicubic resize with the +0.1 scale-factor trick).
It exists purely as a parity oracle for `animals3d_tpu/networks/vit.py` on
random weights; no pretrained values are involved.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Attention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (self.qkv(x)
               .reshape(B, N, 3, self.num_heads, C // self.num_heads)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out), k


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        a, k = self.attn(self.norm1(x))
        x = x + a
        x = x + self.mlp(self.norm2(x))
        return x, k


class PatchEmbed(nn.Module):
    """Wrapper so state_dict keys match real DINO ('patch_embed.proj.*')."""

    def __init__(self, embed_dim, patch_size):
        super().__init__()
        self.proj = nn.Conv2d(3, embed_dim, kernel_size=patch_size,
                              stride=patch_size)

    def forward(self, x):
        return self.proj(x)


class DinoVisionTransformer(nn.Module):
    """Matches the DINO ViT forward path the reference hooks into.

    `forward` returns `(tokens, key)` where `tokens` is the final-norm token
    sequence (class token first) and `key` is the `key_block` attention key
    tensor (B, heads, N+1, head_dim) — what the reference's 'key' facet hook
    captures from `module.qkv` (`encoders.py:190-204`).
    """

    def __init__(self, img_size=224, patch_size=8, embed_dim=384, depth=12,
                 num_heads=6, mlp_ratio=4.0):
        super().__init__()
        self.patch_size = patch_size
        self.patch_embed = PatchEmbed(embed_dim, patch_size)
        n = (img_size // patch_size) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, embed_dim))
        self.blocks = nn.ModuleList(
            [Block(embed_dim, num_heads, mlp_ratio) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
        nn.init.normal_(self.cls_token, std=0.02)
        nn.init.normal_(self.pos_embed, std=0.02)

    def interpolate_pos_encoding(self, x, w, h):
        npatch = x.shape[1] - 1
        n = self.pos_embed.shape[1] - 1
        if npatch == n and w == h:
            return self.pos_embed
        class_pos = self.pos_embed[:, 0]
        patch_pos = self.pos_embed[:, 1:]
        dim = x.shape[-1]
        w0 = w // self.patch_size + 0.1
        h0 = h // self.patch_size + 0.1
        patch_pos = F.interpolate(
            patch_pos.reshape(1, int(math.sqrt(n)), int(math.sqrt(n)), dim)
            .permute(0, 3, 1, 2),
            scale_factor=(w0 / math.sqrt(n), h0 / math.sqrt(n)),
            mode="bicubic",
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos.unsqueeze(0), patch_pos), dim=1)

    def forward(self, x, key_block=11):
        B, C, h, w = x.shape
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat((cls, x), dim=1)
        x = x + self.interpolate_pos_encoding(x, w, h)
        key = None
        for i, blk in enumerate(self.blocks):
            x, k = blk(x)
            if i == key_block:
                key = k
        return self.norm(x), key
