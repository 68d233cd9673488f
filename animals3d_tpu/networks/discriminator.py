"""DCGAN-style mask discriminator + GAN losses (Fauna).

Reference: `/root/reference/model/networks/discriminator_architecture.py:8-83`:
conv stack (log2(img_size)-2 stride-2 convs + valid 4×4 out conv) on a
(1 + class_dim)-channel 256² mask+condition input; BCE-with-logits targets;
R1 gradient penalty (`compute_grad2`) done with jax.grad instead of
torch.autograd.grad.
"""
from __future__ import annotations

from math import log2

import flax.linen as nn
import jax
import jax.numpy as jnp


class DCDiscriminator(nn.Module):
    in_dim: int = 1
    out_dim: int = 1
    n_feat: int = 512
    img_size: int = 256

    @nn.compact
    def __call__(self, x):                      # (B, C, H, W)
        x = jnp.transpose(x, (0, 2, 3, 1))
        n_layers = int(log2(self.img_size) - 2)
        for i in range(n_layers):
            feat = int(self.n_feat / (2 ** (n_layers - 1 - i)))
            x = nn.Conv(feat, (4, 4), (2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.out_dim, (4, 4), (1, 1), padding="VALID",
                    use_bias=False, name="conv_out")(x)
        return x.reshape(x.shape[0], self.out_dim)


def bce_loss_target(d_out, target: float):
    """BCE-with-logits against a constant target (`:69-72`)."""
    t = jnp.full_like(d_out, target)
    loss = jnp.maximum(d_out, 0) - d_out * t + jnp.log1p(jnp.exp(-jnp.abs(d_out)))
    return loss.mean()


def r1_penalty(disc_fn, x):
    """R1 gradient penalty: mean over batch of ||∂ sum(D(x)) / ∂x||²
    (`compute_grad2`, `:74-83`)."""
    grads = jax.grad(lambda inp: jnp.sum(disc_fn(inp)))(x)
    return jnp.mean(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, -1))
