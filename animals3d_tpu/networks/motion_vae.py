"""Transformer motion VAE over articulation sequences (flax.linen).

Reference: `/root/reference/model/networks/MotionVAE.py` (ArticulationVAE
`:130-222`; bone/sequence transformer encoder `:25-76`; decoder `:79-127`).
Architecture preserved: post-norm torch-style transformer layers (4 heads,
ff 1024, GELU), sinusoidal positional encoding, a `boneFeatQuery` token
pooling the K=20 bone tokens per frame, learned `muQuery`/`sigmaQuery`
tokens on the sequence transformer, z of shape (z_tokens, B, latent);
decoder = sequence transformer-decoder over F time queries cross-attending
z, then bone transformer-decoder over bone queries; `sample` scales
z ~ N(0, 1) by 1.5 (`:195-210`).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.networks.mlp import harmonic_embedding


def sinusoidal_pe(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class MHA(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, q, kv):
        # (Tq, B, D) x (Tk, B, D) → (Tq, B, D); torch MultiheadAttention layout
        H, hd = self.heads, self.dim // self.heads
        Wq = nn.Dense(self.dim, name="q")(q)
        Wk = nn.Dense(self.dim, name="k")(kv)
        Wv = nn.Dense(self.dim, name="v")(kv)
        split = lambda x: x.reshape(x.shape[0], x.shape[1], H, hd) \
            .transpose(1, 2, 0, 3)                      # (B, H, T, hd)
        qh, kh, vh = split(Wq), split(Wk), split(Wv)
        attn = jax.nn.softmax((qh @ kh.transpose(0, 1, 3, 2)) * hd ** -0.5, -1)
        out = (attn @ vh).transpose(2, 0, 1, 3) \
            .reshape(q.shape[0], q.shape[1], self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class EncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-norm, GELU)."""
    dim: int
    heads: int = 4
    ff: int = 1024

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + MHA(self.dim, self.heads,
                                               name="self_attn")(x, x))
        h = nn.Dense(self.ff, name="linear1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class DecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer (post-norm, GELU)."""
    dim: int
    heads: int = 4
    ff: int = 1024

    @nn.compact
    def __call__(self, tgt, memory):
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            tgt + MHA(self.dim, self.heads, name="self_attn")(tgt, tgt))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            tgt + MHA(self.dim, self.heads, name="cross_attn")(tgt, memory))
        h = nn.Dense(self.ff, name="linear1")(tgt)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + h)


class VAEEncoder(nn.Module):
    latent_dim: int = 256
    num_layers: int = 4

    @nn.compact
    def __call__(self, x):
        # x: (B, J, D, F) per-bone embedded features
        B, J, D, F = x.shape
        bone_q = self.param("boneFeatQuery", nn.initializers.normal(1.0),
                            (1, 1, self.latent_dim))
        mu_q = self.param("muQuery", nn.initializers.normal(1.0),
                          (1, 1, self.latent_dim))
        sigma_q = self.param("sigmaQuery", nn.initializers.normal(1.0),
                             (1, 1, self.latent_dim))

        # bone transformer: tokens = [query, bones], per (B·F)
        xb = x.transpose(1, 0, 3, 2).reshape(J, B * F, D)   # (J, B·F, D)
        # second projection inside the encoder (reference `skelEmbedding`,
        # MotionVAE.py:66 — applied on top of ArticulationVAE.in_layer)
        xb = nn.Dense(self.latent_dim, name="skelEmbedding")(xb)
        xb = jnp.concatenate(
            [jnp.broadcast_to(bone_q, (1, B * F, self.latent_dim)), xb], 0)
        for i in range(self.num_layers):
            xb = EncoderLayer(self.latent_dim, name=f"bone_{i}")(xb)
        pooled = xb[0].reshape(B, F, self.latent_dim).transpose(1, 0, 2)

        # sequence transformer with mu/sigma queries + sinusoidal PE
        xs = jnp.concatenate(
            [jnp.broadcast_to(mu_q, (1, B, self.latent_dim)),
             jnp.broadcast_to(sigma_q, (1, B, self.latent_dim)), pooled], 0)
        pe = jnp.asarray(sinusoidal_pe(xs.shape[0], self.latent_dim))
        xs = xs + pe[:, None, :]
        for i in range(self.num_layers):
            xs = EncoderLayer(self.latent_dim, name=f"seq_{i}")(xs)
        return xs[0], xs[1]                          # mu, logvar (B, D)


class VAEDecoder(nn.Module):
    njoints: int
    nfeats: int = 3
    latent_dim: int = 256
    num_layers: int = 4

    @nn.compact
    def __call__(self, z, nframes: int):
        # z: (z_tokens, B, D) → (B, J, nfeats, F)
        _, B, D = z.shape
        pe_t = jnp.asarray(sinusoidal_pe(nframes, self.latent_dim))
        timeq = jnp.broadcast_to(pe_t[:, None, :], (nframes, B, D))
        seq = timeq
        for i in range(self.num_layers):
            seq = DecoderLayer(self.latent_dim, name=f"seq_{i}")(seq, z)
        seq = seq.reshape(1, nframes * B, D)

        pe_b = jnp.asarray(sinusoidal_pe(self.njoints, self.latent_dim))
        boneq = jnp.broadcast_to(pe_b[:, None, :],
                                 (self.njoints, nframes * B, D))
        bones = boneq
        for i in range(self.num_layers):
            bones = DecoderLayer(self.latent_dim, name=f"bone_{i}")(bones, seq)
        out = nn.Dense(self.nfeats, name="finallayer")(bones)
        out = out.reshape(self.njoints, nframes, B, self.nfeats) \
            .transpose(2, 0, 3, 1)                    # (B, J, nfeats, F)
        return out


class ArticulationVAE(nn.Module):
    njoints: int = 20
    feat_dim: int = 640
    pos_dim: int = 9
    n_harmonic_functions: int = 8
    harmonic_omega0: float = np.pi * 0.9
    latent_dim: int = 256
    z_token_num: int = 1
    transformer_layer_num: int = 4

    def setup(self):
        nfeats = self.feat_dim + self.pos_dim * (self.n_harmonic_functions * 2 + 1)
        self._nfeats = nfeats
        self.in_dense = nn.Dense(self.latent_dim, name="in_dense")
        self.in_norm = nn.LayerNorm(epsilon=1e-5, name="in_norm")
        self.encoder = VAEEncoder(self.latent_dim, self.transformer_layer_num,
                                  name="encoder")
        self.decoder = VAEDecoder(self.njoints, 3, self.latent_dim,
                                  self.transformer_layer_num, name="decoder")

    def _embed(self, inputs, pos):
        pos = jnp.concatenate(
            [pos, harmonic_embedding(pos, self.n_harmonic_functions,
                                     self.harmonic_omega0)], -1)
        x = jnp.concatenate([inputs, pos], -1)
        x = self.in_norm(jax.nn.gelu(self.in_dense(x), approximate=False))
        return x

    def __call__(self, inputs, pos, nframes: int, batch_size: int, rng):
        """inputs: (B·F, J, feat); pos: (B·F, J, pos_dim). Returns
        (angles (B, F, J, 3), mu, logvar)."""
        x = self._embed(inputs, pos)
        x = x.reshape(batch_size, nframes, self.njoints, self.latent_dim) \
            .transpose(0, 2, 3, 1)                    # (B, J, D, F)
        mu, logvar = self.encoder(x)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, (self.z_token_num, *mu.shape))
        z = eps * std[None] + mu[None]
        out = self.decoder(z, nframes)                # (B, J, 3, F)
        angles = out.transpose(0, 3, 1, 2)            # (B, F, J, 3)
        return angles, mu, logvar

    def sample(self, rng, num_sequence: int = 1, num_frames: int = 10):
        z = jax.random.normal(
            rng, (self.z_token_num, num_sequence, self.latent_dim)) * 1.5
        out = self.decoder(z, num_frames)
        return out.transpose(0, 3, 1, 2)              # (B, F, J, 3)
