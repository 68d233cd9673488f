"""Coordinate MLPs and harmonic embeddings (flax.linen).

Architecture parity with the reference (`/root/reference/model/networks/MLPs.py`,
`HarmonicEmbedding.py`): same layer layout, activation ordering and
min-max output mapping, so reference `.pth` weights convert 1:1 (modulo the
torch (out,in) vs flax (in,out) kernel transpose).

Specifics preserved:
  * `MLP` layers are bias-free (`MLPs.py:14-26`); `CoordMLP.in_layer` has bias.
  * in `CoordMLP.forward` the ReLU is applied *after* concatenating the
    conditioning feature (`MLPs.py:96`), i.e. the feature is ReLU'd too.
  * harmonic embedding layout is [..., dim*freqs] with per-coordinate
    contiguous frequency blocks, sin block then cos block
    (`HarmonicEmbedding.py:40-42`).
  * `Linear_Mod` StyleGAN-style weight mod-demod uses only the *first* batch
    element of the style vector (`MLPs.py:231-236`) — a reference quirk kept
    for parity (the Fauna conditional SDF is evaluated with one class vector
    per step anyway).

Init matches torch defaults (uniform ±1/sqrt(fan_in)) for training parity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def dense(features: int, use_bias: bool, name: str | None = None,
          fan_in: int | None = None) -> nn.Dense:
    from animals3d_tpu.precision import compute_dtype
    return nn.Dense(features, use_bias=use_bias, name=name,
                    dtype=compute_dtype(), param_dtype=jnp.float32,
                    kernel_init=torch_linear_init,
                    bias_init=_torch_bias_init(fan_in) if fan_in else nn.initializers.zeros_init())


def get_activation(name: Optional[str]):
    if name is None:
        return lambda x: x
    return {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu,
            "softplus": jax.nn.softplus, "elu": jax.nn.elu,
            "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.2)}[name]


def harmonic_embedding(x: jax.Array, n_harmonic_functions: int = 10,
                       scalar: float = 1.0) -> jax.Array:
    """[..., D] → [..., D*2*n] with (sin | cos) blocks, per-coordinate
    contiguous frequencies scalar * 2^i."""
    freqs = scalar * (2.0 ** jnp.arange(n_harmonic_functions, dtype=x.dtype))
    embed = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([jnp.sin(embed), jnp.cos(embed)], -1)


class _SplitFirstDense(nn.Module):
    """Bias-free dense over a (pixel ⊕ broadcast-feature) concat, computed
    as W_pix @ x + W_feat @ feat without materializing the concat.

    W @ concat(x, feat_b) ≡ W[:dx] @ x + W[dx:] @ feat; the feature half is
    one (B, nf) matmul per *image* instead of a per-pixel 256-wide broadcast
    concat (≈1.3 GB of HBM traffic per 256²×10 render). Param layout is
    identical to the fused nn.Dense ("kernel" of shape (dx+df, out)), so
    checkpoints and the .pth converter are unaffected.
    """
    features: int

    @nn.compact
    def __call__(self, x, feat):
        from animals3d_tpu.precision import compute_dtype
        dx, df = x.shape[-1], feat.shape[-1]
        W = self.param("kernel", torch_linear_init, (dx + df, self.features))
        cd = compute_dtype()
        W = W.astype(cd)
        pix = jnp.dot(x.astype(cd), W[:dx], preferred_element_type=cd)
        per_img = jnp.dot(feat.astype(cd), W[dx:], preferred_element_type=cd)
        per_img = per_img.reshape(feat.shape[0],
                                  *([1] * (x.ndim - 2)), self.features)
        return pix + per_img


class MLP(nn.Module):
    """Bias-free Linear/ReLU stack with optional output activation.

    `split_feat`, if given, is a per-image (B, df) feature that the caller
    would otherwise broadcast-concatenate onto x before layer_0; it is folded
    in via `_SplitFirstDense` (identical math and param layout)."""
    cout: int
    num_layers: int
    nf: int = 256
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, split_feat=None):
        first_out = self.cout if self.num_layers == 1 else self.nf
        if split_feat is not None:
            x = _SplitFirstDense(first_out, name="layer_0")(x, split_feat)
        else:
            x = dense(first_out, False, name="layer_0")(x)
        for i in range(1, self.num_layers - 1):
            x = dense(self.nf, False, name=f"layer_{i}")(jax.nn.relu(x))
        if self.num_layers > 1:
            x = dense(self.cout, False, name=f"layer_{self.num_layers - 1}")(jax.nn.relu(x))
        # back to fp32 at the network boundary (precision.py)
        return get_activation(self.activation)(x.astype(jnp.float32))


def _symmetrize_x(x):
    return jnp.concatenate([jnp.abs(x[..., :1]), x[..., 1:]], -1)


def _apply_min_max(out, min_max):
    if min_max is None:
        return out
    mm = jnp.asarray(min_max, out.dtype)          # (C, 2)
    return out * (mm[:, 1] - mm[:, 0]) + mm[:, 0]


class CoordMLP(nn.Module):
    """3D-field MLP: harmonic-embed points, optionally concat a conditioning
    feature, map through a bias-free MLP, then min-max range mapping."""
    cin: int
    cout: int
    num_layers: int
    nf: int = 256
    activation: Optional[str] = None
    min_max: Optional[Sequence] = None            # (C, 2)
    n_harmonic_functions: int = 10
    embedder_scalar: float = 1.0
    embed_concat_pts: bool = True
    extra_feat_dim: int = 0
    symmetrize: bool = False
    in_layer_relu: bool = False

    @nn.compact
    def __call__(self, x, feat=None):
        # x: (B, ..., cin); feat: (B, C) broadcast over spatial dims
        if self.symmetrize:
            x = _symmetrize_x(x)
        if self.n_harmonic_functions > 0:
            x_in = harmonic_embedding(x, self.n_harmonic_functions,
                                      self.embedder_scalar)
            if self.embed_concat_pts:
                x_in = jnp.concatenate([x, x_in], -1)
        else:
            x_in = x
        dim_in = x_in.shape[-1]
        x_in = dense(self.nf, True, name="in_layer", fan_in=dim_in)(x_in)
        if self.in_layer_relu:
            x_in = jax.nn.relu(x_in)
        split_feat = None
        if feat is not None:
            assert feat.shape[-1] == self.extra_feat_dim
            # relu(concat(x, feat)) = concat(relu(x), relu(feat)): the
            # broadcast concat is folded into layer_0 (see _SplitFirstDense)
            split_feat = jax.nn.relu(feat.reshape(feat.shape[0], -1))
        out = MLP(self.cout, self.num_layers, self.nf, self.activation,
                  name="mlp")(jax.nn.relu(x_in), split_feat=split_feat)
        return _apply_min_max(out.astype(jnp.float32), self.min_max)

    # reference alias (`MLPs.py:100-101`)
    sample = __call__


class LinearMod(nn.Module):
    """StyleGAN-style modulated-demodulated linear layer (`MLPs.py:208-242`)."""
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, style):
        w = self.param("weight", torch_linear_init, (x.shape[-1], self.features))
        # reference uses only the first batch element of the style
        style = style.reshape(-1, style.shape[-1])[0]          # (in,)
        w = w * style[:, None]
        decoef = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True) + 1e-5)
        w = w / decoef
        out = x @ w
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros_init(),
                                   (self.features,))
        return out


class MLPMod(nn.Module):
    cout: int
    num_layers: int
    nf: int = 256
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, style):
        for i in range(self.num_layers):
            feats = self.cout if i == self.num_layers - 1 else self.nf
            x = LinearMod(feats, name=f"linear_{i}")(x, style)
            if i < self.num_layers - 1:
                x = jax.nn.relu(x)
        return get_activation(self.activation)(x)


class CoordMLPMod(nn.Module):
    """Conditional CoordMLP with weight modulation (Fauna conditional SDF,
    `MLPs.py:104-169`)."""
    cin: int
    cout: int
    num_layers: int
    nf: int = 256
    activation: Optional[str] = None
    min_max: Optional[Sequence] = None
    n_harmonic_functions: int = 10
    embedder_scalar: float = 1.0
    embed_concat_pts: bool = True
    symmetrize: bool = False
    condition_dim: int = 128

    @nn.compact
    def __call__(self, x, feat):
        assert feat is not None and feat.shape[-1] == self.condition_dim
        if self.symmetrize:
            x = _symmetrize_x(x)
        if self.n_harmonic_functions > 0:
            x_in = harmonic_embedding(x, self.n_harmonic_functions,
                                      self.embedder_scalar)
            if self.embed_concat_pts:
                x_in = jnp.concatenate([x, x_in], -1)
        else:
            x_in = x
        x_in = jax.nn.relu(dense(self.nf, True, name="in_layer",
                                 fan_in=x_in.shape[-1])(x_in))
        style = MLP(self.nf, 2, self.nf, None, name="style_mlp")(feat)
        out = MLPMod(self.cout, self.num_layers, self.nf, self.activation,
                     name="mlp")(x_in, style)
        return _apply_min_max(out.astype(jnp.float32), self.min_max)

    sample = __call__
