"""Fauna base predictor: semantic memory bank + conditional prior shape.

Reference: `BasePredictorBank` (`/root/reference/model/predictors/BasePredictorBank.py:45-160`):
  * learnable memory bank (size × 128) initialized as a tiled 7-row uniform
    block (`:73-86`) + bank keys (size × 384) (`:88-89`);
  * a frozen-DINO class token queries the keys by cosine similarity; the
    top-k (k=10) values are blended with L1-normalized weights; the
    *batch-mean* embedding conditions the shared prior shape (`:134-160`);
  * the SDF is a weight-modulated CoordMLP (condition_choice='mod') and the
    DINO field is bank-conditioned (extra_feat_dim = bank dim).

The frozen ViT forward is done by the model layer with the instance
encoder's parameters (the reference threads `bank_enc=netInstance.netEncoder`,
`Fauna.py:354-358`) — here it is just another pure apply.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from animals3d_tpu.predictors.base import BasePredictor
from animals3d_tpu.predictors.config import BankConfig, BasePredictorConfig


def _tiled_bank_init(rows: int = 7):
    def init(key, shape, dtype=jnp.float32):
        size, dim = shape
        block = jax.random.uniform(key, (rows, dim), dtype, -0.05, 0.05)
        reps = -(-size // rows)
        return jnp.tile(block, (reps, 1))[:size]
    return init


class BankPredictor(BasePredictor):
    """BasePredictor with a memory bank; condition_choice is forced 'mod'."""
    condition_choice: str = "mod"
    bank_cfg: BankConfig = BankConfig()

    @property
    def dino_extra_feat_dim(self) -> int:
        return self.bank_cfg.memory_bank_dim

    def setup(self):
        super().setup()
        bc = self.bank_cfg
        self.memory_bank = self.param("memory_bank", _tiled_bank_init(),
                                      (bc.memory_bank_size, bc.memory_bank_dim))
        self.memory_bank_keys = self.param(
            "memory_bank_keys",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.05, 0.05),
            (bc.memory_bank_size, bc.memory_bank_keys_dim))

    def retrieve_memory_bank(self, batch_features):
        """batch_features: (N, key_dim) frozen-ViT class tokens →
        (batch_mean_embedding (dim,), per-sample embeddings (N, dim), aux)."""
        bc = self.bank_cfg
        q = batch_features / jnp.maximum(
            jnp.linalg.norm(batch_features, axis=-1, keepdims=True), 1e-12)
        k = self.memory_bank_keys / jnp.maximum(
            jnp.linalg.norm(self.memory_bank_keys, axis=-1, keepdims=True),
            1e-12)
        cos = q @ k.T                                    # (N, size)
        weights, idx = jax.lax.top_k(cos, bc.memory_bank_topk)   # (N, k)
        weights = weights / jnp.maximum(
            jnp.sum(jnp.abs(weights), -1, keepdims=True), 1e-12)
        picked = self.memory_bank[idx]                   # (N, k, dim)
        out = jnp.sum(weights[..., None] * picked, 1)    # (N, dim)
        batch_mean = out.mean(0)
        aux = {"weights": weights, "pick_idx": idx}
        return batch_mean, out, aux

    def init_all(self, grid, v_cap, f_cap, feats=None):
        if feats is None:
            feats = jnp.zeros((1, self.bank_cfg.memory_bank_dim))
        mesh, sdf = self.get_prior_mesh(grid, v_cap, f_cap,
                                        feats=feats)
        _ = self.dino_field(jnp.zeros((1, 1, 3)),
                            feats=jnp.zeros((1, self.bank_cfg.memory_bank_dim)))
        _ = self.retrieve_memory_bank(
            jnp.zeros((1, self.bank_cfg.memory_bank_keys_dim)))
        return mesh, sdf
