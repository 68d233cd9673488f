"""Base predictor: category prior shape (SDF + DMTet) and DINO feature field.

Reference: `BasePredictorBase` (`/root/reference/model/predictors/BasePredictorBase.py:44-70`)
wrapping `DMTetGeometry` (`model/geometry/dmtet.py:175-310`). Functional here:
the flax module owns the SDF / DINO MLPs; the tet grid is passed in as a
device pytree and marching tets is the static-shape op in `ops.dmtet`.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from animals3d_tpu.geometry.mesh import Mesh, make_mesh
from animals3d_tpu.geometry.tets import DeviceTetGrid
from animals3d_tpu.networks.mlp import CoordMLP, CoordMLPMod
from animals3d_tpu.ops import dmtet
from animals3d_tpu.predictors.config import BasePredictorConfig


class BasePredictor(nn.Module):
    cfg: BasePredictorConfig
    condition_choice: Optional[str] = None     # None | 'mod' (Fauna bank)

    @property
    def dino_extra_feat_dim(self) -> int:
        """Conditioning dim of the DINO field (bank dim for Fauna)."""
        return 0

    def setup(self):
        shape = self.cfg.cfg_shape
        scalar = 2 * np.pi / shape.spatial_scale * 0.9
        if self.condition_choice == "mod":
            self.netSDF = CoordMLPMod(
                3, 1, shape.num_layers, nf=shape.hidden_size, activation=None,
                min_max=None, n_harmonic_functions=shape.embedder_freq,
                embedder_scalar=scalar,
                embed_concat_pts=shape.embed_concat_pts, condition_dim=128,
                name="netSDF")
        else:
            self.netSDF = CoordMLP(
                3, 1, shape.num_layers, nf=shape.hidden_size, activation=None,
                min_max=None, n_harmonic_functions=shape.embedder_freq,
                embedder_scalar=scalar,
                embed_concat_pts=shape.embed_concat_pts, name="netSDF")

        dino = self.cfg.cfg_dino
        self.netDINO = CoordMLP(
            3, dino.feature_dim, dino.num_layers, nf=dino.hidden_size,
            activation=dino.activation,
            min_max=(tuple(dino.minmax),) * dino.feature_dim,
            n_harmonic_functions=dino.embedder_freq, embedder_scalar=scalar,
            embed_concat_pts=dino.embed_concat_pts,
            extra_feat_dim=self.dino_extra_feat_dim,
            symmetrize=dino.symmetrize, name="netDINO")

    # ---- SDF field --------------------------------------------------------
    def get_sdf(self, pts, feats=None):
        """SDF with x-mirror symmetrization and analytic init bias
        (`dmtet.py:228-255`)."""
        shape = self.cfg.cfg_shape
        if shape.symmetrize:
            pts_in = jnp.concatenate([jnp.abs(pts[..., :1]), pts[..., 1:]], -1)
        else:
            pts_in = pts
        if self.condition_choice == "mod":
            sdf = self.netSDF(pts_in, feats)
        else:
            sdf = self.netSDF(pts_in)

        init = shape.init_sdf
        if init is None:
            pass
        elif isinstance(init, (int, float)):
            sdf = sdf + init
        elif init == "sphere":
            r = shape.spatial_scale * 0.25
            sdf = sdf + (r - jnp.linalg.norm(pts, axis=-1, keepdims=True))
        elif init == "ellipsoid":
            r = shape.spatial_scale * 0.15
            scaled = jnp.concatenate([pts[..., :2], pts[..., 2:] / 2], -1)
            sdf = sdf + (r - jnp.linalg.norm(scaled, axis=-1, keepdims=True))
        else:
            raise NotImplementedError(init)
        return sdf

    def dino_field(self, pts, feats=None):
        return self.netDINO(pts, feats)

    # ---- fused lattice sweep ---------------------------------------------
    def _use_fused_sweep(self, training: bool = False) -> bool:
        """Gate for the fused Pallas netSDF sweep (`ops.fused_mlp`): the
        unconditional 256-wide CoordMLP only (MagicPony/Ponymation prior;
        Fauna's mod-demod conditional SDF keeps the flax path), and never
        during init (params must be created by the flax modules).

        DEFAULT: ON for TRAINING (jittered sweeps), OFF for eval/recon.
        Verdict history (PERF_NOTES session 9): the first interleaved
        device A/Bs read recon +3.5% / train +3.9% and the kernel was
        default-off — but A/A forensics then exposed two harness biases
        (input-buffer placement ~+2.6% on recon arms; donated-STATE
        placement +10.6-10.9% on train arms). On the debiased harness the
        fused TRAIN path measures **−4.5% (447.1 → 426.9 ms/step b10,
        ~−20 ms — the custom-VJP recompute keeps the 5× (N,256) autodiff
        residuals out of HBM)**, while recon stays ~neutral (+~1%
        bias-corrected; the fwd-only graph has no residuals to save), so
        eval keeps the flax sweep. A3D_FUSED_SDF=0 forces off everywhere,
        =1 forces on everywhere (both trace-time)."""
        import os
        lever = os.environ.get("A3D_FUSED_SDF")
        if lever == "0":
            return False
        shape = self.cfg.cfg_shape
        return ((training or lever == "1")
                and self.condition_choice != "mod"
                and not self.is_initializing()
                and shape.num_layers >= 2
                and shape.hidden_size == 256)

    def _fused_sdf_sweep(self, pos):
        """`get_sdf(pos)[..., 0]` with the MLP trunk evaluated by the fused
        Pallas kernel — same symmetrize / harmonic-embed / init-bias math
        (`dmtet.py:228-255`), activations never written to HBM."""
        from animals3d_tpu.networks.mlp import harmonic_embedding
        from animals3d_tpu.ops import fused_mlp
        shape = self.cfg.cfg_shape
        pts_in = jnp.concatenate(
            [jnp.abs(pos[..., :1]), pos[..., 1:]], -1) \
            if shape.symmetrize else pos
        if shape.embedder_freq > 0:
            scalar = 2 * np.pi / shape.spatial_scale * 0.9
            e = harmonic_embedding(pts_in, shape.embedder_freq, scalar)
            if shape.embed_concat_pts:
                e = jnp.concatenate([pts_in, e], -1)
        else:
            e = pts_in
        params = self.variables["params"]["netSDF"]
        if not fused_mlp.coordmlp_sweep_params_ok(params, shape.num_layers):
            return self.get_sdf(pos)[..., 0]
        sdf = fused_mlp.mlp_sweep(params, e, num_layers=shape.num_layers)

        init = shape.init_sdf
        if init is None:
            pass
        elif isinstance(init, (int, float)):
            sdf = sdf + init
        elif init == "sphere":
            sdf = sdf + (shape.spatial_scale * 0.25
                         - jnp.linalg.norm(pos, axis=-1))
        elif init == "ellipsoid":
            scaled = jnp.concatenate([pos[..., :2], pos[..., 2:] / 2], -1)
            sdf = sdf + (shape.spatial_scale * 0.15
                         - jnp.linalg.norm(scaled, axis=-1))
        else:
            raise NotImplementedError(init)
        return sdf

    # ---- prior mesh -------------------------------------------------------
    def get_prior_mesh(self, grid: DeviceTetGrid, v_cap: int, f_cap: int,
                       total_iter=0, jitter_rng=None, feats=None):
        """getMesh (`dmtet.py:294-310`): optional global grid jitter →
        SDF over the grid → marching tets → batched Mesh (batch 1).
        Returns (mesh, sdf) — sdf is reused by the regularizers."""
        shape = self.cfg.cfg_shape
        pos = grid.verts * shape.spatial_scale
        if jitter_rng is not None and shape.jitter_grid > 0:
            jitter = (jax.random.uniform(jitter_rng, ()) * 2 - 1) \
                * shape.jitter_grid * shape.spatial_scale
            pos = pos + jitter
        if (shape.sparse_band_eval and grid.is_lattice
                and grid.res % 2 == 0 and grid.res >= 64):
            # band-sparse MLP sweep: exact values near the surface, coarse
            # interpolation elsewhere (`ops.dmtet.sdf_lattice_banded`)
            # A3D_BAND_REMAT=0: trace-time bisect lever — run the banded
            # sweep without jax.checkpoint (the cond-less residual set is
            # ~5x smaller than the dense sweep's, so it can fit; used to
            # separate remat-related device faults from the band itself)
            import os
            _v = os.environ.get("A3D_BAND_REMAT")
            if _v not in (None, "0", "1"):
                # a mis-set lever mislabels a device-fault bisect arm and
                # wastes a TPU run — fail loudly instead of guessing
                raise ValueError(
                    f"A3D_BAND_REMAT={_v!r}: must be '0', '1', or unset")
            remat = (not self.is_initializing() and _v != "0")
            if _v is not None and not self.is_initializing():
                # self-identify the bisect arm at trace time
                print(f"[banded-sweep] remat={'on' if remat else 'OFF'} "
                      f"(A3D_BAND_REMAT={_v})", flush=True)
            sdf, _ = dmtet.sdf_lattice_banded(
                lambda p: self.get_sdf(p, feats=feats)[..., 0],
                pos, grid.res, band_tau=shape.band_tau,
                seg_cap=shape.band_seg_cap,
                remat=remat)
        elif self._use_fused_sweep(training=jitter_rng is not None):
            sdf = self._fused_sdf_sweep(pos)
        else:
            sdf = self.get_sdf(pos, feats=feats)[..., 0]
        out = dmtet.marching_tets(pos, sdf, grid, v_cap, f_cap)
        mesh = make_mesh(out.verts[None], out.faces, out.v_valid, out.f_valid,
                         out.num_verts, out.num_faces, face_gidx=out.face_gidx)
        return mesh, sdf

    def __call__(self, grid: DeviceTetGrid, v_cap: int, f_cap: int,
                 total_iter=0, jitter_rng=None, feats=None):
        return self.get_prior_mesh(grid, v_cap, f_cap, total_iter=total_iter,
                                   jitter_rng=jitter_rng, feats=feats)

    def init_all(self, grid: DeviceTetGrid, v_cap: int, f_cap: int,
                 feats=None):
        """Touch every submodule so `model.init` creates all parameters."""
        mesh, sdf = self.get_prior_mesh(grid, v_cap, f_cap, feats=feats)
        _ = self.dino_field(jnp.zeros((1, 1, 3)))
        return mesh, sdf

    # ---- regularizers -----------------------------------------------------
    def sdf_reg_losses(self, grid: DeviceTetGrid, sdf, mesh: Mesh, rng,
                       feats=None):
        """BCE edge consistency + eikonal penalty on 5000 random + 5000
        near-surface points (`dmtet.py:256-281`, `get_sdf_reg_loss`)."""
        shape = self.cfg.cfg_shape
        bce = dmtet.sdf_bce_for_grid(sdf, grid)

        k1, k2, k3 = jax.random.split(rng, 3)
        n = 5000
        rand_pts = (jax.random.uniform(k1, (n, 3)) - 0.5) * shape.spatial_scale
        v_cap = mesh.v_pos.shape[1]
        # sample valid surface verts: the vertex buffer is compacted, so
        # uniform indices below num_verts are all valid
        hi = jnp.maximum(mesh.num_verts, 1)
        idx = jax.random.randint(k2, (n,), 0, hi)
        surf = jax.lax.stop_gradient(mesh.v_pos[0])[jnp.clip(idx, 0, v_cap - 1)]
        surf = surf + (jax.random.uniform(k3, (n, 3)) - 0.5) \
            * 0.1 * shape.spatial_scale
        pts = jnp.concatenate([rand_pts, surf], 0)

        def sdf_at(p):
            return self.get_sdf(p[None], feats=feats)[0, 0]

        grads = jax.vmap(jax.grad(sdf_at))(pts)
        eikonal = jnp.mean((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)
        return {"sdf_bce_reg_loss": bce, "sdf_gradient_reg_loss": eikonal}
