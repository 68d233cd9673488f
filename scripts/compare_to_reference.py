"""One-command bit-compatibility gate vs the reference implementation.

Given a reference checkpoint (`.pth`) and a tet-grid npz, this script:

1. converts the checkpoint with `animals3d_tpu.convert.convert_checkpoint`,
2. extracts the prior mesh with our marching-tets pipeline AND with the
   *reference's own* `DMTetGeometry` (torch-cpu, imported from the mounted
   reference tree with its CUDA device pins patched to cpu) on the SAME grid
   and weights, and reports vertex max-error / face parity,
3. renders input views with our renderer, dumps PNGs/OBJs, and — when a
   directory of reference-rendered dumps is supplied (`--ref-dump`, files
   `<i>_rgb.png` + `<i>_mask.png`) — reports PSNR and mask-IoU.

No checkpoint? `--random-weights` instantiates the reference netBase with
random init and runs the mesh/DINO parity legs anyway, so the gate is
executable before artifacts land. No npz? The procedural Kuhn lattice is
exported to the reference's `{res}_tets.npz` format and both sides consume
that same file.

Reference call stacks exercised: `DMTetGeometry.getMesh`
(`/root/reference/model/geometry/dmtet.py:296-310`), checkpoint layout
(`/root/reference/model/models/AnimalModel.py` save/load).

Usage:
  python scripts/compare_to_reference.py --config train_magicpony_horse \
      [--checkpoint path.pth] [--tets data/tets/64_tets.npz] \
      [--ref-dump dir] [--random-weights] --out /tmp/compare_out

CPU quick self-check (~2 min; grid 256 takes tens of minutes on CPU):
  python scripts/compare_to_reference.py --random-weights --cpu --views 2 \
      --override model.cfg_predictor_base.cfg_shape.grid_res=32 \
      --override model.cfg_predictor_base.cfg_shape.grid_res_coarse=32 \
      --out /tmp/cmp   # last run: vert_max_err 2.4e-7, faces_identical true
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# Reference import shims (torch-cpu): stub GPU/IO-only deps, patch the
# hard-coded `device='cuda'` pins in DMTet/DMTetGeometry.
# ---------------------------------------------------------------------------

def _stub(name):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return sys.modules[name]


def import_reference_dmtet(tets_npz: str):
    """Import `model.geometry.dmtet` from the reference tree, runnable on
    cpu, with `load_tets` reading `tets_npz`. Returns the module."""
    for name in ("torchvision", "torchvision.models", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.utils",
                 "imageio", "tqdm"):
        mod = _stub(name)
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(sys.modules[parent], child, mod)
    sys.modules["tqdm"].tqdm = lambda x, *a, **k: x
    oc = _stub("omegaconf")
    oce = _stub("omegaconf.errors")
    if not hasattr(oce, "ConfigAttributeError"):
        oce.ConfigAttributeError = type("ConfigAttributeError",
                                        (AttributeError,), {})
    oc.errors = oce
    nv = _stub("nvdiffrast")
    nv_torch = _stub("nvdiffrast.torch")
    nv.torch = nv_torch

    if "model" not in sys.modules:
        pkg = types.ModuleType("model")
        pkg.__path__ = [os.path.join(REF_ROOT, "model")]
        sys.modules["model"] = pkg
    # material → utils.misc → render.obj must be imported before render.mesh
    # pulls in obj (which imports material mid-definition): starting at
    # material breaks the cycle at a point where every partial module is
    # only referenced attribute-style.
    importlib.import_module("model.render.material")
    dm = importlib.import_module("model.geometry.dmtet")

    import torch

    orig_dmtet_init = dm.DMTet.__init__

    def dmtet_init(self, device=None):
        orig_dmtet_init(self, device="cpu")

    dm.DMTet.__init__ = dmtet_init

    def load_tets(self, grid_res=None, scale=None):
        if grid_res is not None:
            self.grid_res = grid_res
        if scale is not None:
            self.grid_scale = scale
        tets = np.load(tets_npz)
        self.verts = torch.tensor(tets["vertices"], dtype=torch.float32) \
            * self.grid_scale
        self.indices = torch.tensor(np.asarray(tets["indices"], np.int64))
        edges = torch.tensor([0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3],
                             dtype=torch.long)
        all_edges = self.indices[:, edges].reshape(-1, 2)
        self.all_edges = torch.unique(torch.sort(all_edges, dim=1)[0], dim=0)

    dm.DMTetGeometry.load_tets = load_tets
    return dm


# ---------------------------------------------------------------------------


def build_model(config_name, overrides):
    from animals3d_tpu import config as cfglib
    from animals3d_tpu.models import build_model as _bm
    from animals3d_tpu.precision import set_mixed_precision
    cfg = cfglib.load_config(config_name, overrides=overrides or [])
    set_mixed_precision(None)          # parity runs in full f32
    model_cfg = dict(cfg["model"])
    model_cfg["dataset"] = cfg["dataset"]
    return _bm(model_cfg), cfg


def ensure_tets_npz(path, res, out_dir):
    """Return a reference-format `{res}_tets.npz` path, exporting the
    procedural lattice when no artifact is given."""
    if path:
        return path, int(np.load(path)["vertices"].shape[0])
    from animals3d_tpu.geometry import tets as tetlib
    grid = tetlib.load_tet_grid(res, data_dir=os.path.join(out_dir, "tets"))
    out = os.path.join(out_dir, f"{res}_tets.npz")
    np.savez(out, vertices=np.asarray(grid.verts, np.float32),
             indices=np.asarray(grid.tets, np.int64))
    return out, grid.verts.shape[0]


def reference_netbase_sd(dm, shape_cfg, dino_cfg, checkpoint_sd, rng_seed=0):
    """Reference netBase state dict: from the checkpoint when given, else a
    random-init `DMTetGeometry` + `CoordMLP` netDINO (same construction as
    `BasePredictorBase.__init__`)."""
    import torch
    torch.manual_seed(rng_seed)
    geom = dm.DMTetGeometry(
        grid_res=shape_cfg.grid_res, spatial_scale=shape_cfg.spatial_scale,
        num_layers=shape_cfg.num_layers, hidden_size=shape_cfg.hidden_size,
        embedder_freq=shape_cfg.embedder_freq,
        embed_concat_pts=shape_cfg.embed_concat_pts,
        init_sdf=shape_cfg.init_sdf, jitter_grid=shape_cfg.jitter_grid,
        symmetrize=shape_cfg.symmetrize)
    embedder_scalar = 2 * np.pi / shape_cfg.spatial_scale * 0.9
    netDINO = dm.CoordMLP(
        3, dino_cfg.feature_dim, dino_cfg.num_layers,
        nf=dino_cfg.hidden_size, dropout=0,
        activation=dino_cfg.activation,
        min_max=torch.FloatTensor(list(dino_cfg.minmax))
        .repeat(dino_cfg.feature_dim, 1),
        n_harmonic_functions=dino_cfg.embedder_freq,
        embedder_scalar=embedder_scalar,
        embed_concat_pts=dino_cfg.embed_concat_pts,
        extra_feat_dim=0, symmetrize=dino_cfg.symmetrize)
    if checkpoint_sd is not None:
        sd = checkpoint_sd
        geom_sd = {k[len("netShape."):]: torch.tensor(v)
                   for k, v in sd.items() if k.startswith("netShape.")}
        geom.load_state_dict(geom_sd, strict=False)
        dino_sd = {k[len("netDINO."):]: torch.tensor(v)
                   for k, v in sd.items() if k.startswith("netDINO.")}
        netDINO.load_state_dict(dino_sd, strict=False)
    else:
        sd = {}
        sd.update({"netShape." + k: v.detach().numpy()
                   for k, v in geom.state_dict().items()})
        sd.update({"netDINO." + k: v.detach().numpy()
                   for k, v in netDINO.state_dict().items()})
    return geom, netDINO, sd


def mesh_parity_leg(model, params, tets_npz, checkpoint_sd, out_dir):
    """Extract the prior mesh with both pipelines on the same grid+weights."""
    import jax
    import torch

    from animals3d_tpu.geometry import tets as tetlib

    dm = import_reference_dmtet(tets_npz)
    base_cfg = model.cfg_predictor_base
    geom, netDINO, sd = reference_netbase_sd(
        dm, base_cfg.cfg_shape, base_cfg.cfg_dino, checkpoint_sd)

    if params is None:       # random-weights mode: convert the torch sd
        from animals3d_tpu import convert
        params = {"netBase": convert.convert_net_base(sd, model)}

    # --- reference extraction (no jitter, cpu) ---
    import time
    with torch.no_grad():
        ref_sdf = geom.get_sdf(geom.verts)
        t0 = time.time()
        verts_r, faces_r, _uvs, _uvidx = dm.DMTet()(
            geom.verts, ref_sdf, geom.indices)
        t_ref = time.time() - t0
        ref_dino = netDINO(verts_r)
    verts_r = verts_r.numpy()
    faces_r = faces_r.numpy()

    # --- our extraction on the same npz grid ---
    data = np.load(tets_npz)
    grid = tetlib.TetGrid(verts=np.asarray(data["vertices"], np.float32),
                          tets=np.asarray(data["indices"], np.int32),
                          res=base_cfg.cfg_shape.grid_res, is_lattice=False)
    dgrid = tetlib.DeviceTetGrid(grid)
    v_cap = max(2 * len(verts_r), 1024)
    f_cap = max(2 * len(faces_r), 2048)

    def extract(p):
        return model.netBase.apply({"params": p["netBase"]}, dgrid,
                                   v_cap, f_cap, 0, None)

    extract_jit = jax.jit(extract)
    mesh, our_sdf = extract_jit(params)           # compile + run
    jax.block_until_ready(mesh.v_pos)
    t0 = time.time()
    mesh, our_sdf = extract_jit(params)
    jax.block_until_ready(mesh.v_pos)
    t_ours = time.time() - t0
    nv = int(mesh.num_verts)
    nf = int(mesh.num_faces)
    verts_o = np.asarray(mesh.v_pos[0])[:nv]
    faces_o = np.asarray(mesh.t_pos_idx)[:nf]

    report = {
        "ref_num_verts": int(len(verts_r)), "our_num_verts": nv,
        "ref_num_faces": int(len(faces_r)), "our_num_faces": nf,
        # same-host apples-to-apples: torch-cpu reference marching tets vs
        # our full jitted netBase (SDF MLP + marching tets) — ours includes
        # MORE work, so <= means strictly faster per extraction
        "ref_marching_tets_s": round(t_ref, 4),
        "our_sdf_plus_marching_tets_s": round(t_ours, 4),
    }
    if nv == len(verts_r):
        report["vert_max_err"] = float(np.abs(verts_o - verts_r).max())
        report["sdf_max_err"] = float(
            np.abs(np.asarray(our_sdf) - ref_sdf.numpy()[:, 0]).max())
        same_faces = (nf == len(faces_r)) and bool(
            (faces_o == faces_r).all())
        report["faces_identical"] = same_faces
        with torch.no_grad():
            our_dino = model.netBase.apply(
                {"params": params["netBase"]},
                np.asarray(verts_r, np.float32)[None],
                method="dino_field")
        report["dino_max_err"] = float(
            np.abs(np.asarray(our_dino)[0] - ref_dino.numpy()).max())
    _save_obj(os.path.join(out_dir, "ours_prior.obj"), verts_o, faces_o)
    _save_obj(os.path.join(out_dir, "reference_prior.obj"), verts_r, faces_r)
    return report, params


def _save_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")


def render_leg(model, params, out_dir, ref_dump, n_views, image_size):
    """Render turntable input views with the converted weights; compare to
    reference dumps when provided."""
    import jax
    import jax.numpy as jnp

    from animals3d_tpu.render.camera import perspective
    from animals3d_tpu.ops.shading import rgb_to_srgb
    from animals3d_tpu.visualization import orbit_cameras

    phase = model.phase_for_iter(10 ** 9, is_training=False)
    grid, v_cap, f_cap = model.grid_for_phase(phase)
    h = w = image_size

    prior_mesh, _sdf = jax.jit(
        lambda p: model.netBase.apply({"params": p["netBase"]}, grid,
                                      v_cap, f_cap, 0, None))(params)

    # canonical camera: z-offset lookat + config fov (same construction the
    # reference uses for its default/canonical views)
    pose_cfg = model.cfg_predictor_instance.cfg_pose
    z_off = pose_cfg.cam_pos_z_offset
    w2c0 = np.eye(4, dtype=np.float32)
    w2c0[2, 3] = -z_off
    proj = np.asarray(perspective(pose_cfg.fov / 180 * np.pi))
    mvp0 = (proj @ w2c0).astype(np.float32)
    campos0 = np.array([0, 0, z_off], np.float32)

    report = {"views": n_views}
    psnrs, ious = [], []
    try:
        import imageio.v2 as imageio
    except Exception:
        imageio = None
    for i in range(n_views):
        angle = 2 * np.pi * i / n_views
        mvp, w2c, campos = orbit_cameras(
            jnp.asarray(mvp0), jnp.asarray(w2c0), jnp.asarray(campos0),
            [float(angle)])
        renders = model.render(
            params, ["shaded"], prior_mesh, mvp[None],
            w2c[None], campos[None],
            (h, w), im_features=None, light_params=None,
            prior_mesh=prior_mesh, num_frames=1)
        shaded = np.asarray(renders["shaded"])[0, 0]
        rgb = np.clip(np.asarray(
            rgb_to_srgb(jnp.asarray(shaded[:3]))), 0, 1)
        mask = np.clip(shaded[3], 0, 1)
        if imageio is not None:
            imageio.imwrite(os.path.join(out_dir, f"{i}_rgb.png"),
                            (rgb.transpose(1, 2, 0) * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(out_dir, f"{i}_mask.png"),
                            (mask * 255).astype(np.uint8))
        if ref_dump:
            rp = os.path.join(ref_dump, f"{i}_rgb.png")
            mp = os.path.join(ref_dump, f"{i}_mask.png")
            if os.path.exists(rp) and imageio is not None:
                ref_rgb = np.asarray(imageio.imread(rp), np.float32) / 255.0
                mse = float(np.mean((rgb.transpose(1, 2, 0) - ref_rgb) ** 2))
                psnrs.append(-10 * np.log10(max(mse, 1e-10)))
            if os.path.exists(mp) and imageio is not None:
                ref_m = np.asarray(imageio.imread(mp), np.float32) / 255.0
                a = mask > 0.5
                b = ref_m > 0.5
                ious.append(float((a & b).sum() / max((a | b).sum(), 1)))
    if psnrs:
        report["psnr_mean"] = float(np.mean(psnrs))
    if ious:
        report["mask_iou_mean"] = float(np.mean(ious))
    return report


def capacity_leg(model, params):
    """Production-capacity extraction self-check (no reference side).

    Extracts the prior mesh at the CONFIG grid resolution with the
    production v_cap/f_cap (`geometry.tets.default_capacity` via
    `model.grid_for_phase`) on the procedural Kuhn lattice — with the
    dense AND the banded SDF sweep — and reports capacity occupancy and
    truncation. The reference's dynamic-shape extraction
    (`/root/reference/model/geometry/dmtet.py:296-310`) cannot truncate;
    our capacity-bounded one must prove it doesn't at real sizes. Run this
    for grids too big to hold both frameworks in RAM at once (the full
    parity leg at Kuhn-256 = ~101M tets OOMs a 125 GB box)."""
    import time

    import jax

    phase = model.phase_for_iter(10 ** 9, is_training=False)   # fine grid
    grid, v_cap, f_cap = model.grid_for_phase(phase)
    report = {"grid_res": int(grid.res), "v_cap": int(v_cap),
              "f_cap": int(f_cap),
              "n_grid_verts": int(grid.verts.shape[0]),
              # lattice grids carry no tet table (shift-based kernel)
              "n_tets": (int(grid.tets.shape[0]) if grid.tets is not None
                         else 6 * grid.res ** 3)}
    cfg_shape = model.netBase.cfg.cfg_shape        # frozen dataclass
    prev = cfg_shape.sparse_band_eval
    for name, band in (("dense", False), ("banded", True)):
        object.__setattr__(cfg_shape, "sparse_band_eval", band)
        try:
            t0 = time.time()
            mesh, _sdf = jax.jit(
                lambda p: model.netBase.apply(
                    {"params": p["netBase"]}, grid, v_cap, f_cap, 0, None)
            )(params)
            jax.block_until_ready(mesh.v_pos)
            nv, nf = int(mesh.num_verts), int(mesh.num_faces)
            report[name] = {
                "num_verts": nv, "num_faces": nf,
                "v_occupancy": round(nv / v_cap, 4),
                "f_occupancy": round(nf / f_cap, 4),
                "truncated": bool(nv >= v_cap or nf >= f_cap),
                "extract_s": round(time.time() - t0, 1),
            }
        finally:
            object.__setattr__(cfg_shape, "sparse_band_eval", prev)
    if "banded" in report and "dense" in report:
        report["banded_matches_dense"] = (
            report["banded"]["num_verts"] == report["dense"]["num_verts"]
            and report["banded"]["num_faces"] == report["dense"]["num_faces"])
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="train_magicpony_horse")
    ap.add_argument("--checkpoint", default=None, help="reference .pth")
    ap.add_argument("--tets", default=None, help="reference {res}_tets.npz")
    ap.add_argument("--ref-dump", default=None,
                    help="dir of reference-rendered <i>_rgb.png/<i>_mask.png")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--out", default="/tmp/compare_to_reference")
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--override", action="append", default=[])
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--ours-only", action="store_true",
                    help="production-capacity extraction self-check only "
                         "(no reference side; for grids whose dual-"
                         "framework parity leg exceeds RAM)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (parity needs no TPU)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    if not args.checkpoint and not args.random_weights:
        ap.error("need --checkpoint or --random-weights")

    model, _cfg = build_model(args.config, args.override)

    if args.ours_only:
        import jax
        rng = jax.random.PRNGKey(0)
        params = model.init_params(rng)
        report = {"config": args.config, "mode": "ours_only_capacity",
                  "capacity": capacity_leg(model, params)}
        with open(os.path.join(args.out, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        return

    res = model.cfg_predictor_base.cfg_shape.grid_res
    tets_npz, n_grid_verts = ensure_tets_npz(args.tets, res, args.out)

    checkpoint_sd = None
    params = None
    if args.checkpoint:
        from animals3d_tpu import convert
        cp = convert.load_torch_state_dict(args.checkpoint)
        checkpoint_sd = cp["netBase"]
        params = convert.convert_checkpoint(cp, model)

    report = {"config": args.config, "tets": tets_npz,
              "grid_verts": n_grid_verts,
              "checkpoint": args.checkpoint or "random"}
    mesh_report, params = mesh_parity_leg(
        model, params, tets_npz, checkpoint_sd, args.out)
    report["mesh"] = mesh_report

    if not args.skip_render and args.checkpoint:
        report["render"] = render_leg(model, params, args.out, args.ref_dump,
                                      args.views, args.image_size)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
