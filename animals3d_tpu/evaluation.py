"""Keypoint-transfer PCK evaluation.

Reference: `/root/reference/evaluation/evaluate.py` (625 LoC): the repo's
quantitative benchmark — sample image pairs, map each annotated source
keypoint to its nearest *visible* predicted 2D-projected mesh vertex,
transfer that vertex to the target image via the shared mesh topology, and
score PCK@0.1 (error normalized by bounding-box size,
`evaluate.py:234-237,389-398,461-472`).

Consumes the `_2d_projection_uv.txt` / `_binary_occlusion.txt` artifacts
written by `animals3d_tpu.visualization` with `evaluate_keypoint: true`,
plus keypoint annotation files (`<stem>keypoints.txt`: rows of x y visible
in image pixels, PASCAL/ACSM format).
"""
from __future__ import annotations

import os
from glob import glob

import numpy as np


def load_predictions(result_dir: str):
    """→ list of dicts with uv (V,2 in [-1,1]) and occlusion (V,) bool."""
    preds = []
    for uv_path in sorted(glob(os.path.join(result_dir,
                                            "*_2d_projection_uv.txt"))):
        occ_path = uv_path.replace("_2d_projection_uv.txt",
                                   "_binary_occlusion.txt")
        preds.append({
            "uv": np.loadtxt(uv_path, dtype=np.float32).reshape(-1, 2),
            "occluded": np.loadtxt(occ_path, dtype=np.float32)
            .reshape(-1).astype(bool),
            "stem": os.path.basename(uv_path)
            [:-len("_2d_projection_uv.txt")],
        })
    return preds


def nearest_visible_vertex(kp_uv: np.ndarray, pred: dict) -> np.ndarray:
    """For each keypoint (K, 2) in [-1,1], the nearest visible vertex id."""
    uv = pred["uv"]
    vis = ~pred["occluded"]
    big = 1e9
    d = np.linalg.norm(uv[None] - kp_uv[:, None], axis=-1)   # (K, V)
    d[:, ~vis] = big
    return d.argmin(1)


def transfer_keypoints(src_kp: np.ndarray, src_pred: dict,
                       tgt_pred: dict) -> tuple[np.ndarray, np.ndarray]:
    """Transfer source keypoints to the target image via shared topology
    (`evaluate.py:461-472`). Returns (transferred (K,2), valid (K,))."""
    vid = nearest_visible_vertex(src_kp, src_pred)
    transferred = tgt_pred["uv"][vid]
    valid = ~tgt_pred["occluded"][vid]
    return transferred, valid


def compute_pck(errors: np.ndarray, valid: np.ndarray,
                threshold: float = 0.1) -> float:
    """PCK: fraction of valid transfers with normalized error < threshold
    (`evaluate.py:234-237`)."""
    if valid.sum() == 0:
        return 0.0
    return float((errors[valid] < threshold).mean())


def evaluate_pairs(preds, keypoints, pairs, threshold=0.1,
                   box_size: float = 2.0):
    """Run keypoint transfer over (src, tgt) index pairs.

    keypoints: list of (K, 3) arrays [x, y, visible] in [-1,1] coords.
    box_size: normalization span (2.0 = the full [-1,1] crop, matching the
    reference's box-size normalization of the square crop).
    """
    errors, valids = [], []
    for s, t in pairs:
        kp_s, kp_t = keypoints[s], keypoints[t]
        both_vis = (kp_s[:, 2] > 0) & (kp_t[:, 2] > 0)
        trans, valid = transfer_keypoints(kp_s[:, :2], preds[s], preds[t])
        err = np.linalg.norm(trans - kp_t[:, :2], axis=-1) / box_size
        errors.append(err)
        valids.append(valid & both_vis)
    errors = np.concatenate(errors)
    valids = np.concatenate(valids)
    return {"pck": compute_pck(errors, valids, threshold),
            "mean_error": float(errors[valids].mean()) if valids.any() else 0.0,
            "num_pairs": len(pairs), "num_valid_kp": int(valids.sum())}


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--result-dir", required=True)
    ap.add_argument("--annotation-dir", required=True,
                    help="dir of <stem>_keypoints.txt files ([x y vis] rows)")
    ap.add_argument("--num-pairs", type=int, default=10000)
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    preds = load_predictions(args.result_dir)
    keypoints = []
    kept = []
    for p in preds:
        kp_path = os.path.join(args.annotation_dir,
                               p["stem"] + "_keypoints.txt")
        if os.path.exists(kp_path):
            keypoints.append(np.loadtxt(kp_path, dtype=np.float32)
                             .reshape(-1, 3))
            kept.append(p)
    preds = kept
    assert len(preds) >= 2, "need at least two annotated predictions"
    rng = np.random.default_rng(args.seed)
    pairs = rng.integers(0, len(preds), (args.num_pairs, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    out = evaluate_pairs(preds, keypoints, pairs.tolist(),
                         threshold=args.threshold)
    print(out)
    return out


if __name__ == "__main__":
    main()
