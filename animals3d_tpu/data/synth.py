"""Synthetic tiny dataset writer — for tests, verification, and benchmarks.

Writes the reference's on-disk format (`<stem>rgb.jpg` + `mask.png` +
`box.txt` + `feat<D>.png`) with procedurally generated blob silhouettes, so
the full data pipeline and training loop run without the real downloads.

Usage: `python -m animals3d_tpu.data.synth <out_dir> [--n 8] [--size 256]
[--dino-dim 16] [--sequences 0]`.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _write_sample(stem: str, size: int, dino_dim: int, rng):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    cx, cy = rng.uniform(0.35, 0.65, 2)
    rx, ry = rng.uniform(0.15, 0.3, 2)
    mask = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < 1.0
    color = rng.uniform(0.3, 0.9, 3)
    img = np.ones((size, size, 3), np.float32) * 0.1
    img[mask] = color + rng.normal(0, 0.05, (int(mask.sum()), 3))
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)) \
        .save(stem + "rgb.jpg")
    Image.fromarray((mask * 255).astype(np.uint8)).save(stem + "mask.png")
    np.savetxt(stem + "box.txt",
               np.array([[0, 100, 100, 512, 512, 1920, 1080, 10.0]]), fmt="%s")
    # packed DINO features: tiles of 3 channels horizontally
    n_tiles = -(-dino_dim // 3)
    feat = rng.uniform(0, 255, (size // 4, n_tiles * (size // 4), 3)) \
        .astype(np.uint8)
    Image.fromarray(feat).save(stem + f"feat{dino_dim}.png")


def _write_background(dir_path: str, rng):
    """Shared full-frame background (crop boxes reach 100+512 px)."""
    full = rng.uniform(0.05, 0.25, (640, 640, 3)).astype(np.float32)
    full += np.linspace(0, 0.3, 640)[None, :, None]
    Image.fromarray((np.clip(full, 0, 1) * 255).astype(np.uint8)) \
        .save(os.path.join(dir_path, "background_frame.jpg"))


def _write_flow(stem: str, size: int, rng):
    """16-bit RGB flow png, u/v in channels 0-1, near-zero motion — the
    format `util.flow_loader` decodes (`SequenceDataset.py:94-100`)."""
    import cv2
    flow = (rng.uniform(0.48, 0.52, (size, size, 3)) * 65535).astype(np.uint16)
    # cv2 writes BGR; flow_loader reads RGB channels 0-1 — symmetric noise
    # here so the order is irrelevant
    cv2.imwrite(stem + "flow.png", flow)


def write_synth_dataset(out_dir: str, n: int = 8, size: int = 256,
                        dino_dim: int = 16, sequences: int = 0,
                        frames: int = 10, seed: int = 0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    if sequences:
        for s in range(sequences):
            d = os.path.join(out_dir, f"seq{s:03d}")
            os.makedirs(d, exist_ok=True)
            for f in range(frames):
                stem = os.path.join(d, f"{f:06d}_")
                _write_sample(stem, size, dino_dim, rng)
                _write_flow(stem, size, rng)
            _write_background(d, rng)
    else:
        for i in range(n):
            _write_sample(os.path.join(out_dir, f"{i:06d}_"), size, dino_dim,
                          rng)
        _write_background(out_dir, rng)
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dino-dim", type=int, default=16)
    ap.add_argument("--sequences", type=int, default=0)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()
    write_synth_dataset(args.out_dir, args.n, args.size, args.dino_dim,
                        args.sequences, args.frames)
    print(f"wrote synthetic dataset to {args.out_dir}")
