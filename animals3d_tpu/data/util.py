"""Dataset utilities (torch-free numpy/cv2/PIL).

Reference: `/root/reference/model/dataset/util.py`. File-format conventions
preserved exactly:
  * samples are `<stem>rgb.jpg` with siblings `<stem>mask.png`,
    `<stem>box.txt` (8 numbers: frame_id x0 y0 w h full_w full_h sharpness),
    `<stem>feat<D>.png` (packed-PNG DINO features), `<stem>flow.png`;
  * distance transforms via cv2 L2 DIST_MASK_PRECISE (`util.py:12-18`);
  * DINO features packed 3-channels-per-tile horizontally (`util.py:58-74`);
  * crop-boundary validity mask from the box geometry (`util.py:94-105`).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

try:
    import cv2
except ImportError:          # pragma: no cover
    cv2 = None


def load_image(path, size, mode="RGB", resample=Image.BILINEAR):
    img = Image.open(path).convert(mode)
    if img.size != (size, size):
        img = img.resize((size, size), resample)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    return arr                                    # (C, H, W)


def crop_image(path, boxs, size) -> np.ndarray:
    """Crop per-frame boxes [x0, y0, w, h] out of one full-frame image and
    resize each crop to (size, size) → (F, 3, size, size) float in [0, 1].

    Reference `util.py:21-28` (torchvision `resized_crop` per box, bilinear);
    used to cut the shared `background_frame.jpg` to each sample's crop
    window (`ImageDataset.py:65-69`, `SequenceDataset.py:136-140`)."""
    img = Image.open(path).convert("RGB")
    out = []
    for x0, y0, w, h in np.asarray(boxs, np.int64):
        crop = img.crop((x0, y0, x0 + w, y0 + h)) \
            .resize((size, size), Image.BILINEAR)
        out.append(np.asarray(crop, np.float32).transpose(2, 0, 1) / 255.0)
    return np.stack(out)


def compute_distance_transform(mask: np.ndarray) -> np.ndarray:
    """(1, H, W) binary → (2, H, W): [dt(mask), dt(1-mask)]."""
    from animals3d_tpu import native
    out = native.mask_distance_transform(mask)
    if out is not None:
        return out
    m = (mask[0] > 0.5).astype(np.uint8)
    if cv2 is not None:
        dt = cv2.distanceTransform(m, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
        inv = cv2.distanceTransform(1 - m, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    else:                                          # scipy fallback
        from scipy.ndimage import distance_transform_edt
        dt = distance_transform_edt(m)
        inv = distance_transform_edt(1 - m)
    return np.stack([dt, inv], 0).astype(np.float32)


def box_loader(fpath) -> np.ndarray:
    try:
        box = np.loadtxt(fpath, dtype=str)
        box[0] = box[0].split("_")[0]
        return box[:8].astype(np.float32)
    except (FileNotFoundError, OSError):
        # default box: every pixel valid
        return np.array([0, 100, 100, 512, 512, 1920, 1080, 0], np.float32)


def decode_feat_from_img(img: np.ndarray, n_channels: int) -> np.ndarray:
    """Packed-PNG feature decode (`util.py:63-70`): tiles of 3 channels laid
    out horizontally."""
    n_addon = int(np.ceil(n_channels / 3) * 3) - n_channels
    n_tiles = (n_channels + n_addon) // 3
    h, tw, c = img.shape
    w = tw // n_tiles
    feat = img.reshape(h, n_tiles, w, c).transpose(0, 2, 1, 3) \
        .reshape(h, w, n_tiles * c)
    if n_addon:
        feat = feat[:, :, :-n_addon]
    return (feat.astype(np.float32) / 255.0).transpose(2, 0, 1)   # (C,H,W)


def dino_loader(fpath, n_channels: int) -> np.ndarray:
    img = np.asarray(Image.open(fpath))
    from animals3d_tpu import native
    out = native.decode_packed_feat(img, n_channels)
    if out is not None:
        return out
    return decode_feat_from_img(img, n_channels)


def flow_loader(fpath) -> np.ndarray:
    """16-bit flow png → (2, H, W) in [-1, 1].

    Matches the reference exactly (`SequenceDataset.py:75,94-100`):
    `cv2.imread(..., IMREAD_UNCHANGED)` (BGR, 16-bit preserved) →
    channel flip to RGB → first two channels → /65535*2-1. PIL cannot be
    used here: it silently downconverts 16-bit RGB pngs to 8-bit."""
    import cv2
    arr = cv2.imread(fpath, cv2.IMREAD_UNCHANGED)
    if arr is None:
        raise FileNotFoundError(fpath)
    arr = arr.astype(np.float32)[..., ::-1]       # BGR -> RGB (flip(2))
    flow = arr[..., :2] / 65535.0 * 2 - 1
    return np.ascontiguousarray(flow.transpose(2, 0, 1))


def get_valid_mask(box: np.ndarray, image_size: int) -> np.ndarray:
    """Pixels of the crop that land inside the full frame, minus a 2% margin
    (`util.py:94-105`). box: (8,) floats."""
    x0, y0, cw, ch, fw, fh = box[1:7].astype(np.int64)
    mh = int(ch * 0.02)
    mw = int(cw * 0.02)
    ys = (np.arange(image_size) + 0.5) / image_size * ch + y0
    xs = (np.arange(image_size) + 0.5) / image_size * cw + x0
    vy = (ys >= mh) & (ys < fh - mh)
    vx = (xs >= mw) & (xs < fw - mw)
    return (vy[:, None] & vx[None, :]).astype(np.float32)


def horizontal_flip_box(box: np.ndarray) -> np.ndarray:
    box = box.copy()
    box[..., 1] = box[..., 5] - box[..., 1] - box[..., 3]
    return box
