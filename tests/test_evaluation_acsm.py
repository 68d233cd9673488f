"""ACSM/PASCAL ingestion + reference pair-sampling: synthetic `.mat` fixture
with hand-computed PCK (`/root/reference/evaluation/evaluate.py:155-198,
369-458, 545-600`)."""
import os

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
import scipy.io as sio  # noqa: E402

from animals3d_tpu import evaluation  # noqa: E402


def _write_mat(path):
    def sample(rel_path, rec_id, bbox, parts):
        return {"rel_path": rel_path, "voc_rec_id": rec_id,
                "bbox": {"x1": bbox[0], "y1": bbox[1],
                         "x2": bbox[2], "y2": bbox[3]},
                "parts": np.asarray(parts, np.float64)}

    # 3 keypoints per image; parts rows are [x; y; visible]
    s1 = sample("img1.jpg", 1, (10.0, 20.0, 110.0, 120.0),
                [[30, 60, 90], [40, 70, 100], [1, 1, 1]])
    s2 = sample("img2.jpg", 2, (0.0, 0.0, 200.0, 100.0),
                [[50, 100, 150], [25, 50, 75], [1, 1, 0]])
    sio.savemat(path, {"images": np.array([s1, s2], dtype=object)})
    return {"img1_1": s1, "img2_2": s2}


def test_load_pascal_annotations(tmp_path):
    mat = os.path.join(tmp_path, "horse_val.mat")
    _write_mat(mat)
    parsed = evaluation.load_pascal_annotations(mat)
    assert set(parsed) == {"img1_1", "img2_2"}
    a = parsed["img1_1"]
    assert a["box"] == [10.0, 20.0, 100.0, 100.0]
    np.testing.assert_array_equal(a["kp"], [[30, 40], [60, 70], [90, 100]])
    np.testing.assert_array_equal(a["visible"], [1, 1, 1])


def test_crop_uncrop_roundtrip():
    kp = np.array([[30.0, 40.0], [90.0, 100.0]])
    box = [10.0, 20.0, 100.0, 100.0]
    crop = evaluation.crop_keypoints_with_box(kp, box)
    np.testing.assert_allclose(crop, [[-0.6, -0.6], [0.6, 0.6]])
    np.testing.assert_allclose(
        evaluation.uncrop_keypoints_with_box(crop, box), kp)


def test_sample_pair_is_seed_deterministic(tmp_path):
    mat = os.path.join(tmp_path, "horse_val.mat")
    _write_mat(mat)
    import random
    b = evaluation.AcsmBenchmark(mat, seed=7)
    want = random.Random(7).sample(["img1_1", "img2_2"], 2)
    assert list(b.sample_pair()) == want


def test_evaluate_acsm_hand_computed(tmp_path):
    """Perfect transfer for two keypoints, one 15%-of-box miss, one
    invisible → PCK@0.1 over valid kps = 2/3... with the miss counted."""
    mat = os.path.join(tmp_path, "horse_val.mat")
    _write_mat(mat)
    parsed = evaluation.load_pascal_annotations(mat)

    result_dir = tmp_path / "preds"
    result_dir.mkdir()
    V = 3
    for name, a in parsed.items():
        kp_crop = evaluation.crop_keypoints_with_box(a["kp"], a["box"])
        uv = np.asarray(kp_crop, np.float32)         # vertex i at keypoint i
        if name == "img2_2":
            # vertex 1 displaced by 0.3 crop units in x = 30 px = 0.15 box
            uv = uv.copy()
            uv[1, 0] += 0.3
        np.savetxt(result_dir / f"{name}_2d_projection_uv.txt", uv)
        np.savetxt(result_dir / f"{name}_binary_occlusion.txt",
                   np.zeros(V))
        # crop box file == pascal box (row: id x y w h W H sharpness)
        x, y, w, h = a["box"]
        np.savetxt(result_dir / f"{name}_box.txt",
                   [[0, x, y, w, h, 500, 500, 1]])

    out = evaluation.evaluate_acsm(
        str(result_dir), mat, n_pairs=20, threshold=0.1, seed=0)
    assert out["num_pairs"] == 20
    # every pair involves both images; kp2 of img2 is invisible so valid
    # kps per pair = 2 (kp0, kp1). Transfers are exact except when the
    # TARGET is img2_2, where kp1 lands 30 px off inside a 200-px box
    # (err 0.15 > 0.1). Expected PCK = mean over sampled pairs.
    import random
    hits = total = 0
    r = random.Random(0)
    for _ in range(20):
        src, tgt = r.sample(["img1_1", "img2_2"], 2)
        total += 2
        hits += 2 if tgt == "img1_1" else 1
    assert out["pck"] == pytest.approx(hits / total)
    assert out["num_valid_kp"] == total
