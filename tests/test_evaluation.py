"""PCK keypoint-transfer evaluation tests on synthetic geometry."""
import numpy as np

from animals3d_tpu import evaluation as ev


def _make_pred(rng, V=50, occlude=None):
    uv = rng.uniform(-0.9, 0.9, (V, 2)).astype(np.float32)
    occ = np.zeros(V, bool)
    if occlude is not None:
        occ[occlude] = True
    return {"uv": uv, "occluded": occ, "stem": "x"}


def test_perfect_transfer_gives_pck_1():
    rng = np.random.default_rng(0)
    # identical images: source uv == target uv, keypoints on vertices
    pred = _make_pred(rng)
    kp = np.concatenate([pred["uv"][:10],
                         np.ones((10, 1), np.float32)], -1)
    out = ev.evaluate_pairs([pred, pred], [kp, kp], [(0, 1)])
    assert out["pck"] == 1.0
    assert out["mean_error"] < 1e-6


def test_shifted_target_measures_error():
    rng = np.random.default_rng(1)
    src = _make_pred(rng)
    tgt = {"uv": src["uv"] + 0.5, "occluded": src["occluded"], "stem": "y"}
    kp_src = np.concatenate([src["uv"][:10], np.ones((10, 1), np.float32)], -1)
    kp_tgt = kp_src.copy()   # target keypoints NOT shifted → error = 0.5
    out = ev.evaluate_pairs([src, tgt], [kp_src, kp_tgt], [(0, 1)])
    # error 0.5*sqrt(2)/2 (per-axis 0.5 shift, normalized by box 2.0)
    assert out["pck"] == 0.0
    np.testing.assert_allclose(out["mean_error"], 0.5 * np.sqrt(2) / 2,
                               rtol=1e-5)


def test_occluded_vertices_skipped():
    rng = np.random.default_rng(2)
    pred = _make_pred(rng, occlude=np.arange(25))
    kp = np.concatenate([pred["uv"][:10], np.ones((10, 1), np.float32)], -1)
    vid = ev.nearest_visible_vertex(kp[:, :2], pred)
    assert (vid >= 25).all()   # occluded vertices never selected


def test_pck_threshold():
    errors = np.array([0.05, 0.09, 0.11, 0.5])
    valid = np.ones(4, bool)
    assert ev.compute_pck(errors, valid, 0.1) == 0.5
