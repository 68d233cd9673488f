"""End-to-end bit-compatibility gate: `scripts/compare_to_reference.py`'s
mesh-parity leg against the reference's own `DMTetGeometry` (torch-cpu) with
shared random weights on a shared tet grid.

This is the executable form of the pretrained-checkpoint gate: when real
`.pth` artifacts land, the same code path (`--checkpoint`) produces the
vertex/face/DINO parity report. Reference stack exercised:
`DMTetGeometry.get_sdf` + `DMTet.__call__`
(`/root/reference/model/geometry/dmtet.py:228-310`).
"""
import os
import sys

import pytest

REF = "/root/reference/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_mesh_parity_random_weights(tmp_path):
    import compare_to_reference as cmp

    model, _cfg = cmp.build_model("train_magicpony_horse", [
        "model.cfg_predictor_base.cfg_shape.grid_res=12",
        "model.cfg_predictor_base.cfg_shape.grid_res_coarse=12",
    ])
    tets_npz, n = cmp.ensure_tets_npz(None, 12, str(tmp_path))
    assert n == 13 ** 3
    report, params = cmp.mesh_parity_leg(model, None, tets_npz, None,
                                         str(tmp_path))
    assert report["our_num_verts"] == report["ref_num_verts"] > 0
    assert report["our_num_faces"] == report["ref_num_faces"] > 0
    assert report["faces_identical"]
    assert report["vert_max_err"] < 1e-5
    assert report["sdf_max_err"] < 1e-5
    assert report["dino_max_err"] < 1e-5
    assert os.path.exists(tmp_path / "ours_prior.obj")
    assert os.path.exists(tmp_path / "reference_prior.obj")
