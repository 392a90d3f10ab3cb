import json
import os

import numpy as np
import pytest

from instance_nerf_tpu.data.synthetic import write_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scripts"))
    write_dataset(root, num_scenes=1, grid_size=(24, 24, 24), num_boxes=2)
    return root


def test_proposals2ngp(dataset_dir, tmp_path):
    from instance_nerf_tpu.scripts.proposals2ngp import main

    transforms = {"frames": []}
    tpath = str(tmp_path / "transforms.json")
    with open(tpath, "w") as f:
        json.dump(transforms, f)
    out = str(tmp_path / "out.json")
    main([
        "--proposals", os.path.join(dataset_dir, "rois", "scene_0000.npz"),
        "--metadata", os.path.join(dataset_dir, "metadata", "scene_0000.json"),
        "--transforms", tpath,
        "--output", out,
        "--grid_res", "24", "24", "24",
    ])
    with open(out) as f:
        res = json.load(f)
    boxes = res["bounding_boxes"]
    assert len(boxes) > 0
    for b in boxes:
        assert np.isfinite(np.asarray(b["position"])).all()
        assert np.isfinite(np.asarray(b["orientation"])).all()
        assert (np.asarray(b["extents"]) > 0).all()


def _ref_ngp_matrix_to_nerf(m, scale, offset, from_mitsuba):
    """Verbatim numpy oracle of the reference's frame conversion
    (ref scripts/proposals2ngp.py:10-21)."""
    result = np.array(m, np.float64, copy=True)
    if from_mitsuba:
        result[:, [0, 2]] *= -1
    else:
        result = result[[2, 0, 1], :]
    result[:, [1, 2]] *= -1
    result[:, 3] = (result[:, 3] - offset) / scale
    return result


def test_proposals2ngp_frame_golden():
    """Golden: a known grid box through the full instant-ngp frame chain
    (grid->world->y-up->nerf with scale/offset), vs the reference oracle
    (ref scripts/proposals2ngp.py:24-60)."""
    from instance_nerf_tpu.scripts.proposals2ngp import (
        PERM_ZUP_TO_YUP,
        ngp_matrix_to_nerf,
        obb_to_ngp_boxes,
        proposals_to_ngp_boxes,
    )

    feats = {
        "resolution": np.array([160.0, 160.0, 128.0]),
        "bbox_min": np.array([-3.0, -2.0, 0.0]),
        "bbox_max": np.array([3.0, 2.0, 2.5]),
        "scale": np.array(0.33),
        "offset": np.array([0.5, 0.5, 0.5]),
        "from_mitsuba": np.array(False),
    }
    props = np.array([[20.0, 40.0, 10.0, 100.0, 90.0, 60.0]])
    got = proposals_to_ngp_boxes(props, feats)[0]

    # oracle: reference computation step by step
    diag = feats["bbox_max"] - feats["bbox_min"]
    lo = props[0, :3] / feats["resolution"] * diag + feats["bbox_min"]
    hi = props[0, 3:] / feats["resolution"] * diag + feats["bbox_min"]
    center = (lo + hi) / 2
    extent = (hi - lo) / 0.33
    perm = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float64)
    off_y = perm @ feats["offset"]
    xform = perm @ np.concatenate([np.eye(3), center[:, None]], 1)
    ref = _ref_ngp_matrix_to_nerf(xform, 0.33, off_y, False)
    np.testing.assert_allclose(got["position"], ref[:, 3], rtol=1e-12)
    np.testing.assert_allclose(got["orientation"], ref[:, :3], rtol=1e-12)
    np.testing.assert_allclose(got["extents"], extent, rtol=1e-12)

    # mitsuba branch flips x/z instead of cycling axes
    m = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
    a = ngp_matrix_to_nerf(m, 2.0, np.array([0.5, 0.5, 0.5]), True)
    b = _ref_ngp_matrix_to_nerf(m, 2.0, np.array([0.5, 0.5, 0.5]), True)
    np.testing.assert_allclose(a, b)
    assert np.allclose(a[:, 3], (np.array([1, 2, 3]) - 0.5) / 2.0)

    # OBB: theta rotation survives the frame change with orthonormal basis
    obb = np.array([[80.0, 80.0, 64.0, 40.0, 20.0, 30.0, 0.6]])
    gob = obb_to_ngp_boxes(obb, feats)[0]
    o = np.asarray(gob["orientation"])
    np.testing.assert_allclose(o @ o.T, np.eye(3), atol=1e-12)
    assert PERM_ZUP_TO_YUP.sum() == 3


def test_render_heatmap(tmp_path):
    from instance_nerf_tpu.scripts.render_heatmap import main

    scores = {"0": np.random.default_rng(0).uniform(0, 1, (8, 8, 8))}
    spath = str(tmp_path / "scene.npz")
    np.savez(spath, **scores)
    out = str(tmp_path / "maps")
    main(["--scores", spath, "--output_dir", out])
    assert os.path.isfile(os.path.join(out, "scene_level0.png"))


def test_visualize_rpn_input(dataset_dir, tmp_path):
    from instance_nerf_tpu.scripts.visualize_rpn_input import main

    out = str(tmp_path / "vis")
    main([
        "--features", os.path.join(dataset_dir, "features", "scene_0000.npz"),
        "--boxes", os.path.join(dataset_dir, "rois", "scene_0000.npz"),
        "--output", out,
    ])
    assert os.path.getsize(out + "_pts.ply") > 100
    assert os.path.getsize(out + "_boxes.ply") > 100
    # ply header sanity
    with open(out + "_pts.ply", "rb") as f:
        head = f.read(64)
    assert head.startswith(b"ply\nformat binary_little_endian")
