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
    with open(os.path.join(dataset_dir, "metadata", "scene_0000.json")) as f:
        bbox = np.asarray(json.load(f)["scene_bbox"])
    for b in boxes:
        c = np.asarray(b["center"])
        assert (c >= bbox[:3] - 1).all() and (c <= bbox[3:] + 1).all()


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
