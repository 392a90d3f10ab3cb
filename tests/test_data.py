import os

import numpy as np
import pytest

from instance_nerf_tpu.data import augment as A
from instance_nerf_tpu.data import synthetic as S
from instance_nerf_tpu.data.datasets import (
    RPNDataset,
    SegmentationDataset,
    load_feature_grid,
    ngp_density_to_alpha,
    remap_front3d_classes,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    S.write_dataset(root, num_scenes=4, grid_size=(32, 32, 24), num_boxes=3)
    return root


def test_write_and_load_feature_grid(dataset_dir):
    g = load_feature_grid(os.path.join(dataset_dir, "features", "scene_0000.npz"))
    assert g.shape == (32, 32, 24, 4)
    assert g.dtype == np.float32
    assert 0 <= g[..., 3].min() and g[..., 3].max() <= 1.0  # alpha normalized


def test_density_roundtrip():
    # write_dataset stores sigma = inverse of density_to_alpha
    alpha = np.array([0.1, 0.5, 0.9])
    sigma = np.log(-100.0 * np.log1p(-alpha))
    np.testing.assert_allclose(ngp_density_to_alpha(sigma), alpha, rtol=1e-5)


def test_rpn_dataset_batch(dataset_dir):
    ds = RPNDataset(
        features_path=os.path.join(dataset_dir, "features"),
        boxes_path=os.path.join(dataset_dir, "metadata"),
    )
    assert len(ds) == 4
    batch = ds.batch([0, 1], pad_shape=(32, 32, 32), max_gt=8)
    assert batch.grids.shape == (2, 32, 32, 32, 4)
    np.testing.assert_allclose(batch.grid_sizes[0], [32, 32, 24])
    assert batch.gt_mask[:, :3].all() and not batch.gt_mask[:, 3:].any()
    # boxes round-tripped through world coords -> grid coords
    assert (batch.gt_boxes[batch.gt_mask] >= 0).all()
    assert (batch.gt_boxes[batch.gt_mask][:, 3:] <= 32 + 1e-3).all()


def test_segmentation_dataset(dataset_dir):
    ds = SegmentationDataset("train", dataset_dir)
    d = ds.load_scene(0)
    assert d["grid"].shape == (32, 32, 24, 4)
    assert d["boxes"].shape[0] == 3
    assert d["masks"].shape == (3, 32, 32, 24)
    assert set(np.unique(d["class_ids"])) <= set(range(1, 11))
    batch = ds.batch([0, 1], pad_shape=(32, 32, 24), max_gt=4, max_rois=16)
    assert batch.rois.shape == (2, 16, 6)
    assert batch.roi_mask.all()
    assert batch.gt_voxel_masks.shape == (2, 4, 32, 32, 24)
    # each instance mask is non-empty and contained in its gt box
    # (later instances may carve earlier ones where boxes overlap)
    for k in range(3):
        m = batch.gt_voxel_masks[0, k]
        assert m.sum() > 0
        idx = np.argwhere(m)
        lo, hi = batch.gt_boxes[0, k, :3], batch.gt_boxes[0, k, 3:]
        assert (idx >= np.floor(lo) - 1e-3).all()
        assert (idx < np.ceil(hi) + 1e-3).all()


def test_segmentation_test_mode(dataset_dir):
    ds = SegmentationDataset("test", dataset_dir)
    d = ds.load_scene(0)
    assert d["boxes"] is None and d["rois"].shape[1] == 6


def test_remap_classes():
    ids = remap_front3d_classes(np.array([3, 39, 4, 99]))
    assert ids.tolist() == [1, 10, 2, 0]


def test_flip_keeps_boxes_on_content():
    rng = np.random.default_rng(0)
    grid, boxes, _, _ = S.make_scene(rng, (32, 32, 24), num_boxes=2)
    for axis in (0, 1):
        g2, b2 = A.flip_axis(grid, boxes, axis)
        # content inside transformed box matches original occupancy
        for b in b2:
            lo = np.floor(b[:3]).astype(int)
            hi = np.ceil(b[3:]).astype(int)
            assert g2[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2], 3].mean() > 0.5


def test_rot90_keeps_boxes_on_content():
    rng = np.random.default_rng(1)
    grid, boxes, _, _ = S.make_scene(rng, (32, 32, 24), num_boxes=2)
    g2, b2 = A.rotate90_z(grid, boxes)
    assert g2.shape == (32, 32, 24, 4)
    for b in b2:
        lo = np.floor(b[:3]).astype(int)
        hi = np.ceil(b[3:]).astype(int)
        assert (hi > lo).all()
        assert g2[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2], 3].mean() > 0.5


def test_rotate_and_scale_obb():
    rng = np.random.default_rng(2)
    grid, boxes, _, _ = S.make_scene(rng, (24, 24, 24), num_boxes=1)
    obb = np.concatenate(
        [
            (boxes[:, :3] + boxes[:, 3:]) / 2,
            boxes[:, 3:] - boxes[:, :3],
            np.zeros((1, 1), np.float32),
        ],
        axis=1,
    )
    g2, b2 = A.rotate_and_scale(grid, obb, angle=0.1, scale=1.05)
    assert g2.shape == grid.shape
    assert np.isfinite(b2).all()
    np.testing.assert_allclose(b2[0, 6], -0.1, atol=1e-6)
    np.testing.assert_allclose(b2[0, 3:6], obb[0, 3:6] / 1.05, rtol=1e-5)
    # identity transform is a no-op on the volume interior
    g3, b3 = A.rotate_and_scale(grid, obb, angle=0.0, scale=1.0)
    np.testing.assert_allclose(g3, grid, atol=1e-5)
    np.testing.assert_allclose(b3, obb, atol=1e-5)


def test_augment_pipeline_runs():
    rng = np.random.default_rng(3)
    grid, boxes, _, _ = S.make_scene(rng, (16, 16, 16), num_boxes=2)
    g, b = A.augment_rpn_inputs(
        rng, grid, boxes, flip_prob=1.0, rotate_prob=1.0
    )
    assert g.shape == grid.shape and b.shape == boxes.shape


def test_rpn_export_bridge_feeds_rcnn_dataset(dataset_dir, tmp_path):
    """run_rpn --save_results writes rois npz that SegmentationDataset
    consumes directly (the RPN->RCNN bridge, run_rpn.py:485-505)."""
    import shutil

    root = str(tmp_path / "bridged")
    shutil.copytree(dataset_dir, root)
    # simulate the exporter: overwrite rois/ with RPN-style output keys
    rois_dir = os.path.join(root, "rois")
    for f in os.listdir(rois_dir):
        scene = f[:-4]
        np.savez(
            os.path.join(rois_dir, f),
            proposals=np.array([[2, 2, 2, 20, 20, 18]], np.float32),
            level_indices=np.array([1], np.int64),
            scores=np.array([0.9], np.float32),  # extra key must be ignored
        )
    ds = SegmentationDataset("train", root)
    d = ds.load_scene(0)
    np.testing.assert_allclose(d["rois"], [[2, 2, 2, 20, 20, 18]])
    assert d["level_indices"].tolist() == [1]


def test_make_room_scene_class_conditioned():
    rng = np.random.default_rng(0)
    grid, boxes, cls, mask = S.make_room_scene(rng, (48, 48, 40), (4, 6))
    assert grid.shape == (48, 48, 40, 4) and boxes.shape[1] == 6
    assert set(cls).issubset(set(S.CLASS_STYLES))
    # floor slab exists (background structure)
    assert (grid[10:40, 10:40, 0, 3] > 0.5).mean() > 0.9
    # every box's mask blob sits inside its AABB and has the class color
    for i, b in enumerate(boxes):
        sel = mask == i + 1
        if not sel.any():  # fully overwritten by a later box
            continue
        idx = np.argwhere(sel)
        assert (idx >= np.floor(b[:3]) - 1).all()
        assert (idx <= np.ceil(b[3:]) + 1 - 1).all()
        base = np.asarray(S.CLASS_STYLES[int(cls[i])]["color"])
        got = grid[sel][:, :3].mean(axis=0)
        assert np.abs(got - base).max() < 0.2


def test_make_room_scene_rotated():
    rng = np.random.default_rng(1)
    grid, boxes, cls, mask = S.make_room_scene(
        rng, (48, 48, 40), (4, 6), rotated=True
    )
    assert boxes.shape[1] == 7
    assert (np.abs(boxes[:, 6]) <= np.pi / 2 + 1e-6).all()
    # rasterized voxels of each instance lie inside the rotated box
    for i, b in enumerate(boxes):
        sel = np.argwhere(mask == i + 1)
        if sel.size == 0:
            continue
        d = sel + 0.5 - b[:3]
        c, s = np.cos(b[6]), np.sin(b[6])
        bx = c * d[:, 0] + s * d[:, 1]
        by = -s * d[:, 0] + c * d[:, 1]
        assert (np.abs(bx) <= b[3] / 2 + 1.0).all()
        assert (np.abs(by) <= b[4] / 2 + 1.0).all()
        assert (np.abs(d[:, 2]) <= b[5] / 2 + 1.0).all()


def test_write_dataset_rotated_layout(tmp_path):
    root = str(tmp_path / "rot")
    S.write_dataset(root, num_scenes=2, grid_size=(32, 32, 24), num_boxes=4,
                    style="room", rotated=True, compress=False)
    obb = np.load(os.path.join(root, "boxes_obb", "scene_0000.npy"))
    assert obb.shape[1] == 7
    # metadata aabbs enclose the obbs (grid coords round-trip)
    import json as J
    with open(os.path.join(root, "metadata", "scene_0000.json")) as f:
        meta = J.load(f)
    from instance_nerf_tpu.data.datasets import boxes_from_metadata
    aabb, _ = boxes_from_metadata(meta, (32, 32, 24))
    ctr = obb[:, :3]
    assert (aabb[:, :3] <= ctr + 1e-3).all() and (aabb[:, 3:] >= ctr - 1e-3).all()
