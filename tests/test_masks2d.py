import numpy as np

from instance_nerf_tpu.eval.instance_field_metrics import evaluate_instance_masks
from instance_nerf_tpu.masks2d.coco_nyu40 import (
    COCO_STUFF_TO_NYU40,
    COCO_THINGS_TO_NYU40,
    NYU40_CLASS_NAMES,
    map_category,
)

# the reference's tables, embedded verbatim for entry-for-entry parity
# (run_mask2former.py:53-86, coco2nyu40.py:14-44 — a missing stuff class
# silently mislabels segments)
_REF_THINGS = {"chair": 5, "couch": 6, "bed": 4, "dining table": 7}
_REF_STUFF = {
    "chair": 5, "couch": 6, "bed": 4, "dining table": 7, "curtain": 40,
    "door-stuff": 40, "floor-wood": 40, "light": 35, "shelf": 10,
    "stairs": 40, "wall-brick": 40, "wall-stone": 40, "wall-tile": 40,
    "wall-wood": 40, "window-blind": 40, "window-other": 40,
    "ceiling-merged": 40, "cabinet-merged": 3, "table-merged": 7,
    "floor-other-merged": 40, "building-other-merged": 40,
    "wall-other-merged": 40,
}


def test_mapping_tables_match_reference_entry_for_entry():
    assert COCO_THINGS_TO_NYU40 == _REF_THINGS
    assert COCO_STUFF_TO_NYU40 == _REF_STUFF
    # fallback for unmapped categories is 39 ("otherprop") in both
    assert map_category("zebra", True) == 39
    assert map_category("sky-other-merged", False) == 39
    assert len(NYU40_CLASS_NAMES) == 40
    assert NYU40_CLASS_NAMES[4] == "chair" and NYU40_CLASS_NAMES[39] == "otherprop"


def test_panoptic_to_semantic_swap_convention():
    import numpy as np

    from instance_nerf_tpu.masks2d.match_seg import panoptic_to_semantic

    seg = np.array([[0, 1, 2], [2, 2, 3]])
    info = [
        {"id": 1, "isthing": True, "category_id": 0, "category_name": "chair"},
        {"id": 2, "isthing": False, "category_id": 0, "category_name": "wall-wood"},
        {"id": 3, "isthing": True, "category_id": 0, "category_name": "zebra"},
    ]
    out = panoptic_to_semantic(seg, info)
    # void->40, chair->5, wall (40)->0, unmapped->39
    assert out.tolist() == [[40, 5, 0], [0, 0, 39]]
from instance_nerf_tpu.masks2d.match_seg import convert_seg, match_view
from instance_nerf_tpu.masks2d.refine_masks import refine_instance_map


def test_map_category():
    assert map_category("chair", True) == 5
    assert map_category("wall-wood", False) == 40
    assert map_category("zebra", True) == 39  # others


def test_convert_seg():
    seg = np.zeros((8, 8), np.int32)
    seg[0:4, 0:4] = 1  # chair instance
    seg[4:, 4:] = 2  # wall (background surface)
    info = [
        {"id": 1, "category_id": 0, "isthing": True, "category_name": "chair"},
        {"id": 2, "category_id": 1, "isthing": False, "category_name": "wall-wood"},
    ]
    out = convert_seg(seg, info)
    assert (out[0:4, 0:4] == 1).all()  # instance keeps its id
    assert (out[4:, 4:] == 0).all()  # background surface -> 0
    assert (out[0:4, 4:] == -1).all()  # unlabeled panoptic id 0 -> -1


def test_match_view_assigns_3d_ids():
    seg = np.zeros((10, 10), np.int32)
    seg[1:5, 1:5] = 7  # 2D segment id 7
    seg[6:9, 6:9] = 8
    proj = np.zeros((2, 10, 10), bool)
    proj[0, 1:5, 1:5] = True  # 3D instance 3
    proj[1, 6:9, 6:9] = True  # 3D instance 5
    out = match_view(seg, proj, np.asarray([3, 5]), iou_thresh=0.05)
    assert (out[1:5, 1:5] == 3).all()
    assert (out[6:9, 6:9] == 5).all()


def test_match_view_below_threshold_unlabeled():
    seg = np.zeros((10, 10), np.int32)
    seg[0:5, 0:5] = 2
    proj = np.zeros((1, 10, 10), bool)
    proj[0, 9:, 9:] = True  # no overlap
    out = match_view(seg, proj, np.asarray([4]), iou_thresh=0.05)
    assert (out[0:5, 0:5] == -1).all()


def test_match_view_no_projections():
    seg = np.zeros((6, 6), np.int32)
    seg[0:3, 0:3] = 2
    out = match_view(seg, np.zeros((0, 1, 1), bool), np.zeros(0, np.int64))
    assert (out[0:3, 0:3] == -1).all()


def test_evaluate_instance_masks_perfect():
    gt = np.zeros((12, 12), np.int32)
    gt[2:6, 2:6] = 1
    gt[7:11, 7:11] = 2
    m = evaluate_instance_masks([gt.copy()], [gt])
    assert m["pq"] == 1.0 and m["miou"] == 1.0 and m["tp"] == 2


def test_evaluate_instance_masks_partial():
    gt = np.zeros((12, 12), np.int32)
    gt[2:8, 2:8] = 1
    pred = np.zeros_like(gt)
    pred[2:8, 2:6] = 1  # 2/3 overlap
    m = evaluate_instance_masks([pred], [gt], iou_thresh=0.5)
    assert m["tp"] == 1
    np.testing.assert_allclose(m["miou"], 24 / 36, atol=1e-6)


def test_evaluate_relabelled_ids_still_match():
    gt = np.zeros((10, 10), np.int32)
    gt[1:5, 1:5] = 3
    pred = np.zeros_like(gt)
    pred[1:5, 1:5] = 9  # different id, same mask
    m = evaluate_instance_masks([pred], [gt])
    assert m["tp"] == 1 and m["miou"] == 1.0


def test_refine_instance_map_snaps_to_edges():
    rng = np.random.default_rng(0)
    img = np.zeros((24, 24, 3), np.float32) + 0.1
    img[6:18, 6:18] = 0.9  # bright square object
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    ids = np.zeros((24, 24), np.int32)
    ids[8:16, 5:17] = 1  # sloppy mask: offset vs the true square
    out = refine_instance_map(img, ids)
    gt = np.zeros_like(ids)
    gt[6:18, 6:18] = 1
    before = (ids == gt).mean()
    after = (out == gt).mean()
    assert after >= before  # refinement moves toward image edges


def test_async_predictor_ordered_and_parallel():
    """AsyncPredictor returns results in submission order across workers
    (the reference AsyncPredictor's put/get contract,
    Mask2Former_sample/predictor.py:130-170)."""
    import time

    from instance_nerf_tpu.masks2d.async_predictor import AsyncPredictor

    def make(widx):
        def predict(x):
            # reversed latency: later tasks finish first without ordering
            time.sleep(0.01 * (5 - x % 5))
            return x * 10
        return predict

    with AsyncPredictor(make, num_workers=3) as pred:
        got = list(pred.imap(range(17)))
    assert got == [x * 10 for x in range(17)]
    # single-shot call contract
    with AsyncPredictor(make, num_workers=2) as pred:
        assert pred(7) == 70


def test_async_predictor_propagates_errors():
    from instance_nerf_tpu.masks2d.async_predictor import AsyncPredictor

    def make(widx):
        def predict(x):
            if x == 2:
                raise ValueError("boom")
            return x
        return predict

    with AsyncPredictor(make, num_workers=2) as pred:
        pred.put(1)
        pred.put(2)
        assert pred.get() == 1
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pred.get()


def test_project_voxel_masks_relative_threshold():
    """The projector must find instances regardless of the extracted
    field's absolute density scale (the round-5 pipeline re-cert matched
    0 views through the old absolute weight threshold)."""
    import jax.numpy as jnp

    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.masks2d.project_masks import project_voxel_masks

    rng = np.random.default_rng(0)
    scene, gt_boxes_unit = make_synthetic_nerf_scene(
        rng, n_views=1, hw=(32, 32), n_blobs=2)
    G = 32
    inst = np.zeros((G, G, G), np.int32)
    for k, b in enumerate((gt_boxes_unit * G)):
        lo = np.floor(b[:3]).astype(int)
        hi = np.ceil(b[3:]).astype(int)
        inst[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = k + 1

    for scale in (0.9, 0.02):  # opaque and weak fields alike
        alpha = (inst > 0).astype(np.float32) * scale
        ids = project_voxel_masks(
            jnp.asarray(inst), jnp.asarray(alpha),
            jnp.asarray(scene.poses[0]), scene.intrinsics, scene.hw,
            n_samples=64, chunk=1024)
        assert (ids > 0).sum() > 10, scale
        assert set(np.unique(ids)) - {0} <= {1, 2}
