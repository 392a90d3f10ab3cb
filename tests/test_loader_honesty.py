"""Loader honesty vs the reference's exact on-disk conventions.

Each test pins one quirk of ``nerf_rcnn/datasets.py`` that real 3D-FRONT
exports exercise (VERDICT r2 "Missing #4"): the flat-storage reshape +
``transpose_yz`` axis orders (ref 775-785), npy-over-json box-source
precedence (ref 238-244), zero-box scene filtering (ref 282-296), the
metadata sort-by-id + scene_bbox->grid rescale (ref 246-258), and the
uint8 storage rescale (ref 229-231 / 788-791).

The oracles transliterate the reference formulas in numpy (channels-first,
like torch) and the assertions map them onto our channels-last layout.
"""
import json
import os

import numpy as np

from instance_nerf_tpu.data.datasets import (
    RPNDataset,
    boxes_from_metadata,
    load_feature_grid,
)


def _ref_load_feature(rgbsigma: np.ndarray, res, transpose_yz: bool) -> np.ndarray:
    """Verbatim numpy oracle of datasets.py:775-785 (channels-first)."""
    if rgbsigma.ndim == 2:
        r = rgbsigma.reshape(res[2], res[1], res[0], -1)
        if transpose_yz:
            r = np.transpose(r, (3, 0, 2, 1))
        else:
            r = np.transpose(r, (3, 2, 1, 0))
    else:
        r = np.transpose(rgbsigma, (3, 0, 1, 2))
    return r


def _write_npz(path, **arrays):
    np.savez(path, **arrays)
    return path


def test_flat_storage_reshape_matches_reference(tmp_path):
    # distinct axis lengths so any transposition error changes the shape
    res = np.array([5, 6, 7])  # (W, L, H) — ref reshapes to (res[2], res[1], res[0])
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((int(np.prod(res)), 4)).astype(np.float32)
    p = _write_npz(tmp_path / "s.npz", rgbsigma=flat, resolution=res)
    for tyz in (True, False):
        ours = load_feature_grid(str(p), normalize_density=False, transpose_yz=tyz)
        ref = _ref_load_feature(flat, res, tyz)  # (C, A, B, D)
        np.testing.assert_array_equal(ours, np.moveaxis(ref, 0, -1))


def test_4d_storage_is_channels_last_of_reference(tmp_path):
    rng = np.random.default_rng(1)
    grid = rng.standard_normal((4, 5, 6, 4)).astype(np.float32)
    p = _write_npz(tmp_path / "s.npz", rgbsigma=grid, resolution=np.array([4, 5, 6]))
    ours = load_feature_grid(str(p), normalize_density=False)
    ref = _ref_load_feature(grid, None, True)
    np.testing.assert_array_equal(ours, np.moveaxis(ref, 0, -1))


def test_uint8_storage_rescaled_to_unit(tmp_path):
    grid = np.arange(2 * 2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 2, 4)
    p = _write_npz(tmp_path / "s.npz", rgbsigma=grid, resolution=np.array([2, 2, 2]))
    ours = load_feature_grid(str(p), normalize_density=False)
    np.testing.assert_allclose(ours, grid.astype(np.float32) / 255.0)
    # NOTE deliberate deviation (documented at datasets.py:66-69): the
    # reference computes alpha on RAW uint8 densities and assigns the
    # float back into the uint8 array (truncating to 0/1) BEFORE the
    # /255 rescale — garbage for uint8+normalize_density. We rescale
    # first; alpha stays in (0, 1).
    normed = load_feature_grid(str(p), normalize_density=True)
    assert 0.0 <= normed[..., -1].min() and normed[..., -1].max() <= 1.0


def _scene_files(root, scene, res=(8, 8, 8), boxes_npy=None, metadata=None):
    os.makedirs(os.path.join(root, "features"), exist_ok=True)
    os.makedirs(os.path.join(root, "boxes"), exist_ok=True)
    grid = np.zeros((*res, 4), np.float32)
    _write_npz(
        os.path.join(root, "features", scene + ".npz"),
        rgbsigma=grid, resolution=np.array(res),
    )
    if boxes_npy is not None:
        np.save(os.path.join(root, "boxes", scene + ".npy"), boxes_npy)
    if metadata is not None:
        with open(os.path.join(root, "boxes", scene + ".json"), "w") as f:
            json.dump(metadata, f)


def test_npy_takes_precedence_over_json(tmp_path):
    # ref load_single_scene checks <scene>.npy BEFORE <scene>.json
    # (datasets.py:238-244); when both exist the npy wins.
    root = str(tmp_path)
    npy_boxes = np.array([[1, 1, 1, 3, 3, 3]], np.float32)
    meta = {
        "scene_bbox": [0, 0, 0, 1, 1, 1],
        "instances": [{"id": 1, "aabb": [0.5, 0.5, 0.5, 0.9, 0.9, 0.9], "class_id": 3}],
    }
    _scene_files(root, "s0", boxes_npy=npy_boxes, metadata=meta)
    ds = RPNDataset(os.path.join(root, "features"), os.path.join(root, "boxes"))
    _, _, boxes = ds.get(0)
    np.testing.assert_array_equal(boxes, npy_boxes)


def test_zero_box_scenes_are_dropped(tmp_path):
    # ref load_scene_data drops scenes whose npy has 0 rows
    # (datasets.py:282-286); scenes without any feature file too.
    root = str(tmp_path)
    _scene_files(root, "keep", boxes_npy=np.ones((2, 6), np.float32))
    _scene_files(root, "empty", boxes_npy=np.zeros((0, 6), np.float32))
    ds = RPNDataset(
        os.path.join(root, "features"), os.path.join(root, "boxes"),
        scene_list=["keep", "empty", "no_feature_file"],
    )
    assert ds.scenes == ["keep"]


def test_metadata_boxes_sorted_and_rescaled(tmp_path):
    # ref sorts instances by id then maps world aabbs into grid coords:
    # (aabb - scene_bbox[:3]) / diag * res (datasets.py:246-258)
    scene_bbox = np.array([-2.0, -1.0, 0.0, 2.0, 3.0, 2.0])
    diag = scene_bbox[3:] - scene_bbox[:3]
    res = np.array([16, 16, 8])
    inst = [
        {"id": 7, "aabb": [0.0, 0.0, 0.5, 1.0, 1.0, 1.5], "class_id": 4},
        {"id": 2, "aabb": [-1.0, -0.5, 0.2, 0.5, 2.0, 1.0], "class_id": 5},
    ]
    meta = {"scene_bbox": scene_bbox.tolist(), "instances": inst}
    boxes, class_ids = boxes_from_metadata(meta, res)
    # sorted by id: instance 2 first
    assert class_ids.tolist() == [5, 4]
    for row, it in zip(boxes, sorted(inst, key=lambda x: x["id"])):
        a = np.asarray(it["aabb"], np.float64)
        exp_lo = (a[:3] - scene_bbox[:3]) / diag * res
        exp_hi = (a[3:] - scene_bbox[:3]) / diag * res
        np.testing.assert_allclose(row[:3], exp_lo, rtol=1e-6)
        np.testing.assert_allclose(row[3:], exp_hi, rtol=1e-6)
