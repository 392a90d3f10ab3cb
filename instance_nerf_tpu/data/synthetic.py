"""Synthetic scene generation — test/bench data without 3D-FRONT.

Random AABBs rasterized into RGBσ grids (SURVEY.md §4: "tiny end-to-end
runs on synthetic scenes (random boxes rasterized into grids)"). Also
writes the reference's full on-disk dataset layout so the CLI drivers can
be exercised end to end: features/ metadata/ masks/ rois/ +
dataset_split.json.
"""
from __future__ import annotations

import json
import os

import numpy as np

from instance_nerf_tpu.data.datasets import FRONT3D_CLASS_IDS


def make_scene(
    rng: np.random.Generator,
    grid_size=(64, 64, 48),
    num_boxes: int = 5,
    min_side: int = 6,
    max_side: int = 24,
):
    """Returns (rgbsigma (W,L,H,4) f32, boxes (K,6), class_ids (K,) NYU40,
    instance_mask_grid (W,L,H) int64 with ids 1..K)."""
    w, l, h = grid_size
    grid = np.zeros((w, l, h, 4), np.float32)
    mask = np.zeros((w, l, h), np.int64)
    boxes, cls = [], []
    for i in range(num_boxes):
        sides = rng.integers(min_side, max_side + 1, 3)
        sides = np.minimum(sides, [w - 2, l - 2, h - 2])
        lo = np.array(
            [rng.integers(1, max(2, d - s)) for d, s in zip(grid_size, sides)]
        )
        hi = lo + sides
        color = rng.uniform(0.2, 1.0, 3)
        grid[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2], :3] = color
        grid[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2], 3] = rng.uniform(0.6, 1.0)
        mask[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = i + 1
        boxes.append(np.concatenate([lo, hi]).astype(np.float32))
        cls.append(int(rng.choice(FRONT3D_CLASS_IDS)))
    # mild noise so the detector can't key on exact zeros
    grid[..., 3] += rng.uniform(0, 0.02, (w, l, h)).astype(np.float32)
    return grid, np.stack(boxes), np.asarray(cls), mask


def jittered_rois(rng, boxes, grid_size, num_rois=64, noise=2.0):
    """Noisy proposals around gt (stand-in for RPN output) + fake level ids."""
    k = boxes.shape[0]
    reps = -(-num_rois // k)
    rois = np.repeat(boxes, reps, axis=0)[:num_rois]
    rois = rois + rng.normal(0, noise, rois.shape).astype(np.float32)
    rois[:, :3] = np.clip(rois[:, :3], 0, np.asarray(grid_size) - 2)
    rois[:, 3:] = np.clip(rois[:, 3:], rois[:, :3] + 1, np.asarray(grid_size))
    vols = np.cbrt(np.prod(rois[:, 3:] - rois[:, :3], axis=1))
    levels = np.clip(np.floor(np.log2(vols / 20 + 1e-6)) + 2, 0, 3).astype(np.int64)
    return rois.astype(np.float32), levels


def write_dataset(
    root: str,
    num_scenes: int = 4,
    grid_size=(64, 64, 48),
    num_boxes: int = 5,
    seed: int = 0,
    splits=(0.5, 0.25),
):
    """Write a reference-layout dataset (features/metadata/masks/rois +
    dataset_split.json). Boxes in metadata are stored in world coords with
    a scene_bbox so the loader's rescale path is exercised."""
    rng = np.random.default_rng(seed)
    for sub in ("features", "metadata", "masks", "rois"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    scenes = []
    for i in range(num_scenes):
        scene = f"scene_{i:04d}"
        scenes.append(scene)
        grid, boxes, cls, mask = make_scene(rng, grid_size, num_boxes)
        # density stored raw-ish; the loader applies density_to_alpha.
        # alpha = 1-exp(-exp(sigma)/100)  =>  sigma = log(-100*log(1-alpha))
        alpha = np.clip(grid[..., 3], 1e-4, 0.95)
        sigma = np.log(-100.0 * np.log1p(-alpha))
        feat = np.concatenate([grid[..., :3], sigma[..., None]], axis=-1)
        np.savez_compressed(
            os.path.join(root, "features", scene + ".npz"),
            rgbsigma=feat.astype(np.float32),
            resolution=np.asarray(grid_size),
        )
        # world coords: scene_bbox [-1, 1]^3-ish box scaled per axis
        scene_bbox = np.array([-2.0, -2.0, -1.5, 2.0, 2.0, 1.5])
        diag = scene_bbox[3:] - scene_bbox[:3]
        world_boxes = boxes.copy().astype(np.float64)
        world_boxes[:, :3] = world_boxes[:, :3] / np.asarray(grid_size) * diag + scene_bbox[:3]
        world_boxes[:, 3:] = world_boxes[:, 3:] / np.asarray(grid_size) * diag + scene_bbox[:3]
        metadata = {
            "scene_bbox": scene_bbox.tolist(),
            "instances": [
                {
                    "id": j + 1,
                    "aabb": world_boxes[j].tolist(),
                    "class_id": int(cls[j]),
                }
                for j in range(boxes.shape[0])
            ],
        }
        with open(os.path.join(root, "metadata", scene + ".json"), "w") as f:
            json.dump(metadata, f)
        np.save(os.path.join(root, "masks", scene + ".npy"), mask)
        rois, levels = jittered_rois(rng, boxes, grid_size)
        np.savez(
            os.path.join(root, "rois", scene + ".npz"),
            proposals=rois,
            level_indices=levels,
        )

    n_train = max(1, int(num_scenes * splits[0]))
    n_val = max(1, int(num_scenes * splits[1]))
    split = {
        "train": scenes[:n_train],
        "val": scenes[n_train : n_train + n_val],
        "test": scenes[n_train + n_val :] or scenes[-1:],
    }
    with open(os.path.join(root, "dataset_split.json"), "w") as f:
        json.dump(split, f)
    return scenes
