"""Export proposals as instant-ngp ``transforms.json`` bounding boxes.

Capability parity with ``nerf_rcnn/scripts/proposals2ngp.py``: convert
grid-coordinate proposals back into the scene's world frame and append
them as box annotations to an instant-ngp transforms.json so they render
in the ngp GUI.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def grid_to_world(boxes: np.ndarray, scene_bbox: np.ndarray, grid_res) -> np.ndarray:
    """Invert the loader's world->grid rescale (datasets.py:243-263)."""
    diag = scene_bbox[3:] - scene_bbox[:3]
    out = boxes.astype(np.float64).copy()
    out[:, :3] = out[:, :3] / np.asarray(grid_res) * diag + scene_bbox[:3]
    out[:, 3:6] = out[:, 3:6] / np.asarray(grid_res) * diag + scene_bbox[:3]
    return out


def boxes_to_ngp_entries(world_boxes: np.ndarray, scores=None) -> list[dict]:
    entries = []
    for i, b in enumerate(world_boxes):
        center = ((b[:3] + b[3:6]) / 2).tolist()
        extents = (b[3:6] - b[:3]).tolist()
        e = {
            "center": center,
            "extents": extents,
            "orientation": np.eye(3).tolist(),
        }
        if scores is not None:
            e["score"] = float(scores[i])
        entries.append(e)
    return entries


def main(argv=None):
    p = argparse.ArgumentParser("proposals2ngp")
    p.add_argument("--proposals", required=True, help="rois npz (proposals[, scores])")
    p.add_argument("--metadata", required=True, help="scene metadata json (scene_bbox)")
    p.add_argument("--transforms", required=True, help="instant-ngp transforms.json to annotate")
    p.add_argument("--output", required=True)
    p.add_argument("--grid_res", type=int, nargs=3, default=[160, 160, 160])
    p.add_argument("--top_k", type=int, default=None)
    args = p.parse_args(argv)

    rois = np.load(args.proposals)
    boxes = rois["proposals"]
    scores = rois["scores"] if "scores" in rois else None
    if boxes.shape[1] == 7:
        import jax.numpy as jnp

        from instance_nerf_tpu.ops.boxes import obb2hbb_3d

        boxes = np.asarray(obb2hbb_3d(jnp.asarray(boxes)))
    if args.top_k and scores is not None:
        idx = np.argsort(-scores)[: args.top_k]
        boxes, scores = boxes[idx], scores[idx]

    with open(args.metadata) as f:
        meta = json.load(f)
    scene_bbox = np.asarray(meta["scene_bbox"], np.float64)
    world = grid_to_world(boxes, scene_bbox, args.grid_res)

    with open(args.transforms) as f:
        transforms = json.load(f)
    transforms["bounding_boxes"] = boxes_to_ngp_entries(world, scores)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(transforms, f, indent=2)
    print(f"wrote {len(world)} boxes -> {args.output}")


if __name__ == "__main__":
    main()
