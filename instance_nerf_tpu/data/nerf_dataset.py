"""Posed-image (NeRF) dataset: instant-ngp transforms.json + 2D masks.

Capability parity with torch-ngp's NeRFDataset over the 3D-FRONT
``nerf_data`` layout (README.md:55-65): instant-ngp-style
``transforms.json`` (fl_x/fl_y/cx/cy or camera_angle_x; frames with
file_path + transform_matrix), RGB images, and per-view instance-id masks
(the match_seg outputs) for instance-field training.

Scene coordinates are normalized so the scene bbox maps into the unit
cube (the renderer's AABB); ``scale``/``offset`` follow the instant-ngp
convention when present in the json.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np


@dataclass
class NeRFScene:
    images: np.ndarray  # (V, H, W, 3) float32 in [0, 1]
    poses: np.ndarray  # (V, 4, 4) c2w, OpenGL convention, unit-cube coords
    intrinsics: tuple  # (fx, fy, cx, cy)
    hw: tuple  # (H, W)
    masks: np.ndarray | None = None  # (V, H, W) int32 instance ids, -1 unlabeled

    @property
    def num_views(self):
        return self.images.shape[0]

    def ray_batch(self, rng: np.random.Generator, batch_size: int):
        """Random (view, pixel) rays -> host arrays for the train step."""
        v = rng.integers(0, self.num_views, batch_size)
        h, w = self.hw
        pix = rng.integers(0, h * w, batch_size)
        rgb = self.images[v, pix // w, pix % w]
        inst = self.masks[v, pix // w, pix % w] if self.masks is not None else None
        return v, pix, rgb, inst


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path))
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img[..., :3]


def load_transforms(root: str, transforms_name: str = "transforms.json"):
    with open(os.path.join(root, transforms_name)) as f:
        meta = json.load(f)
    return meta


def pose_to_unit_cube(c2w: np.ndarray, scale: float, offset: np.ndarray):
    out = c2w.copy()
    out[:3, 3] = out[:3, 3] * scale + offset
    return out


def load_nerf_scene(
    root: str,
    transforms_name: str = "transforms.json",
    masks_dir: str | None = None,
    downscale: int = 1,
) -> NeRFScene:
    meta = load_transforms(root, transforms_name)
    frames = meta["frames"]

    imgs, poses, masks = [], [], []
    for fr in frames:
        p = fr["file_path"]
        if not os.path.isabs(p):
            p = os.path.join(root, p)
        if not os.path.splitext(p)[1]:
            p = p + ".png"
        img = _load_image(p)
        if downscale > 1:
            img = img[::downscale, ::downscale]
        imgs.append(img)
        poses.append(np.asarray(fr["transform_matrix"], np.float64))
        if masks_dir is not None:
            stem = os.path.splitext(os.path.basename(p))[0]
            mpath = os.path.join(masks_dir, stem + ".npy")
            m = np.load(mpath).astype(np.int32)
            if downscale > 1:
                m = m[::downscale, ::downscale]
            masks.append(m)

    h, w = imgs[0].shape[:2]
    if "fl_x" in meta:
        fx, fy = meta["fl_x"] / downscale, meta["fl_y"] / downscale
        cx = meta.get("cx", w * downscale / 2) / downscale
        cy = meta.get("cy", h * downscale / 2) / downscale
    else:
        fx = fy = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
        cx, cy = w / 2.0, h / 2.0

    scale = float(meta.get("scale", 1.0))
    offset = np.asarray(meta.get("offset", [0.5, 0.5, 0.5]), np.float64)
    poses = np.stack([pose_to_unit_cube(p, scale, offset) for p in poses])

    return NeRFScene(
        images=np.stack(imgs).astype(np.float32),
        poses=poses.astype(np.float32),
        intrinsics=(fx, fy, cx, cy),
        hw=(h, w),
        masks=np.stack(masks) if masks else None,
    )


# ---------------------------------------------------------------------------
# Synthetic posed-image scenes (tests/bench without real 3D-FRONT data)
# ---------------------------------------------------------------------------


def write_nerf_scene(root: str, scene: NeRFScene, boxes=None):
    """Write a scene in the instant-ngp layout the loader reads back:
    transforms.json + images/*.png + masks/*.npy (+ boxes.npy)."""
    import os

    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    if scene.masks is not None:
        os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    fx, fy, cx, cy = scene.intrinsics
    frames = []
    for v in range(scene.num_views):
        name = f"r_{v:03d}"
        img = (np.clip(scene.images[v], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "images", name + ".png"))
        if scene.masks is not None:
            np.save(os.path.join(root, "masks", name + ".npy"), scene.masks[v])
        frames.append(
            {
                "file_path": f"images/{name}.png",
                "transform_matrix": scene.poses[v].tolist(),
            }
        )
    meta = {
        "fl_x": fx, "fl_y": fy, "cx": cx, "cy": cy,
        "w": scene.hw[1], "h": scene.hw[0],
        "scale": 1.0, "offset": [0.0, 0.0, 0.0],
        "frames": frames,
    }
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(meta, f)
    if boxes is not None:
        np.save(os.path.join(root, "boxes.npy"), boxes)


def look_at_pose(eye, target=(0.5, 0.5, 0.5), up=(0.0, 0.0, 1.0)):
    """OpenGL c2w looking from eye at target."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    z = -fwd
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def make_synthetic_nerf_scene(
    rng: np.random.Generator,
    n_views: int = 8,
    hw=(48, 48),
    n_blobs: int = 3,
    fov: float = 0.9,
    blob_lo=(0.15, 0.6),
    blob_size=(0.15, 0.3),
    cam_radius: float = 1.6,
    cam_height: float = 1.3,
):
    """Analytic volumetric scene (colored boxes in the unit cube) rendered
    by exact ray marching — ground truth images + instance masks for
    overfit tests. Returns (NeRFScene, blob boxes (K, 6) in unit coords).

    ``blob_lo``/``blob_size`` bound the box corners/extents;
    ``cam_radius``/``cam_height`` place the orbit cameras. The defaults
    give small, sparse instances (~1-2% of pixels at 64x64) — fine for
    overfit tests, too label-starved for instance-field generalization.
    Pipeline-style drivers should pass view-filling values (bigger
    blobs, closer orbit) so 2D segments carry enough labeled rays."""
    import jax
    import jax.numpy as jnp

    from instance_nerf_tpu.models.render import camera_rays, composite, ray_aabb, sample_points

    boxes = []
    colors = []
    for _ in range(n_blobs):
        lo = rng.uniform(*blob_lo, 3)
        hi = lo + rng.uniform(*blob_size, 3)
        boxes.append(np.concatenate([lo, np.minimum(hi, 0.9)]))
        colors.append(rng.uniform(0.2, 1.0, 3))
    boxes = np.stack(boxes)
    colors = np.stack(colors)

    def field(xyz):
        # densities/colors/instance of analytic boxes
        inside = jnp.stack(
            [
                jnp.all((xyz >= boxes[k, :3]) & (xyz <= boxes[k, 3:]), axis=-1)
                for k in range(n_blobs)
            ],
            axis=-1,
        )  # (..., K)
        any_in = jnp.any(inside, axis=-1)
        first = jnp.argmax(inside, axis=-1)
        sigma_raw = jnp.where(any_in, 4.0, -15.0)  # exp(4) ~ 54.6
        rgb = jnp.where(
            any_in[..., None], jnp.asarray(colors)[first], jnp.zeros(3)
        )
        inst = jnp.where(any_in, first + 1, 0)
        return sigma_raw, rgb, inst

    h, w = hw
    fx = fy = 0.5 * w / np.tan(0.5 * fov)
    intr = (fx, fy, w / 2.0, h / 2.0)

    images, poses, masks = [], [], []
    key = jax.random.key(0)
    for v in range(n_views):
        ang = 2 * np.pi * v / n_views
        eye = np.array([0.5 + cam_radius * np.cos(ang),
                        0.5 + cam_radius * np.sin(ang), cam_height])
        c2w = look_at_pose(eye)
        o, d = camera_rays(jnp.asarray(c2w, jnp.float32), intr, hw)
        near, far = ray_aabb(o, d)
        valid = far > near
        far_c = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(key, o, d, 96, near, far_c, stratified=False)
        sigma_raw, rgb, inst = field(jnp.clip(xyz, 0, 1))
        out = composite(sigma_raw, rgb, None, t, dt, valid=valid.astype(jnp.float32))
        images.append(np.asarray(out.rgb).reshape(h, w, 3))
        # instance mask: weight-majority id along the ray. (A threshold on
        # the MAX SINGLE-SAMPLE weight is dt-dependent — at 96 samples
        # over a ~1.5-unit span the per-sample weight of a fully opaque
        # blob hovers around 0.5, so whole VIEWS flipped to empty masks
        # depending on the near/far span. Accumulated weight per id is
        # sampling-density invariant: an opaque first hit sums to ~1.)
        wgt = np.asarray(out.weights)
        inst_np = np.asarray(inst)
        inst_oh = inst_np[..., None] == np.arange(1, n_blobs + 1)
        acc = (wgt[..., None] * inst_oh).sum(axis=1)  # (rays, K)
        ids = np.where(acc.sum(axis=1) > 0.5, acc.argmax(axis=1) + 1, 0)
        masks.append(ids.reshape(h, w).astype(np.int32))
        poses.append(np.asarray(c2w, np.float32))

    scene = NeRFScene(
        images=np.stack(images),
        poses=np.stack(poses),
        intrinsics=intr,
        hw=hw,
        masks=np.stack(masks),
    )
    return scene, boxes
