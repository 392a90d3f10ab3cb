"""Render projected 2D masks of 3D instance masks from training views.

Capability parity with the torch-ngp ``scripts/project_3d_masks.py``
(absent submodule, README.md:63): for every camera view and every
detected 3D voxel mask, render the mask's 2D projection — the inputs to
match_seg. Occlusion is handled by marching the scene's density (alpha
grid) along rays: a pixel belongs to instance i's projection when the
accumulated compositing weight inside i's voxels exceeds a threshold.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.models.render import camera_rays, ray_aabb, sample_points


def project_voxel_masks(
    inst_grid: jnp.ndarray,  # (W, L, H) int instance ids, 0 = none
    alpha_grid: jnp.ndarray,  # (W, L, H) density/alpha for occlusion
    pose: jnp.ndarray,  # (4, 4) c2w in unit-cube coords
    intrinsics,
    hw,
    n_samples: int = 192,
    weight_thresh: float = 0.3,
    sigma_scale: float = 30.0,
    chunk: int = 8192,
    min_weight: float = 0.02,
) -> np.ndarray:
    """-> (H, W) int32: per-pixel instance id (0 where none).

    ``weight_thresh`` is the winning instance's share of the ray's
    accumulated INSTANCE weight (id>0 samples only): the original
    absolute form silently dropped every pixel when the extracted
    field's density scale was low (the round-5 pipeline re-cert matched
    0 views), and a share-of-total form is defeated by NGP background
    floaters — real extracted grids carry median background alpha
    ~0.03, which soaks up ~70% of ray weight before the first instance.
    Inter-INSTANCE occlusion still suppresses (the occluder wins the
    share); ``min_weight`` rejects rays whose instance weight is
    negligible (fog-buried or off-instance).
    """
    h, w = hw
    o_all, d_all = camera_rays(pose, intrinsics, hw)
    res = jnp.asarray(inst_grid.shape, jnp.float32)
    # static on host: jnp.max inside jit would be a tracer
    num_ids = int(jnp.max(inst_grid)) + 1

    @jax.jit
    def render_chunk(o, d):
        near, far = ray_aabb(o, d)
        valid = (far > near).astype(jnp.float32)
        far = jnp.maximum(far, near + 1e-4)
        xyz, t, dt = sample_points(
            jax.random.key(0), o, d, n_samples, near, far, stratified=False
        )
        idx = jnp.clip((xyz * res).astype(jnp.int32), 0,
                       jnp.asarray(inst_grid.shape) - 1)
        inst = inst_grid[idx[..., 0], idx[..., 1], idx[..., 2]]  # (R, S)
        alpha_v = alpha_grid[idx[..., 0], idx[..., 1], idx[..., 2]]
        # march INSTANCE density only: extracted NGP fields carry
        # background fog/floaters the RGB loss never forbids (it can
        # emit background color), and on the real pipe_r5b grid that
        # crust absorbed transmittance to ~0.005 before the first
        # instance voxel. The 3D masks are the objects being projected;
        # occlusion BETWEEN detected instances is preserved (the
        # occluder accumulates first), fog is treated as transparent.
        sigma = alpha_v * sigma_scale * (inst > 0)
        a = 1.0 - jnp.exp(-sigma * dt)
        trans = jnp.cumprod(1.0 - a + 1e-10, axis=-1)
        trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
        wgt = a * trans * valid[:, None]
        # per-instance accumulated weight via segment-sum over ids
        onehot = jax.nn.one_hot(inst, num_ids, dtype=wgt.dtype)
        acc = jnp.einsum("rs,rsk->rk", wgt, onehot)  # (R, K)
        acc = acc.at[:, 0].set(0.0)  # id 0 = no instance
        total_inst = jnp.sum(acc, axis=-1)
        best = jnp.argmax(acc, axis=-1)
        best_w = jnp.max(acc, axis=-1)
        pick = (best_w > weight_thresh * total_inst) & (best_w > min_weight)
        return jnp.where(pick, best, 0).astype(jnp.int32)

    out = []
    n = h * w
    for s in range(0, n, chunk):
        o, d = o_all[s : s + chunk], d_all[s : s + chunk]
        npad = chunk - o.shape[0]
        if npad:
            o = jnp.pad(o, ((0, npad), (0, 0)))
            d = jnp.pad(d, ((0, npad), (0, 0)), constant_values=1.0)
        ids = render_chunk(o, d)
        out.append(np.asarray(ids[: min(chunk, n - s)]))
    return np.concatenate(out).reshape(h, w)


def write_projections(
    out_dir: str,
    inst_grid: np.ndarray,
    alpha_grid: np.ndarray,
    poses: np.ndarray,  # (V, 4, 4)
    intrinsics,
    hw,
    **kwargs,
):
    """Per-view, per-instance binary projections '<view>_<inst>.npy' +
    combined id map '<view>.npy' (the file layout match_seg consumes)."""
    os.makedirs(out_dir, exist_ok=True)
    inst_j = jnp.asarray(inst_grid)
    alpha_j = jnp.asarray(alpha_grid)
    for v in range(poses.shape[0]):
        ids = project_voxel_masks(
            inst_j, alpha_j, jnp.asarray(poses[v]), intrinsics, hw, **kwargs
        )
        np.save(os.path.join(out_dir, f"{v:04d}.npy"), ids)
        for k in np.unique(ids):
            if k <= 0:
                continue
            np.save(os.path.join(out_dir, f"{v:04d}_{k}.npy"), ids == k)
    return poses.shape[0]


def main(argv=None):
    p = argparse.ArgumentParser("project_3d_masks")
    p.add_argument("--masks_npz", required=True,
                   help="RCNN output npz with 'masks' (K, W, L, H) bools")
    p.add_argument("--features_npz", required=True,
                   help="scene features npz (for the alpha/occlusion grid)")
    p.add_argument("--scene", required=True, help="scene root with transforms.json")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--downscale", type=int, default=1)
    args = p.parse_args(argv)

    from instance_nerf_tpu.data.datasets import load_feature_grid
    from instance_nerf_tpu.data.nerf_dataset import load_nerf_scene

    det = np.load(args.masks_npz)
    masks = det["masks"]  # (K, W, L, H)
    inst = np.zeros(masks.shape[1:], np.int32)
    for k in range(masks.shape[0]):
        inst[masks[k] > 0] = k + 1
    feats = load_feature_grid(args.features_npz)
    scene = load_nerf_scene(args.scene, downscale=args.downscale)
    n = write_projections(
        args.out_dir, inst, feats[..., 3], scene.poses,
        scene.intrinsics, scene.hw,
    )
    print(f"projected {masks.shape[0]} instances over {n} views -> {args.out_dir}")


if __name__ == "__main__":
    main()
