"""End-to-end Instance-NeRF pipeline on synthetic data — all 5 stages
(README.md:43-52 parity) without 3D-FRONT:

  1. per-scene NGP training on posed images + RGBσ grid extraction
  2. NeRF-RCNN RoI-head training on the extracted features
  3. NeRF-RCNN inference -> discrete 3D instance masks
  4. 2D mask preparation: project the 3D masks per view + match_seg
     against (synthetic stand-in) panoptic segments
  5. instance-field training on the matched masks + novel-view renders

Run on CPU (tiny shapes):
  python examples/full_pipeline_synthetic.py --workdir /tmp/pipeline
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--cpu", action="store_true", default=True)
    p.add_argument("--ngp_steps", type=int, default=200)
    p.add_argument("--rcnn_steps", type=int, default=12)
    p.add_argument("--field_steps", type=int, default=300)
    args = p.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import numpy as np

    from instance_nerf_tpu.data.nerf_dataset import (
        load_nerf_scene, make_synthetic_nerf_scene, write_nerf_scene,
    )
    from instance_nerf_tpu.train.ngp_trainer import InstanceFieldTrainer, NGPConfig

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    rng = np.random.default_rng(0)

    # ---- stage 0: a synthetic "real" scene (posed images + gt) ----------
    scene, gt_boxes_unit = make_synthetic_nerf_scene(rng, n_views=6, hw=(40, 40),
                                                     n_blobs=2)
    scene_dir = os.path.join(wd, "scene")
    write_nerf_scene(scene_dir, scene, gt_boxes_unit)
    print("[0] synthetic scene:", scene_dir, flush=True)

    # ---- stage 1: NGP training + feature extraction ----------------------
    cfg = NGPConfig(n_levels=8, table_size=2 ** 14, max_res=128, hidden=32,
                    num_instances=5, n_rays=1024, n_samples=48, occ_res=32)
    field = InstanceFieldTrainer(cfg, seed=0)
    m = field.train(scene, args.ngp_steps, stage="rgb", log_every=10 ** 9)
    print(f"[1] NGP trained: psnr={m['psnr']:.1f}", flush=True)

    G = 32
    grid = field.extract_rgbsigma((G, G, G))
    print("[1] features extracted:", grid.shape, flush=True)

    # ---- stage 2: RCNN training on the extracted grid --------------------
    # (gt boxes in grid coords; rois = jittered gt like the RPN would give)
    from instance_nerf_tpu.data.synthetic import jittered_rois
    from instance_nerf_tpu.data.datasets import ngp_density_to_alpha
    import jax.numpy as jnp
    import optax

    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.models.rcnn import (
        NeRF_RCNN, select_training_samples, fastrcnn_loss, maskrcnn_loss,
        postprocess_detections, maskrcnn_inference, paste_detections, Detections,
    )

    gt_boxes = (gt_boxes_unit * G).astype(np.float32)
    feats_grid = np.concatenate(
        [grid[..., :3], ngp_density_to_alpha(grid[..., 3])[..., None]], -1
    )
    # rasterized gt instance masks in grid coords (stage-2 supervision)
    inst_grid = np.zeros((G, G, G), np.int64)
    for k, b in enumerate(gt_boxes):
        lo = np.floor(b[:3]).astype(int)
        hi = np.ceil(b[3:]).astype(int)
        inst_grid[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = k + 1
    inst_masks = np.stack([(inst_grid == k + 1) for k in range(len(gt_boxes))])
    labels = np.arange(1, len(gt_boxes) + 1)

    rois, _ = jittered_rois(rng, gt_boxes, (G, G, G), num_rois=16, noise=1.0)
    model = NeRF_RCNN(backbone=VGG_FPN(cfg="AF", input_size=160),
                      num_classes=5, input_shape=(G, G, G))
    grids_j = jnp.asarray(feats_grid)[None]
    rois_j = jnp.asarray(rois)[None]
    params = model.init(jax.random.key(0), grids_j, rois_j[:, :4], with_masks=True)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    opt = tx.init(params)

    @jax.jit
    def rcnn_step(params, opt, key):
        s = select_training_samples(
            key, rois_j, jnp.ones((1, 16), bool),
            jnp.asarray(gt_boxes)[None], jnp.asarray(labels)[None],
            jnp.ones((1, len(gt_boxes)), bool), batch_size_per_image=16,
        )

        def lf(p):
            f, lg, dl = model.apply(p, grids_j, s.rois)
            c, b = fastrcnn_loss(lg, dl, s.labels, s.reg_targets, s.valid)
            mlg = model.apply(p, f, s.rois[:, :8], method=NeRF_RCNN.mask_forward)
            ml = maskrcnn_loss(mlg[0], s.rois[0, :8], jnp.asarray(inst_masks, jnp.float32),
                               s.labels[0, :8], s.matched_gt_idx[0, :8], s.pos[0, :8])
            return c + b + ml, (c, b, ml)

        (tot, parts), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, tot

    key = jax.random.key(1)
    for i in range(args.rcnn_steps):
        key, sk = jax.random.split(key)
        params, opt, tot = rcnn_step(params, opt, sk)
    print(f"[2] RCNN trained {args.rcnn_steps} steps: loss={float(tot):.3f}", flush=True)

    # ---- stage 3: RCNN inference -> 3D masks ------------------------------
    feats, lg, dl = model.apply(params, grids_j, rois_j)
    det = postprocess_detections(lg, dl, rois_j, jnp.ones((1, 16), bool),
                                 jnp.asarray([[float(G)] * 3]), detections_per_img=4)
    det0 = Detections(*[x[0] for x in det])
    mlg = model.apply(params, feats, det.boxes, method=NeRF_RCNN.mask_forward)
    probs = maskrcnn_inference(mlg[0], det0.labels)
    masks3d = paste_detections(det0, probs, (G, G, G))
    masks_npz = os.path.join(wd, "masks.npz")
    v = np.asarray(det0.valid)
    np.savez(masks_npz, masks=np.asarray(masks3d)[v], scores=np.asarray(det0.scores)[v],
             labels=np.asarray(det0.labels)[v], boxes=np.asarray(det0.boxes)[v])
    print(f"[3] RCNN inference: {int(v.sum())} detections -> {masks_npz}", flush=True)

    # ---- stage 4: project 3D masks per view + match_seg -------------------
    from instance_nerf_tpu.masks2d.project_masks import write_projections
    from instance_nerf_tpu.masks2d.match_seg import match_view

    det_masks = np.asarray(masks3d)[v]
    det_grid = np.zeros((G, G, G), np.int32)
    for k in range(det_masks.shape[0]):
        det_grid[det_masks[k] > 0] = k + 1
    proj_dir = os.path.join(wd, "projections")
    write_projections(proj_dir, det_grid, feats_grid[..., 3], scene.poses,
                      scene.intrinsics, scene.hw)
    # stand-in panoptic segments: the gt per-view masks with shuffled ids
    matched_dir = os.path.join(wd, "masks_matched")
    os.makedirs(matched_dir, exist_ok=True)
    n_matched = 0
    for vi in range(scene.num_views):
        seg = scene.masks[vi].astype(np.int32) * 7  # arbitrary 2D ids
        ids = np.load(os.path.join(proj_dir, f"{vi:04d}.npy"))
        proj_ids = [i for i in np.unique(ids) if i > 0]
        projs = np.stack([ids == i for i in proj_ids]) if proj_ids else np.zeros((0, *ids.shape), bool)
        out = match_view(seg, projs, np.asarray(proj_ids), iou_thresh=0.05)
        np.save(os.path.join(matched_dir, f"r_{vi:03d}.npy"), out)
        n_matched += (out > 0).any()
    print(f"[4] projections + match_seg: {n_matched}/{scene.num_views} views with matches", flush=True)

    # ---- stage 5: instance field on matched masks + render ---------------
    scene_matched = load_nerf_scene(scene_dir, masks_dir=matched_dir)
    mi = field.train(scene_matched, args.field_steps, stage="instance",
                     log_every=10 ** 9)
    out = field.render_image(scene.poses[1], scene.intrinsics, scene.hw, chunk=1024)
    from instance_nerf_tpu.eval.instance_field_metrics import evaluate_instance_masks

    # score rendered ids against the matched (3D-consistent) labels
    gt_ids = np.load(os.path.join(matched_dir, "r_001.npy"))
    m5 = evaluate_instance_masks([out["instance"]], [gt_ids], iou_thresh=0.3)
    print(f"[5] instance field: CE={mi['instance']:.3f} "
          f"novel-view PQ={m5['pq']:.3f} mIoU={m5['miou']:.3f}", flush=True)

    summary = {
        "psnr": m["psnr"], "rcnn_loss": float(tot),
        "detections": int(v.sum()), "matched_views": int(n_matched),
        "instance_ce": mi["instance"], "pq": m5["pq"], "miou": m5["miou"],
    }
    with open(os.path.join(wd, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("PIPELINE OK", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
