"""Anchor-RPN trainer: train/eval/benchmark + RPN->RCNN export bridge.

Capability parity with ``nerf_rcnn/run_rpn.py`` (SURVEY.md §2.12):
anchor-based RPN training/eval; ``--save_results`` exports per-scene
proposals (+ level indices) npz and FPN level features — the files the
RCNN SegmentationDataset consumes as ``rois/`` (run_rpn.py:485-505);
``--output_voxel_scores`` dumps per-voxel objectness per level
(run_rpn.py:476-480); ``--output_proposals`` with TP/FP filtering
(run_rpn.py:432-453).
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import asdict, dataclass

import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.data.datasets import RPNDataset, read_split
from instance_nerf_tpu.eval.metrics import (
    evaluate_box_proposals_ap,
    evaluate_box_proposals_recall,
)
from instance_nerf_tpu.models.backbones import build_backbone
from instance_nerf_tpu.models.rpn import (
    AnchorGenerator3D,
    NeRFRegionProposalNetwork,
    anchor_padding_mask,
    filter_proposals,
)
from instance_nerf_tpu.eval.metrics import box_iou_3d_np
from instance_nerf_tpu.parallel.mesh import data_axis_size, make_mesh
from instance_nerf_tpu.train.checkpoints import CheckpointManager
from instance_nerf_tpu.parallel.train_step import (
    make_optimizer,
    make_rpn_train_step,
)

log = logging.getLogger("rpn_trainer")


@dataclass
class RPNConfig:
    features_path: str = ""
    boxes_path: str = ""
    dataset_split: str = ""
    save_path: str = ""
    checkpoint: str = ""
    backbone_type: str = "vgg_EF"
    resolution: int = 160
    normalize_density: bool = True
    rotated_bbox: bool = False
    batch_size: int = 4
    num_epochs: int = 160
    lr: float = 3e-4
    weight_decay: float = 1e-3
    clip_grad_norm: float = 0.1
    log_interval: int = 30
    eval_interval: int = 4
    keep_checkpoints: int = 2
    # compute dtype (params stay f32); bf16 is the TPU-native default
    dtype: str = "bfloat16"
    # rpn specifics (nerf_rpn.py:70-86 defaults)
    conv_depth: int = 4
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_mesh: int = 256
    positive_fraction: float = 0.5
    pre_nms_top_n: int = 1000
    post_nms_top_n: int = 1000
    nms_thresh: float = 0.7
    score_thresh: float = 0.0
    reg_loss_type: str = "smooth_l1"
    proj2d_loss_weight: float = 1.0
    flip_prob: float = 0.5
    rotate_prob: float = 0.5
    rot_scale_prob: float = 0.0
    max_gt: int = 64
    fpn_strides: tuple = (4, 8, 16, 32)
    resume: bool = False
    seed: int = 0


class RPNTrainer:
    def __init__(self, cfg: RPNConfig):
        self.cfg = cfg
        self.gen = AnchorGenerator3D()
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        backbone = build_backbone(
            cfg.backbone_type, input_size=max(cfg.resolution, 160),
            dtype=dtype,
        )
        self.model = NeRFRegionProposalNetwork(
            backbone=backbone,
            anchor_generator=self.gen,
            conv_depth=cfg.conv_depth,
            rotated=cfg.rotated_bbox,
            fpn_strides=tuple(cfg.fpn_strides),
            dtype=dtype,
        )
        self.mesh = make_mesh(
            n_data=data_axis_size(cfg.batch_size, jax.device_count())
        )
        self.tx = None
        self.state = None
        self.ckpt = (
            CheckpointManager(cfg.save_path, keep=cfg.keep_checkpoints,
                              best_metric="recall_50")
            if cfg.save_path else None
        )
        self.key = jax.random.key(cfg.seed)

    def make_dataset(self, mode: str) -> RPNDataset:
        cfg = self.cfg
        scene_list = read_split(cfg.dataset_split, mode) if cfg.dataset_split else None
        aug = mode == "train"
        return RPNDataset(
            features_path=cfg.features_path,
            boxes_path=cfg.boxes_path or None,
            scene_list=scene_list,
            normalize_density=cfg.normalize_density,
            flip_prob=cfg.flip_prob if aug else 0.0,
            rotate_prob=cfg.rotate_prob if aug else 0.0,
            rot_scale_prob=cfg.rot_scale_prob if aug else 0.0,
            seed=cfg.seed,
        )

    def init_state(self, total_steps=None):
        cfg = self.cfg
        self.tx = make_optimizer(
            lr=cfg.lr, weight_decay=cfg.weight_decay,
            clip_grad_norm=cfg.clip_grad_norm, total_steps=total_steps,
        )
        example = jnp.zeros((1, 32, 32, 32, 4))
        params = self.model.init(jax.random.key(cfg.seed), example)
        self.state = (params, self.tx.init(params), jnp.zeros((), jnp.int32))
        if cfg.checkpoint:
            # template-free restore: the eval-time optimizer tree can
            # differ from the training one (schedule state), and eval
            # only needs params anyway
            mgr = CheckpointManager(cfg.checkpoint)
            state, meta = mgr.restore_any()
            restored = state["params"] if isinstance(state, dict) and "params" in state else state[0]
            self.state = (restored, self.state[1], self.state[2])
            log.info("restored rpn ckpt step=%s", meta.get("step"))

    def _make_step(self):
        # SPMD when the mesh spans >1 device (reference: DDP run_rpn.py);
        # plain jit otherwise — identical math either way
        # (test_rpn_sharded_step_matches_single_device)
        mesh = self.mesh if self.mesh.devices.size > 1 else None
        return make_rpn_train_step(self.model, self.tx, self.cfg, mesh=mesh)

    def train_loop(self):
        cfg = self.cfg
        ds = self.make_dataset("train")
        val = self.make_dataset("val") if cfg.dataset_split else None
        steps_per_epoch = max(1, len(ds) // cfg.batch_size)
        self.init_state(total_steps=steps_per_epoch * cfg.num_epochs)
        start_epoch = 0
        if cfg.resume and self.ckpt and self.ckpt.latest_step() is not None:
            self.state, meta = self.ckpt.restore(self.state)
            start_epoch = min(meta.get("step", 0) // steps_per_epoch,
                              cfg.num_epochs)
            log.info("resumed at step %s (epoch %d)", meta.get("step"), start_epoch)
        step_fn = self._make_step()
        rng = np.random.default_rng(cfg.seed)
        gstep = start_epoch * steps_per_epoch
        pad_shape = (cfg.resolution,) * 3
        for epoch in range(start_epoch, cfg.num_epochs):
            order = rng.permutation(len(ds))
            t0 = time.time()
            for s in range(steps_per_epoch):
                idx = order[s * cfg.batch_size : (s + 1) * cfg.batch_size]
                if len(idx) < cfg.batch_size:
                    idx = np.concatenate([idx, order[: cfg.batch_size - len(idx)]])
                b = ds.batch(idx, pad_shape, max_gt=cfg.max_gt,
                             box_dim=7 if cfg.rotated_bbox else 6, augment=True)
                self.key, sk = jax.random.split(self.key)
                self.state, losses = step_fn(
                    self.state, sk, jnp.asarray(b.grids),
                    jnp.asarray(b.grid_sizes), jnp.asarray(b.gt_boxes),
                    jnp.asarray(b.gt_mask),
                )
                gstep += 1
                if gstep % cfg.log_interval == 0:
                    mm = {k: float(v) for k, v in losses.items()}
                    log.info("epoch %d step %d: %s (%.2fs/it)", epoch, gstep,
                             " ".join(f"{k}={v:.4f}" for k, v in mm.items()),
                             (time.time() - t0) / (s + 1))
            if val and (epoch + 1) % cfg.eval_interval == 0:
                m = self.eval(val)
                log.info("epoch %d eval: %s", epoch, json.dumps(m))
                if self.ckpt:
                    self.ckpt.save(gstep, self.state, config=asdict(cfg), metrics=m)
        if self.ckpt:
            self.ckpt.save(gstep, self.state, config=asdict(cfg))

    # -- inference/export -----------------------------------------------------

    def _predict_jit(self):
        """Jitted forward + proposal filtering, shape-cached by jax.jit
        (eager apply on the axon platform is minutes per scene)."""
        if getattr(self, "_predict_fn", None) is None:
            cfg = self.cfg

            @jax.jit
            def f(params, padded, sizes):
                obj, reg, anchors_l, feats = self.model.apply(params, padded)
                pm = anchor_padding_mask(anchors_l, sizes, cfg.fpn_strides)
                props = filter_proposals(
                    obj, reg, anchors_l, sizes,
                    pre_nms_top_n=cfg.pre_nms_top_n,
                    post_nms_top_n=cfg.post_nms_top_n,
                    nms_thresh=cfg.nms_thresh,
                    score_thresh=cfg.score_thresh,
                    pad_mask=pm,
                    rotated=cfg.rotated_bbox,
                )
                return props, feats, obj

            self._predict_fn = f
        return self._predict_fn

    def predict_scene(self, grid: np.ndarray):
        w, l, h = grid.shape[:3]
        pad = lambda v: max(32, int(np.ceil(v / 32)) * 32)
        padded = np.zeros((1, pad(w), pad(l), pad(h), grid.shape[-1]), np.float32)
        padded[0, :w, :l, :h] = grid
        props, feats, obj = self._predict_jit()(
            self.state[0], jnp.asarray(padded),
            jnp.asarray([[w, l, h]], jnp.float32),
        )
        v = np.asarray(props.valid[0])
        return (
            np.asarray(props.boxes[0])[v],
            np.asarray(props.scores[0])[v],
            np.asarray(props.level_ids[0])[v],
            [np.asarray(f[0]) for f in feats],
            obj,
        )

    def eval(self, dataset: RPNDataset, save_results_path=None,
             output_proposals=False, filter_mode="none", filter_threshold=0.7,
             output_voxel_scores=False):
        cfg = self.cfg
        proposals, scores, gts = [], [], []
        for i in range(len(dataset)):
            scene, grid, boxes = dataset.get(i)
            b, s, lvl, feats, obj = self.predict_scene(grid)
            gt = boxes if boxes is not None else np.zeros((0, 6))
            out_b, out_s, out_l = b, s, lvl
            if output_proposals and filter_mode != "none" and gt.shape[0]:
                iou = box_iou_3d_np(out_b[:, :6], gt).max(axis=1) if out_b.size else np.zeros(0)
                keep = iou >= filter_threshold if filter_mode == "tp" else iou < filter_threshold
                out_b, out_s, out_l = out_b[keep], out_s[keep], out_l[keep]
            proposals.append(b)
            scores.append(s)
            gts.append(gt)
            if save_results_path:
                os.makedirs(os.path.join(save_results_path, "rois"), exist_ok=True)
                np.savez(
                    os.path.join(save_results_path, "rois", scene + ".npz"),
                    proposals=out_b, level_indices=out_l, scores=out_s,
                )
                os.makedirs(os.path.join(save_results_path, "level_features"),
                            exist_ok=True)
                np.savez_compressed(
                    os.path.join(save_results_path, "level_features", scene + ".npz"),
                    **{f"level_{k}": f for k, f in enumerate(feats)},
                    resolution=np.asarray(grid.shape[:3]),
                )
            if output_voxel_scores and save_results_path:
                os.makedirs(os.path.join(save_results_path, "voxel_scores"),
                            exist_ok=True)
                self._dump_voxel_scores(
                    os.path.join(save_results_path, "voxel_scores", scene + ".npz"),
                    obj, grid.shape[:3], feats,
                )

        out = {}
        for limit in (300, 1000, None):
            tag = limit if limit else "all"
            for thr in (0.25, 0.5):
                r = evaluate_box_proposals_recall(
                    proposals, scores, gts, thresholds=[thr], limit=limit
                )
                out[f"recall_{int(thr*100)}_top{tag}"] = float(r["recalls"][0])
        out["recall_50"] = out["recall_50_topall"]
        out["recall_25"] = out["recall_25_topall"]
        out["ar"] = float(evaluate_box_proposals_recall(proposals, scores, gts)["ar"])
        for thr in (0.25, 0.5):
            out[f"ap_{int(thr*100)}"] = float(
                evaluate_box_proposals_ap(proposals, scores, gts, iou_thresh=thr)["ap"]
            )
        return out

    def _dump_voxel_scores(self, path, obj, grid_shape, feats):
        """Per-voxel sigmoid objectness, max over anchors, per level
        (ref: rpn.py:538-549)."""
        cfg = self.cfg
        a = self.gen.num_anchors_per_location()[0]
        out = {}
        offset = 0
        for lvl, f in enumerate(feats):
            wl, ll, hl = f.shape[:3]
            n = wl * ll * hl * a
            sig = jax.nn.sigmoid(obj[0, offset : offset + n])
            sig = np.asarray(sig).reshape(wl, ll, hl, a).max(axis=-1)
            stride = cfg.fpn_strides[lvl]
            lim = [int(np.ceil(d / stride)) for d in grid_shape]
            out[str(lvl)] = sig[: lim[0], : lim[1], : lim[2]]
            offset += n
        np.savez_compressed(path, **out)

    def benchmark(self, reps=50, shape=(200, 200, 130)):
        from instance_nerf_tpu.utils.profiling import chained_latency_ms

        if self.state is None:
            self.init_state()
        rng = np.random.default_rng(0)
        grid = rng.uniform(0, 1, (*shape, 4)).astype(np.float32)
        pad = lambda v: max(32, int(np.ceil(v / 32)) * 32)
        padded = np.zeros((1, pad(shape[0]), pad(shape[1]), pad(shape[2]), 4),
                          np.float32)
        padded[0, : shape[0], : shape[1], : shape[2]] = grid
        sizes = jnp.asarray([[float(s) for s in shape]], jnp.float32)
        predict = self._predict_jit()

        @jax.jit
        def step(c, params, g, sz):
            props, _, obj = predict(params, g + c * 0, sz)
            probe = jnp.sum(props.scores) + jnp.sum(obj)
            return c + probe.astype(jnp.float32) * 0 + 1

        mean = chained_latency_ms(
            step, (self.state[0], jnp.asarray(padded), sizes),
            reps=min(reps, 50),
        )
        return {"mean_ms": float(mean), "std_ms": 0.0}
