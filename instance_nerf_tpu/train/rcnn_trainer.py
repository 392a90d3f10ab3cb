"""NeRF-RCNN trainer: RoI-head training over precomputed proposals.

Capability parity with ``nerf_rcnn/run_rcnn.py`` (SURVEY.md §2.12): loads
an RPN checkpoint, grafts its backbone, and trains backbone + RoI heads
on the SegmentationDataset's precomputed rois (``use_input_rois``) with
AdamW + OneCycle (run_rcnn.py:493-497). NOTE the reference freezes only
the (unused) *rpn_head* (run_rcnn.py:406-427); the backbone stays
TRAINABLE — ``--freeze_backbone`` (run_rcnn.py:346-348) is off in the
canonical recipe (train_rcnn.sh) and only applies to the anchor-RPN
branch. ``freeze_backbone=True`` here reproduces that optional mode via
an optax.masked optimizer (+ precomputed-FPN fast path). Evaluates 3D
box+mask mAP/AR and exports top-k masks npz per scene
(run_rcnn.py:605-726), benchmark + check_arch modes.
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
import optax

from instance_nerf_tpu.data.datasets import SegmentationDataset
from instance_nerf_tpu.eval.metrics import evaluate_map_recall
from instance_nerf_tpu.models.backbones import build_backbone
from instance_nerf_tpu.models.rcnn import (
    Detections,
    NeRF_RCNN,
    fastrcnn_loss,
    maskrcnn_inference,
    maskrcnn_loss,
    paste_detections,
    postprocess_detections,
    select_training_samples,
)
from instance_nerf_tpu.parallel.mesh import data_axis_size, make_mesh
from instance_nerf_tpu.train.checkpoints import CheckpointManager
from instance_nerf_tpu.train.train_utils import partition_optimizer

log = logging.getLogger("rcnn_trainer")


@dataclass
class RCNNConfig:
    dataset_root: str = ""
    dataset_split: str = ""
    save_path: str = ""
    rpn_ckpt: str = ""
    rcnn_ckpt: str = ""
    backbone_type: str = "vgg_EF"
    resolution: int = 160
    num_classes: int = 11  # 10 fg + background
    # compute dtype (params stay f32); bf16 is the TPU-native default
    dtype: str = "bfloat16"
    bbox_type: str = "aabb"
    batch_size: int = 4
    num_epochs: int = 200
    lr: float = 1e-3
    weight_decay: float = 1e-2
    clip_grad_norm: float = 0.1
    log_interval: int = 20
    eval_interval: int = 5
    keep_checkpoints: int = 2
    # Reference parity: the canonical recipe (train_rcnn.sh) trains the
    # backbone during RCNN training — only the unused rpn_head is frozen
    # (run_rcnn.py:406-427). True reproduces the optional
    # --freeze_backbone mode (run_rcnn.py:346-348) and enables the
    # precomputed-FPN-features fast path.
    freeze_backbone: bool = False
    # RoI head params (run_rcnn defaults)
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    fg_iou_thresh: float = 0.25
    bg_iou_thresh: float = 0.25
    box_score_thresh: float = 0.0
    box_nms_thresh: float = 0.15
    detections_per_img: int = 25
    max_rois: int = 256
    eval_rois: int = 20  # inference.sh: rois[:20]
    max_gt: int = 32
    mask_paste_threshold: float = 0.5
    seed: int = 0
    # hold decoded scenes (grid + per-instance voxel masks) in host RAM
    cache_scenes: bool = False
    # updates dispatched per device call (lax.scan); >1 amortizes the
    # ~1.3 s/dispatch axon-tunnel host overhead (BENCH_NOTES.md)
    steps_per_call: int = 1
    # upload the whole train split to HBM ONCE (grids as bf16, voxel
    # masks bit-packed — ~1.9 GB at 45 scenes @160^3/max_gt 16) and
    # gather batches by scene index on device. Without this every step
    # re-uploads ~390 MB of grids+masks; through the ~55 MB/s axon
    # tunnel that is ~20 s/step — 100x the device step time
    device_data: bool = False
    # param-only checkpoint cadence (epochs) between evals — 0 disables.
    # Long runs through the flaky axon link otherwise lose everything
    # before the first eval_interval checkpoint (observed: 8 epochs).
    save_interval: int = 0
    # rematerialize the backbone forward in the backward pass — the
    # trainable-backbone recipe at batch 4 x 160^3 otherwise holds the
    # full VGG activation pyramid through the RoI-head backward (the
    # same footprint that forced remat in the FCOS trainer)
    remat: bool = False


def make_rcnn_step_fn(model, tx, cfg, mask_slots: int,
                      precomputed_feats: bool = False):
    """Raw (traceable) RoI-head train step — shared by the single-device
    trainer (jax.jit) and the sharded SPMD wrapper
    (parallel/train_step.make_rcnn_train_step). Mirrors the reference's
    RCNN update (run_rcnn.py:505-560: sample -> heads -> cls+box+mask
    losses -> clipped AdamW; backbone trainable per train_rcnn.sh).

    ``precomputed_feats``: the ``grids`` argument is the 4-level FPN
    pyramid (tuple of (B, w, l, h, 256) arrays) instead of raw voxels —
    the frozen-backbone training path never runs the backbone (the
    reference's precomputed level_features trick, datasets.py:500-664).
    With a frozen backbone and raw grids, features are computed OUTSIDE
    the differentiated function: requires_grad=False semantics
    (run_rcnn.py:346-348) — no backbone backward, no held activations."""
    m = mask_slots

    def step(params, opt_state, key, grids, grid_sizes, rois, roi_valid,
             gt_boxes, gt_labels, gt_mask, gt_vmasks):
        k_sample, _ = jax.random.split(key)
        s = select_training_samples(
            k_sample, rois, roi_valid, gt_boxes, gt_labels, gt_mask,
            batch_size_per_image=cfg.batch_size_per_image,
            positive_fraction=cfg.positive_fraction,
            fg_iou_thresh=cfg.fg_iou_thresh,
            bg_iou_thresh=cfg.bg_iou_thresh,
        )

        def pack_one(rois_i, pos_i, labels_i, midx_i):
            # positives first (stable) into the fixed mask slots
            order = jnp.argsort(~pos_i, stable=True)[:m]
            return rois_i[order], labels_i[order], midx_i[order], pos_i[order]

        mrois, mlab, mmidx, mpos = jax.vmap(pack_one)(
            s.rois, s.pos, s.labels, s.matched_gt_idx
        )

        frozen_feats = None
        if precomputed_feats:
            frozen_feats = grids  # already the 4-level pyramid
        elif cfg.freeze_backbone:
            frozen_feats = jax.lax.stop_gradient(
                model.apply(params, grids, method=NeRF_RCNN.features))

        def feat_fn(p, g):
            return model.apply(p, g, method=NeRF_RCNN.features)

        if getattr(cfg, "remat", False):
            feat_fn = jax.checkpoint(feat_fn)

        def loss_fn(p):
            if frozen_feats is not None:
                feats = frozen_feats
            else:
                feats = feat_fn(p, grids)
            logits, deltas = model.apply(
                p, feats, s.rois, method=NeRF_RCNN.box_forward)
            cls_loss, box_loss = fastrcnn_loss(
                logits, deltas, s.labels, s.reg_targets, s.valid
            )
            mlogits = model.apply(
                p, feats, mrois, method=NeRF_RCNN.mask_forward
            )
            mloss = jnp.mean(
                jax.vmap(maskrcnn_loss)(mlogits, mrois, gt_vmasks, mlab,
                                        mmidx, mpos)
            )
            total = cls_loss + box_loss + mloss
            # train-time classification accuracy over the sampled rois —
            # the diagnostic that separates "class head never learns"
            # from "learns in-train but fails held-out" (the probes in
            # BENCH_NOTES show the path itself is correct)
            pred = jnp.argmax(logits, axis=-1)
            correct = (pred == s.labels)
            acc = jnp.sum(jnp.where(s.valid, correct, False)) / jnp.maximum(
                jnp.sum(s.valid), 1)
            fg_acc = jnp.sum(jnp.where(s.pos, correct, False)) / jnp.maximum(
                jnp.sum(s.pos), 1)
            return total, {
                "loss_classifier": cls_loss,
                "loss_box_reg": box_loss,
                "loss_mask": mloss,
                "total": total,
                "num_pos": jnp.sum(s.pos),
                "cls_acc": acc,
                "fg_cls_acc": fg_acc,
            }

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


class RCNNTrainer:
    def __init__(self, cfg: RCNNConfig):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        backbone = build_backbone(
            cfg.backbone_type, input_size=max(cfg.resolution, 160),
            dtype=dtype,
        )
        self.model = NeRF_RCNN(
            backbone=backbone,
            num_classes=cfg.num_classes,
            box_dim=8 if cfg.bbox_type == "obb" else 6,
            input_shape=(cfg.resolution,) * 3,
            dtype=dtype,
        )
        n_dev = jax.device_count()
        self.mesh = make_mesh(n_data=data_axis_size(cfg.batch_size, n_dev))
        self.params = None
        self.opt_state = None
        self.tx = None
        self.ckpt = (
            CheckpointManager(cfg.save_path, keep=cfg.keep_checkpoints,
                              best_metric="mask_mAP_25")
            if cfg.save_path else None
        )
        self.key = jax.random.key(cfg.seed)
        self._step = None
        self.mask_slots = int(cfg.batch_size_per_image * cfg.positive_fraction)

    # -- state ----------------------------------------------------------------

    def init_state(self, example_batch=None, total_steps=None):
        """``total_steps`` enables the reference's OneCycle schedule
        (run_rcnn.py:496-497: max_lr=lr over num_epochs*len(loader));
        None (benchmark/check_arch paths) keeps a constant lr."""
        cfg = self.cfg
        g = 32
        grids = jnp.zeros((1, g, g, g, 4))
        rois = jnp.asarray([[[2.0, 2, 2, 20, 20, 20]]])
        self.params = self.model.init(
            jax.random.key(cfg.seed), grids, rois, with_masks=True
        )
        if cfg.rpn_ckpt:
            # restore the RPN training state and graft its backbone params
            mgr = CheckpointManager(cfg.rpn_ckpt)
            state, meta = mgr.restore_any()
            # FCOS TrainState tuple: (params, opt_state, step)
            rpn_params = state["params"] if isinstance(state, dict) and "params" in state else state[0]
            self.params = graft_backbone(self.params, rpn_params)
            log.info("grafted backbone from RPN ckpt step=%s", meta.get("step"))
        if cfg.rcnn_ckpt:
            mgr = CheckpointManager(cfg.rcnn_ckpt)
            self.params, meta = mgr.restore(self.params)
            log.info("restored RCNN ckpt step=%s", meta.get("step"))

        from instance_nerf_tpu.parallel.train_step import make_optimizer

        base = make_optimizer(
            lr=cfg.lr, weight_decay=cfg.weight_decay,
            clip_grad_norm=cfg.clip_grad_norm, total_steps=total_steps,
        )
        if cfg.freeze_backbone:
            self.tx = partition_optimizer(
                base, self.params, frozen_prefixes=("backbone",)
            )
        else:
            self.tx = base
        self.opt_state = self.tx.init(self.params)

    # -- train ----------------------------------------------------------------

    def _make_step(self, jit_step: bool = True):
        step = make_rcnn_step_fn(self.model, self.tx, self.cfg,
                                 self.mask_slots)
        return jax.jit(step) if jit_step else step

    # -- device-resident dataset (cfg.device_data) ---------------------------

    def _build_device_store(self, ds):
        """Stack the whole train split on device: grids bf16, voxel masks
        bit-packed uint8, everything else at natural dtype. One upload,
        then batches are on-device gathers by scene index.

        Frozen backbone: the FPN pyramid is computed ONCE per scene here
        and stored INSTEAD of the raw grids (the reference's precomputed
        level_features path, datasets.py:500-664) — training then never
        touches the backbone (~37 MB/scene bf16, about the raw-grid
        footprint)."""
        cfg = self.cfg
        shape = (cfg.resolution,) * 3
        featurize = None
        if cfg.freeze_backbone:
            featurize = jax.jit(lambda p, g: self.model.apply(
                p, g, method=NeRF_RCNN.features))
        grids, sizes, gtb, gtl, gtm, vpk, rois, rm = ([] for _ in range(8))
        feats = []
        for i in range(len(ds)):
            b = ds.batch([i], shape, max_gt=cfg.max_gt,
                         max_rois=cfg.max_rois)
            # per-scene device_put keeps host peak at one scene
            g = jnp.asarray(b.grids[0], jnp.bfloat16)
            if featurize is not None:
                feats.append(featurize(self.params, g[None]))
            else:
                grids.append(g)
            sizes.append(b.grid_sizes[0])
            gtb.append(b.gt_boxes[0])
            gtl.append(b.gt_labels[0].astype(np.int32))
            gtm.append(b.gt_mask[0])
            vpk.append(jnp.asarray(np.packbits(
                b.gt_voxel_masks[0].reshape(cfg.max_gt, -1), axis=-1)))
            rois.append(b.rois[0])
            rm.append(b.roi_mask[0])
        store = {
            "grid_sizes": jnp.asarray(np.stack(sizes)),
            "rois": jnp.asarray(np.stack(rois)),
            "roi_mask": jnp.asarray(np.stack(rm)),
            "gt_boxes": jnp.asarray(np.stack(gtb)),
            "gt_labels": jnp.asarray(np.stack(gtl)),
            "gt_mask": jnp.asarray(np.stack(gtm)),
            "vmasks_packed": jnp.stack(vpk),
        }
        if featurize is not None:
            n_levels = len(feats[0])
            store["feats"] = tuple(
                jnp.concatenate([f[lv] for f in feats], axis=0)
                for lv in range(n_levels))
        else:
            store["grids"] = jnp.stack(grids)
        return store

    def _make_index_step(self, spc: int):
        """Step fed by SCENE INDICES — batch assembly is on-device gathers
        from the resident store (zero per-step host uploads). The store is
        a jit ARGUMENT: the axon remote compiler 413s on large captured
        constants (see CLAUDE.md)."""
        cfg = self.cfg
        step = make_rcnn_step_fn(self.model, self.tx, cfg, self.mask_slots,
                                 precomputed_feats=cfg.freeze_backbone)
        r = cfg.resolution
        fields = ("grid_sizes", "rois", "roi_mask", "gt_boxes",
                  "gt_labels", "gt_mask")

        def unpack(pk):  # (B, G, r^3/8) uint8 -> (B, G, r, r, r) uint8
            shifts = (7 - jnp.arange(8, dtype=jnp.uint8))
            bits = (pk[..., None] >> shifts) & jnp.uint8(1)
            return bits.reshape(pk.shape[0], pk.shape[1], r, r, r)

        def one(params, opt_state, key, idx, store):
            if cfg.freeze_backbone:
                g = tuple(jnp.take(lv, idx, axis=0) for lv in store["feats"])
            else:
                g = jnp.take(store["grids"], idx, axis=0)
            args = [jnp.take(store[f], idx, axis=0) for f in fields]
            vm = unpack(jnp.take(store["vmasks_packed"], idx, axis=0))
            return step(params, opt_state, key, g, *args, vm)

        if spc <= 1:
            return jax.jit(one)

        def scan_steps(params, opt_state, key, idxs, store):  # idxs (spc, B)
            def body(carry, idx):
                p, o, k = carry
                k, sk = jax.random.split(k)
                p, o, m = one(p, o, sk, idx, store)
                return (p, o, k), m

            (params, opt_state, _), ms = jax.lax.scan(
                body, (params, opt_state, key), idxs)
            return params, opt_state, jax.tree.map(lambda x: x[-1], ms)

        return jax.jit(scan_steps)

    def _train_loop_device(self, ds, val):
        """Epoch loop over the device-resident store: the host only draws
        the permutation and sends (spc, B) int32 scene indices."""
        cfg = self.cfg
        t_up = time.time()
        store = self._build_device_store(ds)
        jax.block_until_ready(store.get("grids", store.get("feats")))
        log.info("device store: %d scenes uploaded in %.1fs%s", len(ds),
                 time.time() - t_up,
                 " (precomputed FPN feats, frozen backbone)"
                 if "feats" in store else "")
        spc = max(1, cfg.steps_per_call)
        fn = self._make_index_step(spc)
        fn1 = fn if spc == 1 else self._make_index_step(1)
        rng = np.random.default_rng(cfg.seed)
        steps_per_epoch = max(1, len(ds) // cfg.batch_size)
        gstep = 0
        for epoch in range(cfg.num_epochs):
            order = rng.permutation(len(ds))
            if len(ds) < cfg.batch_size:  # tiny split: sample with repeats
                order = rng.integers(0, len(ds), cfg.batch_size)
            # steps_per_epoch * batch_size <= len(ds): the tail is dropped
            idxs = order[: steps_per_epoch * cfg.batch_size].reshape(
                steps_per_epoch, cfg.batch_size).astype(np.int32)
            t0 = time.time()
            sidx = 0
            while sidx < steps_per_epoch:
                k = min(spc, steps_per_epoch - sidx)
                self.key, sk = jax.random.split(self.key)
                if spc > 1 and k == spc:
                    self.params, self.opt_state, metrics = fn(
                        self.params, self.opt_state, sk,
                        jnp.asarray(idxs[sidx: sidx + k]), store)
                else:
                    for j in range(k):
                        sk, s2 = jax.random.split(sk)
                        self.params, self.opt_state, metrics = fn1(
                            self.params, self.opt_state, s2,
                            jnp.asarray(idxs[sidx + j]), store)
                # sync each dispatch (tunnel host-OOM discipline)
                float(metrics["total"])
                gstep += k
                sidx += k
                if gstep % cfg.log_interval < k:
                    mm = {kk: float(v) for kk, v in metrics.items()}
                    log.info(
                        "epoch %d step %d: total=%.4f cls=%.4f box=%.4f mask=%.4f npos=%d acc=%.3f fg_acc=%.3f (%.2fs/it)",
                        epoch, gstep, mm["total"], mm["loss_classifier"],
                        mm["loss_box_reg"], mm["loss_mask"],
                        int(mm["num_pos"]), mm.get("cls_acc", -1.0),
                        mm.get("fg_cls_acc", -1.0),
                        (time.time() - t0) / max(sidx, 1),
                    )
            if (epoch + 1) % cfg.eval_interval == 0:
                metrics = self.eval(val)
                log.info("epoch %d eval: %s", epoch, json.dumps(metrics))
                if self.ckpt:
                    self.ckpt.save(gstep, self.params, config=asdict(cfg),
                                   metrics=metrics)
            elif (self.ckpt and cfg.save_interval
                  and (epoch + 1) % cfg.save_interval == 0):
                self.ckpt.save(gstep, self.params, config=asdict(cfg))
        if self.ckpt:
            self.ckpt.save(gstep, self.params, config=asdict(cfg))

    def train_loop(self):
        cfg = self.cfg
        ds = SegmentationDataset("train", cfg.dataset_root,
                                 cfg.dataset_split or None,
                                 cache=cfg.cache_scenes)
        val = SegmentationDataset("val", cfg.dataset_root,
                                  cfg.dataset_split or None,
                                  cache=cfg.cache_scenes)
        if self.params is None:
            total_steps = cfg.num_epochs * max(1, len(ds) // cfg.batch_size)
            self.init_state(total_steps=total_steps)
        if cfg.device_data:
            return self._train_loop_device(ds, val)
        step_fn = self._make_step()
        spc = max(1, cfg.steps_per_call)
        if spc > 1:
            from instance_nerf_tpu.parallel.train_step import (
                make_rcnn_scan_step,
            )

            scan_fn = make_rcnn_scan_step(
                self.model, self.tx, cfg, spc, mask_slots=self.mask_slots)
        rng = np.random.default_rng(cfg.seed)
        steps_per_epoch = max(1, len(ds) // cfg.batch_size)
        FIELDS = ("grids", "grid_sizes", "rois", "roi_mask", "gt_boxes",
                  "gt_labels", "gt_mask", "gt_voxel_masks")

        def load_batch(idx, order):
            if len(idx) < cfg.batch_size:
                idx = np.concatenate([idx, order[: cfg.batch_size - len(idx)]])
            return ds.batch(idx, (cfg.resolution,) * 3, max_gt=cfg.max_gt,
                            max_rois=cfg.max_rois)

        gstep = 0
        for epoch in range(cfg.num_epochs):
            order = rng.permutation(len(ds))
            t0 = time.time()
            sidx = 0
            while sidx < steps_per_epoch:
                k = min(spc, steps_per_epoch - sidx)
                batches = [
                    load_batch(order[(sidx + j) * cfg.batch_size:
                                     (sidx + j + 1) * cfg.batch_size], order)
                    for j in range(k)
                ]
                self.key, sk = jax.random.split(self.key)
                if k == spc and spc > 1:
                    stacked = tuple(
                        np.stack([getattr(b, f) for b in batches])
                        for f in FIELDS)
                    self.params, self.opt_state, metrics = scan_fn(
                        self.params, self.opt_state, sk, *stacked)
                else:
                    for b in batches:
                        sk, s2 = jax.random.split(sk)
                        self.params, self.opt_state, metrics = step_fn(
                            self.params, self.opt_state, s2,
                            *(jnp.asarray(getattr(b, f)) for f in FIELDS))
                # complete this dispatch before enqueueing the next —
                # unbounded async through the tunnel retains host-staged
                # inputs and OOMs the host on long runs (see
                # fcos_trainer.train_loop)
                float(metrics["total"])
                gstep += k
                sidx += k
                if gstep % cfg.log_interval < k:
                    mm = {kk: float(v) for kk, v in metrics.items()}
                    log.info(
                        "epoch %d step %d: total=%.4f cls=%.4f box=%.4f mask=%.4f npos=%d acc=%.3f fg_acc=%.3f (%.2fs/it)",
                        epoch, gstep, mm["total"], mm["loss_classifier"],
                        mm["loss_box_reg"], mm["loss_mask"], int(mm["num_pos"]),
                        mm.get("cls_acc", -1.0), mm.get("fg_cls_acc", -1.0),
                        (time.time() - t0) / max(sidx, 1),
                    )
            if (epoch + 1) % cfg.eval_interval == 0:
                metrics = self.eval(val)
                log.info("epoch %d eval: %s", epoch, json.dumps(metrics))
                if self.ckpt:
                    self.ckpt.save(gstep, self.params, config=asdict(cfg),
                                   metrics=metrics)
            elif (self.ckpt and cfg.save_interval
                  and (epoch + 1) % cfg.save_interval == 0):
                self.ckpt.save(gstep, self.params, config=asdict(cfg))
        if self.ckpt:
            self.ckpt.save(gstep, self.params, config=asdict(cfg))

    # -- eval -----------------------------------------------------------------

    def _predict_jit(self, with_masks: bool, grid_shape):
        """Jitted box+mask inference; cached per (with_masks, grid shape)
        because the mask-paste output shape is the (static) full grid."""
        cfg = self.cfg
        key = (with_masks, tuple(grid_shape))
        cache = getattr(self, "_predict_fns", None)
        if cache is None:
            cache = self._predict_fns = {}
        if key not in cache:
            w, l, h = grid_shape

            @jax.jit
            def f(params, grids, rois_j, sizes):
                p = rois_j.shape[1]
                feats, logits, deltas = self.model.apply(params, grids, rois_j)
                det = postprocess_detections(
                    logits, deltas, rois_j, jnp.ones((1, p), bool), sizes,
                    score_thresh=cfg.box_score_thresh,
                    nms_thresh=cfg.box_nms_thresh,
                    detections_per_img=cfg.detections_per_img,
                )
                det0 = Detections(*[x[0] for x in det])
                masks = None
                if with_masks:
                    mlogits = self.model.apply(
                        params, feats, det.boxes, method=NeRF_RCNN.mask_forward
                    )
                    probs = maskrcnn_inference(mlogits[0], det0.labels)
                    masks = paste_detections(det0, probs, (w, l, h),
                                             cfg.mask_paste_threshold)
                return det0, masks

            cache[key] = f
        return cache[key]

    def predict_scene(self, grid, rois, with_masks=True):
        """One scene: rois (P, 6) -> Detections + full-grid masks."""
        cfg = self.cfg
        w, l, h = grid.shape[:3]
        grids = jnp.asarray(grid)[None]
        p = min(rois.shape[0], cfg.eval_rois)
        rois_j = jnp.asarray(rois[:p])[None]
        sizes = jnp.asarray([[float(w), float(l), float(h)]])
        f = self._predict_jit(with_masks, (w, l, h))
        return f(self.params, grids, rois_j, sizes)

    def eval(self, dataset: SegmentationDataset, save_masks_path=None):
        cfg = self.cfg
        pb, ps, pl, gb, gl = [], [], [], [], []
        pm, gm = [], []
        for i in range(len(dataset)):
            d = dataset.load_scene(i)
            det, masks = self.predict_scene(d["grid"], d["rois"])
            v = np.asarray(det.valid)
            pb.append(np.asarray(det.boxes)[v])
            ps.append(np.asarray(det.scores)[v])
            pl.append(np.asarray(det.labels)[v])
            pm.append(np.asarray(masks)[v])
            gb.append(d["boxes"] if d["boxes"] is not None else np.zeros((0, 6)))
            gl.append(d["class_ids"] if d["class_ids"] is not None else np.zeros(0))
            gm.append(d["masks"] if d["masks"] is not None else
                      np.zeros((0, *d["grid"].shape[:3])))
            if save_masks_path:
                os.makedirs(save_masks_path, exist_ok=True)
                np.savez_compressed(
                    os.path.join(save_masks_path, d["scene"] + ".npz"),
                    masks=np.asarray(masks)[v], scores=np.asarray(det.scores)[v],
                    labels=np.asarray(det.labels)[v], boxes=np.asarray(det.boxes)[v],
                )

        def nmean(x):
            x = np.asarray(x[1:], np.float64)
            return float(np.nanmean(x)) if x.size and not np.isnan(x).all() else 0.0

        out = {}
        for thr in (0.25, 0.5):
            ap, rec = evaluate_map_recall(pb, ps, pl, gb, gl, iou_thresh=thr)
            out[f"box_mAP_{int(thr*100)}"] = nmean(ap)
            out[f"box_AR_{int(thr*100)}"] = nmean(rec)
            ap_m, rec_m = evaluate_map_recall(pm, ps, pl, gm, gl,
                                              iou_thresh=thr, iou_type="mask")
            out[f"mask_mAP_{int(thr*100)}"] = nmean(ap_m)
            out[f"mask_AR_{int(thr*100)}"] = nmean(rec_m)
            if thr == 0.25:  # per-class breakdown: which classes drag mAP
                out["box_AP_25_per_class"] = [
                    None if np.isnan(x) else round(float(x), 4)
                    for x in np.asarray(ap[1:], np.float64)]
        return out

    # -- misc -----------------------------------------------------------------

    def check_arch(self, grid_size=64):
        """Smoke forward on random input (ref: run_rcnn.py:219-238)."""
        if self.params is None:
            self.init_state()
        rng = np.random.default_rng(0)
        grid = rng.uniform(0, 1, (grid_size,) * 3 + (4,)).astype(np.float32)
        rois, _ = _random_rois(rng, grid_size, 8)
        det, masks = self.predict_scene(grid, rois)
        return {
            "detections": int(np.asarray(det.valid).sum()),
            "mask_shape": list(np.asarray(masks).shape),
        }

    def benchmark(self, reps=50, shape=(200, 200, 130)):
        if self.params is None:
            self.init_state()
        from instance_nerf_tpu.utils.profiling import chained_latency_ms

        rng = np.random.default_rng(0)
        grid = rng.uniform(0, 1, (*shape, 4)).astype(np.float32)
        rois, _ = _random_rois(rng, min(shape), self.cfg.eval_rois)
        grids = jnp.asarray(grid)[None]
        rois_j = jnp.asarray(rois)[None]
        sizes = jnp.asarray([[float(s) for s in shape]])
        predict = self._predict_jit(True, shape)

        @jax.jit
        def step(c, params, g, r, sz):
            det0, masks = predict(params, g + c * 0, r, sz)
            probe = jnp.sum(det0.scores) + jnp.sum(masks[:1, :1, :1, :1])
            return c + probe.astype(jnp.float32) * 0 + 1

        t0 = time.perf_counter()
        mean = chained_latency_ms(
            step, (self.params, grids, rois_j, sizes), reps=min(reps, 50)
        )
        return {
            "mean_ms": float(mean),
            "std_ms": 0.0,
            "compile_s": time.perf_counter() - t0,
        }

    def benchmark_train_step(self, reps=3, shape=(160, 160, 160), batch=1,
                             scan_len=8):
        """Device latency of the RoI-head train step (sample + fwd + bwd
        + adamw): ``scan_len`` steps inside ONE jitted lax.scan so host
        dispatch overhead through the axon tunnel can't contaminate it."""
        cfg = self.cfg
        if self.params is None:
            self.init_state()
        raw_step = self._make_step(jit_step=False)
        rng = np.random.default_rng(0)
        g = min(shape)
        grids = jnp.asarray(
            rng.uniform(0, 1, (batch, *shape, 4)), jnp.float32
        )
        sizes = jnp.tile(jnp.asarray([[float(s) for s in shape]]), (batch, 1))
        rois = jnp.asarray(
            np.stack([_random_rois(rng, g, cfg.max_rois)[0] for _ in range(batch)])
        )
        gt = jnp.asarray(
            np.stack([_random_rois(rng, g, cfg.max_gt)[0] for _ in range(batch)])
        )
        gt_labels = jnp.asarray(
            rng.integers(1, cfg.num_classes, (batch, cfg.max_gt)), jnp.int32
        )
        vmasks = jnp.asarray(
            rng.uniform(0, 1, (batch, cfg.max_gt, *shape)) < 0.1, jnp.uint8
        )
        valid = jnp.ones((batch, cfg.max_rois), bool)
        gt_mask = jnp.ones((batch, cfg.max_gt), bool)

        @jax.jit
        def run(params, opt_state, key, *batch_args):
            def body(carry, _):
                p, o, k = carry
                k, sk = jax.random.split(k)
                p, o, metrics = raw_step(p, o, sk, *batch_args)
                return (p, o, k), metrics["total"]

            (_, _, _), totals = jax.lax.scan(
                body, (params, opt_state, key), None, length=scan_len
            )
            return totals[-1]

        # big arrays as jit ARGUMENTS (the axon remote compiler rejects
        # large captured constants)
        batch_args = (grids, sizes, rois, valid, gt, gt_labels, gt_mask,
                      vmasks)
        t0 = time.perf_counter()
        tot = run(self.params, self.opt_state, jax.random.key(0), *batch_args)
        float(tot)  # compile + settle
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            tot = run(self.params, self.opt_state, jax.random.key(0),
                      *batch_args)
        float(tot)
        mean = (time.perf_counter() - t0) / (reps * scan_len) * 1000
        out = {"mean_ms": float(mean), "compile_s": compile_s}
        try:  # compile-time peak HBM + MFU (VERDICT r3 #7); best-effort
            from instance_nerf_tpu.utils.hbm import compiled_step_stats

            st = compiled_step_stats(
                run, self.params, self.opt_state, jax.random.key(0),
                *batch_args, steps_per_call=scan_len, step_ms=mean)
            out.update({k: st[k] for k in
                        ("peak_hbm_gib", "tflops_per_step",
                         "achieved_tflops", "mfu") if k in st})
        except Exception:  # pragma: no cover - analysis API drift
            log.info("compiled_step_stats unavailable", exc_info=True)
        return out


def _random_rois(rng, grid_size, n):
    lo = rng.uniform(0, grid_size * 0.6, (n, 3))
    hi = lo + rng.uniform(grid_size * 0.1, grid_size * 0.4, (n, 3))
    return np.concatenate([lo, np.minimum(hi, grid_size)], 1).astype(np.float32), None


def graft_backbone(dst_params, src_params):
    """Copy backbone params from an RPN checkpoint into the RCNN tree."""
    import flax

    dst = flax.core.unfreeze(dst_params) if hasattr(flax.core, "unfreeze") else dict(dst_params)
    src_bb = src_params["params"]["backbone"]
    dst["params"]["backbone"] = src_bb
    return dst
