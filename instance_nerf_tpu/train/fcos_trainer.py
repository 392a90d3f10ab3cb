"""FCOS-RPN trainer: train/eval/benchmark (ref: run_fcos.py Trainer).

One jitted SPMD train step over a (data, sp) mesh replaces the
reference's per-GPU DDP workers; eval runs the fixed-shape postprocessor
per scene and scores Recall/AP with the numpy metrics; benchmark mode
reproduces the reference's dummy-input latency harness
(run_fcos.py:551-575) with jax profiling semantics (block_until_ready).
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import asdict, dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.data.datasets import RPNDataset, read_split
from instance_nerf_tpu.eval.metrics import (
    evaluate_box_proposals_ap,
    evaluate_box_proposals_recall,
)
from instance_nerf_tpu.models.backbones import build_backbone
from instance_nerf_tpu.models.fcos import FCOSOverNeRF, fcos_postprocess
from instance_nerf_tpu.parallel.mesh import make_mesh, shard_batch
from instance_nerf_tpu.parallel.train_step import (
    TrainState,
    init_fcos_state,
    make_fcos_train_step,
    make_optimizer,
)
from instance_nerf_tpu.train.checkpoints import CheckpointManager

log = logging.getLogger("fcos_trainer")


@dataclass
class FCOSConfig:
    # data
    features_path: str = ""
    boxes_path: str = ""
    dataset_split: str = ""
    save_path: str = ""
    checkpoint: str = ""
    resolution: int = 160
    normalize_density: bool = True
    # model
    backbone_type: str = "vgg_EF"
    input_dim: int = 4
    # compute dtype for backbone/head matmuls+convs (params stay f32;
    # losses promote to f32). bfloat16 is the TPU-native default — the
    # MXU runs bf16 at 2x f32 and the reference's f32-on-GPU recipe has
    # no bf16-hostile numerics (GN-normalized activations, focal loss)
    dtype: str = "bfloat16"
    rotated_bbox: bool = False
    num_convs: int = 4
    norm_reg_targets: bool = True
    centerness_on_reg: bool = True
    conv_at_start: bool = False
    # train
    batch_size: int = 4
    num_epochs: int = 160
    lr: float = 3e-4
    reg_loss_weight: float = 1.0
    weight_decay: float = 1e-3
    clip_grad_norm: float = 0.1
    log_interval: int = 20
    eval_interval: int = 4
    keep_checkpoints: int = 2
    center_sampling_radius: float = 1.5
    iou_loss_type: str = "iou"
    use_additional_l1_loss: bool = False
    proj2d_loss_weight: float = 0.0
    # augmentation
    flip_prob: float = 0.5
    rotate_prob: float = 0.5
    rot_scale_prob: float = 0.0
    # inference
    pre_nms_top_n: int = 2500
    fpn_post_nms_top_n: int = 2500
    nms_thresh: float = 0.3
    pre_nms_thresh: float = 0.0
    min_size: float = 0.0
    ap_top_n: int | None = None
    # resume training from save_path's latest checkpoint (restores
    # optimizer/schedule/step, ref: run_rcnn.py:499-511)
    resume: bool = False
    # parallel
    n_spatial: int = 1
    max_gt: int = 64
    # rematerialize the backbone forward in backward (activation memory
    # for FLOPs; needed for batch 4 x 160^3 on one v5e chip)
    remat: bool = False
    # updates dispatched per device call (lax.scan); >1 amortizes the
    # ~1.3 s/dispatch axon-tunnel host overhead (BENCH_NOTES.md)
    steps_per_call: int = 1
    # checkpoint cadence decoupled from eval (epochs); 0 = only at
    # eval/end. Long runs with eval disabled MUST set this or a crash
    # loses everything (the 320-epoch OBB run died at epoch 309 with
    # zero saves)
    save_interval: int = 0
    # max epochs trained by ONE train_loop() call (0 = to num_epochs,
    # negative = restore/init only, train nothing): drivers chunk long
    # runs into train -> eval -> write-partial-results cycles so a queue
    # timeout costs one chunk, not the whole run (VERDICT r3: the
    # 160-epoch OBB result was zeroed by its own timeout because eval
    # JSON was only written at run end)
    stop_after_epochs: int = 0
    fpn_strides: tuple = (4, 8, 16, 32)
    seed: int = 0
    # hold decoded grids in host RAM (one decompress per scene instead of
    # one per epoch — the single-core host is the data bottleneck)
    preload: bool = False
    # upload the whole train split to HBM once (grids bf16) and gather
    # batches by scene index on device; flip/rot90 augmentation runs
    # on-device (rot_scale_prob must be 0 — that resample is host-only).
    # Kills the per-step grid upload (~130 MB/step at bs 2 x 160^3 —
    # ~10-20 s/step through the axon tunnel)
    device_data: bool = False


def device_augment(key, g, size, boxes, flip_p: float, rot_p: float,
                   obb: bool):
    """On-device mirror of ``augment_rpn_inputs`` (rot90 -> flip W ->
    flip L) for ONE padded scene. Flips/rotations act on the padded cube,
    then the content (extent ``size``, zero padding) is rolled back to
    the origin. rot_scale (trilinear resample) stays host-only.

    g (W, L, H, 4) with W == L; size (3,) f32; boxes (K, 6|7).
    """
    kr, kw, kl = jax.random.split(key, 3)
    s0 = size[0].astype(jnp.int32)
    s1 = size[1].astype(jnp.int32)

    def roll(x, extent, axis):
        return jnp.roll(x, extent - x.shape[axis], axis=axis)

    # --- rot90 about z: swap W/L then flip the new W (augment.py:13-25)
    do_r = jax.random.uniform(kr) < rot_p
    g_r = roll(jnp.flip(jnp.swapaxes(g, 0, 1), axis=0), s1, 0)
    b_r = boxes[:, [1, 0, 2, 4, 3, 5]] if not obb else jnp.concatenate(
        [boxes[:, [1, 0, 2, 4, 3, 5]], boxes[:, 6:]], axis=-1)
    if obb:
        b_r = b_r.at[:, 0].set(size[1] - b_r[:, 0])
    else:
        new0 = size[1] - b_r[:, 3]
        new3 = size[1] - b_r[:, 0]
        b_r = b_r.at[:, 0].set(new0).at[:, 3].set(new3)
    g = jnp.where(do_r, g_r, g)
    boxes = jnp.where(do_r, b_r, boxes)
    size = jnp.where(do_r, size[jnp.asarray([1, 0, 2])], size)
    s0 = size[0].astype(jnp.int32)
    s1 = size[1].astype(jnp.int32)

    # --- per-axis flips (augment.py:27-38)
    for axis, k, ext in ((0, kw, s0), (1, kl, s1)):
        do_f = jax.random.uniform(k) < flip_p
        g_f = roll(jnp.flip(g, axis=axis), ext, axis)
        extf = ext.astype(boxes.dtype)
        if obb:
            b_f = boxes.at[:, axis].set(extf - boxes[:, axis])
            b_f = b_f.at[:, 6].set(-b_f[:, 6])
        else:
            lo = extf - boxes[:, axis + 3]
            hi = extf - boxes[:, axis]
            b_f = boxes.at[:, axis].set(lo).at[:, axis + 3].set(hi)
        g = jnp.where(do_f, g_f, g)
        boxes = jnp.where(do_f, b_f, boxes)
    return g, size, boxes


class FCOSTrainer:
    def __init__(self, cfg: FCOSConfig):
        self.cfg = cfg
        # Always use the stride-4 stem (the shipped geometry): the
        # reference's <160 stride-1 stem variant leaves level 0 at full
        # grid resolution (feature_extractor.py:331-343) while declaring
        # strides [4,8,16,32] anyway (run_fcos.py:156) — both wrong
        # geometry and ~100x head FLOPs. The stride-1 stem stays
        # available via build_backbone(input_size=...) directly.
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        backbone = build_backbone(
            cfg.backbone_type,
            input_size=max(cfg.resolution, 160),
            in_channels=cfg.input_dim,
            conv_at_start=cfg.conv_at_start,
            dtype=dtype,
        )
        self.model = FCOSOverNeRF(
            backbone=backbone,
            fpn_strides=tuple(cfg.fpn_strides),
            num_convs=cfg.num_convs,
            norm_reg_targets=cfg.norm_reg_targets,
            centerness_on_reg=cfg.centerness_on_reg,
            use_obb=cfg.rotated_bbox,
            dtype=dtype,
        )
        n_dev = jax.device_count()
        n_sp = min(cfg.n_spatial, n_dev)
        from instance_nerf_tpu.parallel.mesh import data_axis_size

        n_data = data_axis_size(cfg.batch_size, max(1, n_dev // n_sp))
        self.mesh = make_mesh(n_data=n_data, n_spatial=n_sp)
        self.tx = None
        self.state: TrainState | None = None
        self.ckpt = (
            CheckpointManager(
                cfg.save_path, keep=cfg.keep_checkpoints, best_metric="recall_50"
            )
            if cfg.save_path
            else None
        )
        self._pad_shape = (cfg.resolution,) * 3

    # -- data ---------------------------------------------------------------

    def make_dataset(self, mode: str) -> RPNDataset:
        cfg = self.cfg
        scene_list = None
        if cfg.dataset_split:
            scene_list = read_split(cfg.dataset_split, mode)
        aug = mode == "train"
        return RPNDataset(
            features_path=cfg.features_path,
            boxes_path=cfg.boxes_path or None,
            scene_list=scene_list,
            normalize_density=cfg.normalize_density,
            flip_prob=cfg.flip_prob if aug else 0.0,
            rotate_prob=cfg.rotate_prob if aug else 0.0,
            rot_scale_prob=cfg.rot_scale_prob if aug else 0.0,
            preload=cfg.preload,
            seed=cfg.seed,
        )

    # -- state --------------------------------------------------------------

    def init_state(self, total_steps: int | None = None):
        cfg = self.cfg
        self.tx = make_optimizer(
            lr=cfg.lr,
            weight_decay=cfg.weight_decay,
            clip_grad_norm=cfg.clip_grad_norm,
            total_steps=total_steps,
        )
        example = jnp.zeros((1, 32, 32, 32, cfg.input_dim))
        self.state = init_fcos_state(
            self.model, self.tx, example, jax.random.key(cfg.seed)
        )
        if cfg.checkpoint:
            # template-free: eval-time optimizer trees differ (schedule
            # state); only params are needed to continue or evaluate
            mgr = CheckpointManager(cfg.checkpoint)
            state, meta = mgr.restore_any()
            restored = state["params"] if isinstance(state, dict) and "params" in state else state[0]
            self.state = TrainState(restored, self.state.opt_state, self.state.step)
            log.info("restored checkpoint step=%s", meta.get("step"))

    # -- train --------------------------------------------------------------

    # -- device-resident dataset (cfg.device_data) ---------------------------

    def _build_device_store(self, ds):
        cfg = self.cfg
        bd = 7 if cfg.rotated_bbox else 6
        grids, sizes, gt, gtm = [], [], [], []
        for i in range(len(ds)):
            b = ds.batch([i], self._pad_shape, max_gt=cfg.max_gt,
                         box_dim=bd, augment=False)
            grids.append(jnp.asarray(b.grids[0], jnp.bfloat16))
            sizes.append(b.grid_sizes[0])
            gt.append(b.gt_boxes[0])
            gtm.append(b.gt_mask[0])
        return {
            "grids": jnp.stack(grids),
            "grid_sizes": jnp.asarray(np.stack(sizes)),
            "gt_boxes": jnp.asarray(np.stack(gt)),
            "gt_mask": jnp.asarray(np.stack(gtm)),
        }

    def _make_index_step(self, spc: int, step_kw: dict):
        cfg = self.cfg
        assert cfg.rot_scale_prob == 0.0, (
            "device_data cannot replicate the host-side rotate+scale "
            "resample; set rot_scale_prob=0 or device_data=False"
        )
        raw = make_fcos_train_step(self.model, self.tx, mesh=None,
                                   jit_step=False, **step_kw)
        obb = cfg.rotated_bbox

        # `store` is a jit ARGUMENT, not a closure capture: the axon
        # remote compiler rejects HTTP bodies with large embedded
        # constants (observed 413 at 16x160^3 grids), and arguments
        # also dodge re-tracing per store identity.
        def one(state, key, idx, store):
            g = jnp.take(store["grids"], idx, axis=0)
            s = jnp.take(store["grid_sizes"], idx, axis=0)
            bx = jnp.take(store["gt_boxes"], idx, axis=0)
            m = jnp.take(store["gt_mask"], idx, axis=0)
            keys = jax.random.split(key, idx.shape[0])
            g, s, bx = jax.vmap(
                lambda k_, g_, s_, b_: device_augment(
                    k_, g_, s_, b_, cfg.flip_prob, cfg.rotate_prob, obb)
            )(keys, g, s, bx)
            return raw(state, g, s, bx, m)

        if spc <= 1:
            return jax.jit(one)

        def scan_steps(state, key, idxs, store):  # (spc, B)
            def body(carry, idx):
                st, k = carry
                k, sk = jax.random.split(k)
                st, metrics = one(st, sk, idx, store)
                return (st, k), metrics

            (state, _), ms = jax.lax.scan(body, (state, key), idxs)
            return state, jax.tree.map(lambda x: x[-1], ms)

        return jax.jit(scan_steps)

    def _train_loop_device(self, train_ds, val_ds, step_kw, start_epoch,
                           steps_per_epoch):
        cfg = self.cfg
        t_up = time.time()
        store = self._build_device_store(train_ds)
        jax.block_until_ready(store["grids"])
        log.info("device store: %d scenes uploaded in %.1fs", len(train_ds),
                 time.time() - t_up)
        spc = max(1, cfg.steps_per_call)
        fn = self._make_index_step(spc, step_kw)
        fn1 = fn if spc == 1 else self._make_index_step(1, step_kw)
        rng = np.random.default_rng(cfg.seed + start_epoch)
        key = jax.random.key(cfg.seed + 17 + start_epoch)
        gstep = start_epoch * steps_per_epoch
        end_epoch = cfg.num_epochs
        if cfg.stop_after_epochs:
            end_epoch = min(end_epoch,
                            start_epoch + max(0, cfg.stop_after_epochs))
        for epoch in range(start_epoch, end_epoch):
            order = rng.permutation(len(train_ds))
            n_used = steps_per_epoch * cfg.batch_size
            if n_used > len(order):  # len(ds) < batch_size: wrap
                order = np.tile(order, -(-n_used // len(order)))
            idxs = order[:n_used].reshape(
                steps_per_epoch, cfg.batch_size).astype(np.int32)
            t0 = time.time()
            s = 0
            while s < steps_per_epoch:
                k = min(spc, steps_per_epoch - s)
                key, sk = jax.random.split(key)
                if spc > 1 and k == spc:
                    self.state, metrics = fn(self.state, sk,
                                             jnp.asarray(idxs[s: s + k]),
                                             store)
                else:
                    for j in range(k):
                        sk, s2 = jax.random.split(sk)
                        self.state, metrics = fn1(self.state, s2,
                                                  jnp.asarray(idxs[s + j]),
                                                  store)
                float(metrics["total"])  # sync (tunnel host-OOM discipline)
                gstep += k
                s += k
                if gstep % cfg.log_interval < k:
                    m = {kk: float(v) for kk, v in metrics.items()}
                    log.info(
                        "epoch %d step %d: total=%.4f cls=%.4f reg=%.4f ctr=%.4f (%.2fs/it)",
                        epoch, gstep, m["total"], m["loss_cls"],
                        m["loss_reg"], m["loss_centerness"],
                        (time.time() - t0) / max(s, 1),
                    )
            if val_ds and (epoch + 1) % cfg.eval_interval == 0:
                metrics = self.eval(val_ds)
                log.info("epoch %d eval: %s", epoch, json.dumps(metrics))
                if self.ckpt:
                    self.ckpt.save(gstep, self.state,
                                   config=asdict(self.cfg), metrics=metrics)
            elif self.ckpt and ((epoch + 1) % cfg.eval_interval == 0
                                or (cfg.save_interval and
                                    (epoch + 1) % cfg.save_interval == 0)):
                self.ckpt.save(gstep, self.state, config=asdict(self.cfg))
        if self.ckpt:
            self.ckpt.save(gstep, self.state, config=asdict(self.cfg))

    def train_loop(self):
        cfg = self.cfg
        train_ds = self.make_dataset("train")
        val_ds = self.make_dataset("val") if cfg.dataset_split else None
        steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
        total_steps = steps_per_epoch * cfg.num_epochs
        self.init_state(total_steps=total_steps)
        start_epoch = 0
        if cfg.resume and self.ckpt and self.ckpt.latest_step() is not None:
            # same config + total_steps -> identical optimizer tree, so a
            # full templated restore (params + opt + step) is valid
            self.state, meta = self.ckpt.restore(self.state)
            start_epoch = min(meta.get("step", 0) // steps_per_epoch,
                              cfg.num_epochs)
            log.info("resumed at step %s (epoch %d)", meta.get("step"), start_epoch)

        step_kw = dict(
            reg_loss_weight=cfg.reg_loss_weight,
            center_sampling_radius=cfg.center_sampling_radius,
            iou_loss_type=cfg.iou_loss_type,
            use_obb=cfg.rotated_bbox,
            use_additional_l1_loss=cfg.use_additional_l1_loss,
            proj2d_loss_weight=cfg.proj2d_loss_weight,
            remat=cfg.remat,
        )
        if cfg.device_data:
            return self._train_loop_device(train_ds, val_ds, step_kw,
                                           start_epoch, steps_per_epoch)
        spc = max(1, cfg.steps_per_call)
        if spc > 1:
            from instance_nerf_tpu.parallel.train_step import (
                make_fcos_scan_step,
            )

            scan_fn = make_fcos_scan_step(
                self.model, self.tx, spc, mesh=self.mesh, **step_kw)
        step_fn = make_fcos_train_step(
            self.model, self.tx, mesh=self.mesh, **step_kw)

        def load_batch(idx, order):
            if len(idx) < cfg.batch_size:  # pad the last partial batch
                idx = np.concatenate([idx, order[: cfg.batch_size - len(idx)]])
            return train_ds.batch(
                idx, self._pad_shape, max_gt=cfg.max_gt,
                box_dim=7 if cfg.rotated_bbox else 6, augment=True,
            )

        rng = np.random.default_rng(cfg.seed)
        gstep = start_epoch * steps_per_epoch
        end_epoch = cfg.num_epochs
        if cfg.stop_after_epochs:
            end_epoch = min(end_epoch,
                            start_epoch + max(0, cfg.stop_after_epochs))
        for epoch in range(start_epoch, end_epoch):
            order = rng.permutation(len(train_ds))
            t0 = time.time()
            s = 0
            while s < steps_per_epoch:
                k = min(spc, steps_per_epoch - s)
                batches = [
                    load_batch(
                        order[(s + j) * cfg.batch_size:
                              (s + j + 1) * cfg.batch_size], order)
                    for j in range(k)
                ]
                with self.mesh:
                    if k == spc and spc > 1:
                        # host arrays go straight to the jitted scan —
                        # its in_shardings place the (K, B, ...) stack
                        # (shard_batch would misread K as the batch dim)
                        stacked = tuple(
                            np.stack([getattr(b, f) for b in batches])
                            for f in ("grids", "grid_sizes", "gt_boxes",
                                      "gt_mask"))
                        self.state, metrics = scan_fn(self.state, *stacked)
                    else:
                        for b in batches:
                            args = shard_batch(
                                self.mesh,
                                (b.grids, b.grid_sizes, b.gt_boxes,
                                 b.gt_mask))
                            self.state, metrics = step_fn(self.state, *args)
                # fetch one scalar: completes this dispatch before the
                # next is enqueued. Without it the async stream through
                # the axon tunnel retains each dispatch's host-staged
                # inputs (4 x 128^3-grid stacks = ~0.5 GB each) and a
                # multi-hour run OOMs the HOST (observed: 130 GB RSS)
                float(metrics["total"])
                gstep += k
                s += k
                if gstep % cfg.log_interval < k:
                    m = {kk: float(v) for kk, v in metrics.items()}
                    log.info(
                        "epoch %d step %d: total=%.4f cls=%.4f reg=%.4f ctr=%.4f (%.2fs/it)",
                        epoch, gstep, m["total"], m["loss_cls"],
                        m["loss_reg"], m["loss_centerness"],
                        (time.time() - t0) / max(s, 1),
                    )

            if val_ds and (epoch + 1) % cfg.eval_interval == 0:
                metrics = self.eval(val_ds)
                log.info("epoch %d eval: %s", epoch, json.dumps(metrics))
                if self.ckpt:
                    self.ckpt.save(gstep, self.state, config=asdict(self.cfg),
                                   metrics=metrics)
            elif self.ckpt and (epoch + 1) % cfg.eval_interval == 0:
                self.ckpt.save(gstep, self.state, config=asdict(self.cfg))
            elif (self.ckpt and cfg.save_interval
                  and (epoch + 1) % cfg.save_interval == 0):
                self.ckpt.save(gstep, self.state, config=asdict(self.cfg))
        if self.ckpt:
            self.ckpt.save(gstep, self.state, config=asdict(self.cfg))

    # -- eval ---------------------------------------------------------------

    def _predict_jit(self):
        """Jitted forward+postprocess, cached per padded shape by jax.jit —
        the default axon platform runs unjitted apply op-by-op through the
        tunnel (minutes per scene)."""
        if getattr(self, "_predict_fn", None) is None:
            cfg = self.cfg
            from instance_nerf_tpu.models.fcos import padding_mask

            @jax.jit
            def f(params, padded, sizes):
                info, logits, reg, ctr, _ = self.model.apply(
                    params, padded, train=False
                )
                return fcos_postprocess(
                    info, logits, reg, ctr, sizes,
                    num_levels=len(cfg.fpn_strides),
                    pre_nms_thresh=cfg.pre_nms_thresh,
                    pre_nms_top_n=cfg.pre_nms_top_n,
                    nms_thresh=cfg.nms_thresh,
                    fpn_post_nms_top_n=cfg.fpn_post_nms_top_n,
                    min_size=cfg.min_size,
                    pad_mask=padding_mask(info, sizes),
                    use_obb=cfg.rotated_bbox,
                )

            self._predict_fn = f
        return self._predict_fn

    def predict_scene(self, grid: np.ndarray):
        """Proposals for one scene grid (W, L, H, 4)."""
        w, l, h = grid.shape[:3]

        def pad_up(v):
            return max(32, int(np.ceil(v / 32)) * 32)

        pw, pl, ph = pad_up(w), pad_up(l), pad_up(h)
        padded = np.zeros((1, pw, pl, ph, grid.shape[-1]), np.float32)
        padded[0, :w, :l, :h] = grid
        props = self._predict_jit()(
            self.state.params, jnp.asarray(padded),
            jnp.asarray([[w, l, h]], jnp.float32),
        )
        valid = np.asarray(props.valid[0])
        return (
            np.asarray(props.boxes[0])[valid],
            np.asarray(props.scores[0])[valid],
            np.asarray(props.level_ids[0])[valid],
        )

    def dump_voxel_scores(self, grid: np.ndarray, out_path: str):
        """Per-voxel sqrt(cls*centerness) per level, cropped to the grid
        (ref: fcos.py:267-279 output_objectness)."""
        cfg = self.cfg
        w, l, h = grid.shape[:3]
        pad = lambda v: max(32, int(np.ceil(v / 32)) * 32)
        padded = np.zeros((1, pad(w), pad(l), pad(h), grid.shape[-1]), np.float32)
        padded[0, :w, :l, :h] = grid
        if getattr(self, "_voxel_fn", None) is None:

            @jax.jit
            def voxel_fn(params, g):
                info, logits, reg, ctr, feats = self.model.apply(
                    params, g, train=False
                )
                del info, reg, feats
                return jnp.sqrt(
                    jnp.clip(jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctr), 0, 1)
                )

            self._voxel_fn = voxel_fn
        score = np.asarray(self._voxel_fn(self.state.params, jnp.asarray(padded)))[0]
        out, offset = {}, 0
        for lvl, stride_l in enumerate(cfg.fpn_strides):
            wl, ll, hl = (padded.shape[1 + a] // stride_l for a in range(3))
            n = wl * ll * hl
            s = score[offset : offset + n].reshape(wl, ll, hl)
            lim = [int(np.ceil(d / stride_l)) for d in (w, l, h)]
            out[str(lvl)] = s[: lim[0], : lim[1], : lim[2]]
            offset += n
        np.savez_compressed(out_path, **out)

    def eval(self, dataset: RPNDataset, save_results_path: str | None = None,
             output_voxel_scores: bool = False,
             filter_mode: str = "none", filter_threshold: float = 0.7):
        from instance_nerf_tpu.eval.metrics import box_iou_3d_np

        proposals, scores, gts = [], [], []
        for i in range(len(dataset)):
            scene, grid, boxes = dataset.get(i)
            b, s, lvl = self.predict_scene(grid)
            if output_voxel_scores and save_results_path:
                vs_dir = os.path.join(save_results_path, "voxel_scores")
                os.makedirs(vs_dir, exist_ok=True)
                self.dump_voxel_scores(grid, os.path.join(vs_dir, scene + ".npz"))
            # TP/FP-filtered proposal export (ref: run_fcos.py:59-66,
            # run_rpn.py:432-453)
            out_b, out_s, out_l = b, s, lvl
            if filter_mode != "none" and boxes is not None and boxes.shape[0]:
                iou = (box_iou_3d_np(out_b[:, :6], boxes).max(axis=1)
                       if out_b.size else np.zeros(0))
                keep = (iou >= filter_threshold if filter_mode == "tp"
                        else iou < filter_threshold)
                out_b, out_s, out_l = out_b[keep], out_s[keep], out_l[keep]
            proposals.append(b)
            scores.append(s)
            gts.append(boxes if boxes is not None else np.zeros((0, 6)))
            if save_results_path:
                os.makedirs(os.path.join(save_results_path, "proposals"), exist_ok=True)
                np.savez(
                    os.path.join(save_results_path, "proposals", scene + ".npz"),
                    proposals=out_b, scores=out_s, level_indices=out_l,
                )

        out = {}
        for limit in (300, 1000, None):
            tag = limit if limit else "all"
            r25 = evaluate_box_proposals_recall(
                proposals, scores, gts, thresholds=[0.25], limit=limit
            )
            r50 = evaluate_box_proposals_recall(
                proposals, scores, gts, thresholds=[0.5], limit=limit
            )
            out[f"recall_25_top{tag}"] = float(r25["recalls"][0])
            out[f"recall_50_top{tag}"] = float(r50["recalls"][0])
        out["recall_25"] = out["recall_25_topall"]
        out["recall_50"] = out["recall_50_topall"]
        ar = evaluate_box_proposals_recall(proposals, scores, gts)
        out["ar"] = float(ar["ar"])
        for thr in (0.25, 0.5):
            ap = evaluate_box_proposals_ap(
                proposals, scores, gts, iou_thresh=thr, top_k=self.cfg.ap_top_n
            )
            out[f"ap_{int(thr*100)}"] = float(ap["ap"])
        return out

    # -- benchmark ----------------------------------------------------------

    def benchmark(self, reps: int = 300, shape=(160, 160, 160)):
        """Latency on a dummy grid (ref: run_fcos.py:551-575)."""
        if self.state is None:
            self.init_state()
        grid = np.random.default_rng(0).uniform(0, 1, (*shape, 4)).astype(np.float32)

        from instance_nerf_tpu.utils.profiling import chained_latency_ms

        @jax.jit
        def fwd(c, p, g):
            _, logits, reg, ctr, _ = self.model.apply(p, g + c * 0, train=False)
            probe = (jnp.sum(logits) + jnp.sum(reg) + jnp.sum(ctr))
            return c + probe.astype(jnp.float32) * 0 + 1

        g = jnp.asarray(grid)[None]
        mean = chained_latency_ms(
            fwd, (self.state.params, g), reps=min(reps, 50)
        )
        return {"mean_ms": float(mean), "std_ms": 0.0}

    def benchmark_train_step(self, reps=3, shape=(160, 160, 160), batch=1,
                             scan_len=10):
        """Device latency of the full FCOS train step (fwd + bwd + adamw)
        on a synthetic batch: ``scan_len`` steps run inside ONE jitted
        ``lax.scan`` dispatch, so per-call host/tunnel overhead (which
        dwarfs device time through the axon remote-PJRT tunnel — measured
        ~1.3 s/call at 160^3) cannot contaminate the number."""
        cfg = self.cfg
        if self.state is None:
            self.init_state()
        raw_step = make_fcos_train_step(
            self.model, self.tx,
            reg_loss_weight=cfg.reg_loss_weight,
            center_sampling_radius=cfg.center_sampling_radius,
            iou_loss_type=cfg.iou_loss_type, use_obb=cfg.rotated_bbox,
            use_additional_l1_loss=cfg.use_additional_l1_loss,
            proj2d_loss_weight=cfg.proj2d_loss_weight,
            jit_step=False,
        )
        rng = np.random.default_rng(0)
        grids = jnp.asarray(
            rng.uniform(0, 1, (batch, *shape, cfg.input_dim)), jnp.float32
        )
        sizes = jnp.tile(jnp.asarray([[float(s) for s in shape]]), (batch, 1))
        box_dim = 7 if cfg.rotated_bbox else 6
        lo = rng.uniform(0, min(shape) * 0.6, (batch, cfg.max_gt, 3))
        ext = rng.uniform(min(shape) * 0.1, min(shape) * 0.35,
                          (batch, cfg.max_gt, 3))
        boxes = np.concatenate([lo, np.minimum(lo + ext, min(shape))], -1)
        if box_dim == 7:
            theta = rng.uniform(-np.pi / 2, np.pi / 2, (batch, cfg.max_gt, 1))
            boxes = np.concatenate([boxes, theta], -1)
        gt_boxes = jnp.asarray(boxes, jnp.float32)
        gt_mask = jnp.ones((batch, cfg.max_gt), bool)

        @jax.jit
        def run(state, grids, sizes, gt_boxes, gt_mask):
            # big arrays arrive as jit ARGUMENTS (axon remote compiler
            # rejects large captured constants)
            def body(s, _):
                s2, metrics = raw_step(s, grids, sizes, gt_boxes, gt_mask)
                return s2, metrics["total"]

            state, totals = jax.lax.scan(body, state, None, length=scan_len)
            return totals[-1]

        t0 = time.perf_counter()
        tot = run(self.state, grids, sizes, gt_boxes, gt_mask)
        float(tot)  # compile + settle
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            tot = run(self.state, grids, sizes, gt_boxes, gt_mask)
        float(tot)
        mean = (time.perf_counter() - t0) / (reps * scan_len) * 1000
        out = {"mean_ms": float(mean), "compile_s": compile_s}
        try:  # compile-time peak HBM + MFU (VERDICT r3 #7); best-effort
            from instance_nerf_tpu.utils.hbm import compiled_step_stats

            st = compiled_step_stats(
                run, self.state, grids, sizes, gt_boxes, gt_mask,
                steps_per_call=scan_len, step_ms=mean)
            out.update({k: st[k] for k in
                        ("peak_hbm_gib", "tflops_per_step",
                         "achieved_tflops", "mfu") if k in st})
        except Exception:  # pragma: no cover - analysis API drift
            log.info("compiled_step_stats unavailable", exc_info=True)
        return out


