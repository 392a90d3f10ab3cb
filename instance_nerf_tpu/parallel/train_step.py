"""Sharded training steps (pjit-style: jit + NamedSharding annotations).

The reference's trainer loop (AdamW + OneCycleLR + grad clip + DDP
allreduce, run_fcos.py:322-381) becomes one jitted SPMD step: params
replicated, batch sharded over the mesh, gradients summed by GSPMD.
Because the loss is written over the *global* batch, the FCOS
``reduce_sum`` normalizations (loss.py:202-208) need no explicit
collective here — ``jnp.sum`` over a sharded array IS the psum.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from instance_nerf_tpu.models.fcos import fcos_loss, padding_mask
from instance_nerf_tpu.parallel.mesh import (
    data_sharding,
    grid_sharding,
    replicated,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    lr: float = 3e-4,
    weight_decay: float = 1e-3,
    clip_grad_norm: float = 0.1,
    total_steps: int | None = None,
    pct_start: float = 0.3,
):
    """AdamW + grad-clip (+ OneCycle when total_steps given), matching the
    reference trainer's recipe (run_fcos.py:322-327)."""
    if total_steps and total_steps >= 4:
        sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=lr, pct_start=pct_start
        )
    else:
        # optax's onecycle emits NaN for transition_steps <= 2 (the
        # warmup segment divides by pct_start*steps-1 == 0); tiny runs
        # (smoke tests, micro-benchmarks) fall back to constant lr
        sched = lr
    return optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.adamw(learning_rate=sched, weight_decay=weight_decay),
    )


def init_fcos_state(model, tx, example_grids, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.key(0)
    params = model.init(rng, example_grids)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_fcos_train_step(
    model,
    tx,
    mesh=None,
    reg_loss_weight: float = 1.0,
    center_sampling_radius: float = 1.5,
    iou_loss_type: str = "iou",
    use_obb: bool = False,
    use_additional_l1_loss: bool = False,
    proj2d_loss_weight: float = 0.0,
    jit_step: bool = True,
    remat: bool = False,
):
    """Returns jitted ``step(state, grids, grid_sizes, gt_boxes, gt_mask)
    -> (state, metrics)``. With a mesh, inputs are annotated so the scene
    batch rides the ``data`` axis and grids shard spatially on ``sp``.
    ``jit_step=False`` returns the raw traceable step (for wrapping in
    ``lax.scan`` — multi-step dispatch amortizes host overhead).
    ``remat=True`` rematerializes the backbone+head forward in the
    backward pass (trades ~1/3 more FLOPs for activation memory — lets
    batch 4 x 160^3 fit a single v5e chip)."""

    def apply_fn(params, grids):
        return model.apply(params, grids, train=True)

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def step(state: TrainState, grids, grid_sizes, gt_boxes, gt_mask):
        def loss_fn(params):
            info, logits, reg, ctr, _ = apply_fn(params, grids)
            pm = padding_mask(info, grid_sizes)
            losses = fcos_loss(
                info, logits, reg, ctr, gt_boxes, gt_mask,
                pad_mask=pm,
                center_sampling_radius=center_sampling_radius,
                iou_loss_type=iou_loss_type,
                use_obb=use_obb,
                use_additional_l1_loss=use_additional_l1_loss,
                proj2d_loss_weight=proj2d_loss_weight,
            )
            total = (
                losses["loss_cls"]
                + reg_loss_weight * losses["loss_reg"]
                + losses["loss_centerness"]
            )
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses, total=total)
        return TrainState(params, opt_state, state.step + 1), metrics

    if not jit_step:
        return step
    if mesh is None:
        return jax.jit(step)

    gs = grid_sharding(mesh)
    ds = data_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, gs, ds, ds, ds),
        out_shardings=(rep, rep),
    )


def make_fcos_scan_step(
    model, tx, n_steps: int, mesh=None, **step_kwargs
):
    """K FCOS updates per dispatch under ``lax.scan`` over stacked
    batches (K, B, ...). Through the axon tunnel each dispatch costs
    ~1.3 s of host overhead (BENCH_NOTES.md) — the scan amortizes it
    K-fold; on a pod host it likewise hides per-step launch latency.
    Metrics returned are the LAST step's (matching the per-step loop's
    logging semantics).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from instance_nerf_tpu.parallel.mesh import DATA_AXES

    step = make_fcos_train_step(model, tx, mesh=None, jit_step=False,
                                **step_kwargs)

    def scan_steps(state, grids, grid_sizes, gt_boxes, gt_mask):
        def body(st, xs):
            return step(st, *xs)

        state, ms = jax.lax.scan(
            body, state, (grids, grid_sizes, gt_boxes, gt_mask),
            length=n_steps)
        return state, jax.tree.map(lambda x: x[-1], ms)

    if mesh is None:
        return jax.jit(scan_steps)
    gs = NamedSharding(mesh, P(None, DATA_AXES, "sp", None, None, None))
    ds = NamedSharding(mesh, P(None, DATA_AXES))
    rep = replicated(mesh)
    return jax.jit(
        scan_steps,
        in_shardings=(rep, gs, ds, ds, ds),
        out_shardings=(rep, rep),
    )


def make_rpn_train_step(model, tx, cfg, mesh=None, jit_step: bool = True):
    """Sharded anchor-RPN train step — the reference trains the anchor RPN
    with DDP too (run_rpn.py ``mp.spawn`` + NCCL, train_rpn.sh); here the
    scene batch rides ``dcn x data``, grids shard spatially on ``sp``
    (conv halo exchanges inserted by GSPMD), params replicate and the
    gradient all-reduce is implicit. Signature matches the single-device
    trainer closure: ``step(state, key, grids, grid_sizes, gt_boxes,
    gt_mask) -> (state, losses)`` with ``state = (params, opt_state, it)``.

    ``cfg`` is an ``RPNConfig`` (train/rpn_trainer.py) — only its loss /
    anchor-matching fields are read.
    """
    from instance_nerf_tpu.models.rpn import anchor_padding_mask, rpn_loss

    def step(state, key, grids, grid_sizes, gt_boxes, gt_mask):
        params, opt_state, it = state

        def loss_fn(p):
            obj, reg, anchors_l, _ = model.apply(p, grids)
            anchors = jnp.concatenate(anchors_l)
            pad = anchor_padding_mask(anchors_l, grid_sizes,
                                      tuple(cfg.fpn_strides))
            losses = rpn_loss(
                key, obj, reg, anchors, gt_boxes, gt_mask,
                batch_size_per_mesh=cfg.batch_size_per_mesh,
                positive_fraction=cfg.positive_fraction,
                fg_iou_thresh=cfg.fg_iou_thresh,
                bg_iou_thresh=cfg.bg_iou_thresh,
                pad_mask=pad,
                rotated=cfg.rotated_bbox,
                reg_loss_type=cfg.reg_loss_type,
                max_mesh_dim=cfg.resolution,
                proj2d=cfg.proj2d_loss_weight > 0,
            )
            total = losses["loss_objectness"] + losses["loss_rpn_box_reg"]
            if cfg.proj2d_loss_weight > 0:
                total = total + cfg.proj2d_loss_weight * losses["loss_rpn_box_reg_2d"]
            losses["total"] = total
            return total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, it + 1), losses

    if not jit_step:
        return step
    if mesh is None:
        return jax.jit(step)
    gs = grid_sharding(mesh)
    ds = data_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, gs, ds, ds, ds),
        out_shardings=(rep, rep),
    )


def make_rcnn_train_step(model, tx, cfg, mesh, mask_slots: int | None = None):
    """Sharded RoI-head train step — the reference trains RCNN with DDP
    over 4 GPUs, bs 16 (run_rcnn.py:755-826 ``mp.spawn`` + NCCL +
    DistributedSampler); here the scene batch shards over ``dcn x data``
    and GSPMD inserts the gradient all-reduce. Params (incl. the frozen
    backbone) replicate; the RoIAlign gathers stay local because grids
    shard only on the batch axis (the reference's DDP semantic — no
    spatial partitioning of the feature volume inside the RoI heads).

    Returns jitted ``step(params, opt_state, key, grids, grid_sizes,
    rois, roi_valid, gt_boxes, gt_labels, gt_mask, gt_vmasks) ->
    (params, opt_state, metrics)`` — the same signature the single-device
    trainer jits, so grad parity is testable leaf-for-leaf.
    """
    from instance_nerf_tpu.train.rcnn_trainer import make_rcnn_step_fn

    if mask_slots is None:
        mask_slots = int(cfg.batch_size_per_image * cfg.positive_fraction)
    step = make_rcnn_step_fn(model, tx, cfg, mask_slots)
    ds = data_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep) + (ds,) * 8,
        out_shardings=(rep, rep, rep),
    )


def make_rcnn_scan_step(model, tx, cfg, n_steps: int, mesh=None,
                        mask_slots: int | None = None):
    """K RoI-head updates per dispatch (lax.scan over stacked (K, B, ...)
    batches); same amortization rationale as ``make_fcos_scan_step``.
    ``step(params, opt_state, key, *stacked8) -> (params, opt_state,
    last_metrics)`` — the key is split per scanned step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from instance_nerf_tpu.parallel.mesh import DATA_AXES
    from instance_nerf_tpu.train.rcnn_trainer import make_rcnn_step_fn

    if mask_slots is None:
        mask_slots = int(cfg.batch_size_per_image * cfg.positive_fraction)
    step = make_rcnn_step_fn(model, tx, cfg, mask_slots)

    def scan_steps(params, opt_state, key, *stacked):
        keys = jax.random.split(key, n_steps)

        def body(carry, xs):
            params, opt_state = carry
            k, *args = xs
            params, opt_state, metrics = step(params, opt_state, k, *args)
            return (params, opt_state), metrics

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), (keys, *stacked), length=n_steps)
        return params, opt_state, jax.tree.map(lambda x: x[-1], ms)

    if mesh is None:
        return jax.jit(scan_steps)
    ds = NamedSharding(mesh, P(None, DATA_AXES))
    rep = replicated(mesh)
    return jax.jit(
        scan_steps,
        in_shardings=(rep, rep, rep) + (ds,) * 8,
        out_shardings=(rep, rep, rep),
    )
