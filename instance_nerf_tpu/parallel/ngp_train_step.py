"""Sharded instance-field training step (rays over the data axis).

BASELINE.json config #5: instance fields trained with rays sharded
across the mesh. Rays are embarrassingly parallel — the batch shards on
``data``, params/occupancy replicate, and the global-mean losses give
GSPMD the gradient all-reduce over ICI for free.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from instance_nerf_tpu.models.fast_encode import mask_to_instance_head
from instance_nerf_tpu.models.render import OccupancyGrid, render_rays
from instance_nerf_tpu.parallel.mesh import data_sharding, replicated


class NGPTrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_sharded_ngp_step(
    model_apply,
    tx,
    mesh,
    n_samples: int = 128,
    k_occupied: int | None = None,
    occ_threshold: float = 0.01,
    stage: str = "rgb",
    instance_fg_weight: float = 5.0,
    occ_coarse_res: int | None = None,
    k_buckets: tuple | None = None,
    fuse_buckets: bool = True,
    stratified: bool = True,
    ray_jitter: bool = False,
    bg_acc_weight: float = 0.0,
):
    """Returns jitted ``step(state, occ_grid, key, o, d, rgb, inst) ->
    (state, metrics)`` with ray arrays sharded over ``data``.

    ``k_buckets``: adaptive-K routing composed with ray sharding via
    ``shard_map`` — every shard sorts ITS OWN rays by occupancy hits and
    buckets them locally, so the routing adds ZERO collectives (under
    plain GSPMD the global ``argsort`` over the sharded ray axis would
    gather). Per-shard routing is exact: bucketing only chooses which K
    each ray gets, and the bucket fractions apply per shard. Losses
    reduce with in-body ``psum`` (partial sums), so gradients see the
    same global mean as the unsharded step.
    """
    ray_axes = ("dcn", "data")

    def _losses(out, target_rgb, target_inst):
        """Partial loss sums (psum-able and exact for global means)."""
        se = jnp.sum((out.rgb - target_rgb) ** 2)
        cnt = jnp.float32(target_rgb.size)
        ce_w = w_sum = jnp.float32(0)
        if stage != "rgb":
            valid = target_inst >= 0
            logp = jax.nn.log_softmax(out.instance_logits, axis=-1)
            ce = -jnp.take_along_axis(
                logp, jnp.clip(target_inst, 0)[:, None], axis=-1
            )[:, 0]
            w = jnp.where(target_inst > 0, instance_fg_weight, 1.0)
            w = jnp.where(valid, w, 0.0)
            ce_w = jnp.sum(ce * w)
            w_sum = jnp.sum(w)
        bg_sum = bg_cnt = jnp.float32(0)
        if stage != "instance" and bg_acc_weight > 0:
            # background-transparency pressure (see NGPConfig
            # .bg_acc_weight): acc^2 on GT-background rays
            is_bg = target_inst == 0
            bg_sum = jnp.sum(jnp.where(is_bg, out.acc ** 2, 0.0))
            bg_cnt = jnp.sum(is_bg).astype(jnp.float32)
        return se, cnt, ce_w, w_sum, bg_sum, bg_cnt

    def _metrics(se, cnt, ce_w, w_sum, bg_sum, bg_cnt):
        rgb_loss = se / cnt
        total = rgb_loss if stage != "instance" else 0.0
        metrics = {"rgb": rgb_loss}
        if stage != "rgb":
            inst = ce_w / jnp.maximum(w_sum, 1)
            metrics["instance"] = inst
            total = total + inst
        if stage != "instance" and bg_acc_weight > 0:
            bg = bg_sum / jnp.maximum(bg_cnt, 1)
            metrics["bg_acc"] = bg
            total = total + bg_acc_weight * bg
        metrics["total"] = total
        return total, metrics

    def step(state, occ_grid, key, o, d, target_rgb, target_inst):
        def loss_fn(p):
            if k_buckets:
                from jax.sharding import PartitionSpec as P

                def local(p_, occ_grid_, o_l, d_l, rgb_l, inst_l):
                    # per-shard RNG: fold both ray-sharding axes in
                    k2 = jax.random.fold_in(
                        key, jax.lax.axis_index("dcn"))
                    k2 = jax.random.fold_in(
                        k2, jax.lax.axis_index("data"))
                    occ = OccupancyGrid(occ_grid_, occ_threshold)
                    out = render_rays(
                        model_apply, p_, k2, o_l, d_l,
                        n_samples=n_samples, occ=occ,
                        with_instance=stage != "rgb",
                        k_occupied=k_occupied,
                        occ_coarse_res=occ_coarse_res,
                        k_buckets=k_buckets, fuse_buckets=fuse_buckets,
                        stratified=stratified, ray_jitter=ray_jitter,
                    )
                    parts = _losses(out, rgb_l, inst_l)
                    return tuple(
                        jax.lax.psum(x, ray_axes) for x in parts)

                sums = jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(), P(ray_axes), P(ray_axes),
                              P(ray_axes), P(ray_axes)),
                    out_specs=P(),
                )(p, occ_grid, o, d, target_rgb, target_inst)
                return _metrics(*sums)

            occ = OccupancyGrid(occ_grid, occ_threshold)
            out = render_rays(
                model_apply, p, key, o, d,
                n_samples=n_samples, occ=occ,
                with_instance=stage != "rgb",
                k_occupied=k_occupied,
                occ_coarse_res=occ_coarse_res,
                stratified=stratified, ray_jitter=ray_jitter,
            )
            return _metrics(*_losses(out, target_rgb, target_inst))

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if stage == "instance":
            # frozen-NeRF instance training: see mask_to_instance_head.
            grads = mask_to_instance_head(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if stage == "instance":
            updates = mask_to_instance_head(updates)
        params = optax.apply_updates(state.params, updates)
        return NGPTrainState(params, opt_state), metrics

    ray_sh = data_sharding(mesh)  # rays over dcn x data
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, ray_sh, ray_sh, ray_sh, ray_sh),
        out_shardings=(rep, rep),
    )


def init_multiscene_params(model, n_scenes: int, rngs=None):
    """Per-scene parameter stack: every leaf gains a leading (B,) scene
    axis (independently initialized per scene)."""
    if rngs is None:
        rngs = jax.random.split(jax.random.key(0), n_scenes)
    xyz0 = jnp.zeros((1, 3))
    vd0 = jnp.asarray([[0.0, 0.0, 1.0]])
    # one vmapped trace instead of n_scenes sequential init traces —
    # at the ~1k-scene target a python loop costs minutes of pure
    # tracing on the single-core host
    return jax.jit(jax.vmap(lambda k: model.init(k, xyz0, vd0)))(
        jnp.asarray(rngs)
    )


def make_multiscene_ngp_step(
    model_apply,
    tx,
    mesh,
    n_samples: int = 128,
    k_occupied: int | None = None,
    occ_threshold: float = 0.01,
    stage: str = "rgb",
    instance_fg_weight: float = 5.0,
    occ_coarse_res: int | None = None,
    k_buckets: tuple | None = None,
    fuse_buckets: bool = True,
    stratified: bool = True,
    ray_jitter: bool = False,
    bg_acc_weight: float = 0.0,
):
    """Batched MULTI-SCENE instance-field training (BASELINE config #5:
    "~1k scenes over a mesh"): every scene carries its own field
    parameters and occupancy grid, stacked on a leading (B,) axis that
    shards over ``dcn x data`` — per-device memory and compute stay
    constant as scenes scale out, and there is NO gradient collective at
    all (scenes are independent; Adam is elementwise so the stacked
    update IS the per-scene update). Rays additionally shard over ``sp``
    within each scene. The reference trains scenes one python process at
    a time (torch-ngp, README.md:55-65); this is the TPU-native fleet
    formulation.

    Returns jitted ``step(state, occ_grids, key, o, d, rgb, inst) ->
    (state, metrics)`` where every ray arg has shape (B, R, ...),
    ``occ_grids`` is (B, G, G, G), and state.params leaves have a
    leading (B,) axis (init_multiscene_params).

    ``k_buckets``: adaptive-K routing per scene. Intended for sp=1 fleet
    meshes (the per-scene ray axis unsharded): the in-scene argsort is
    then local and collective-free. With sp>1 GSPMD would insert gathers
    for the sort — use the single-scene sharded step's shard_map path
    instead.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from instance_nerf_tpu.parallel.mesh import DATA_AXES

    def one_scene_loss(p, occ_grid, key, o, d, target_rgb, target_inst):
        occ = OccupancyGrid(occ_grid, occ_threshold)
        out = render_rays(
            model_apply, p, key, o, d,
            n_samples=n_samples, occ=occ,
            with_instance=stage != "rgb",
            k_occupied=k_occupied,
            occ_coarse_res=occ_coarse_res,
            k_buckets=k_buckets, fuse_buckets=fuse_buckets,
            stratified=stratified, ray_jitter=ray_jitter,
        )
        rgb_loss = jnp.mean((out.rgb - target_rgb) ** 2)
        total = rgb_loss if stage != "instance" else 0.0
        metrics = {"rgb": rgb_loss}
        if stage != "rgb":
            valid = target_inst >= 0
            logp = jax.nn.log_softmax(out.instance_logits, axis=-1)
            ce = -jnp.take_along_axis(
                logp, jnp.clip(target_inst, 0)[:, None], axis=-1
            )[:, 0]
            w = jnp.where(target_inst > 0, instance_fg_weight, 1.0)
            w = jnp.where(valid, w, 0.0)
            inst = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1)
            metrics["instance"] = inst
            total = total + inst
        if stage != "instance" and bg_acc_weight > 0:
            # background-transparency pressure (see NGPConfig
            # .bg_acc_weight): acc^2 on GT-background rays
            is_bg = target_inst == 0
            bg = (jnp.sum(jnp.where(is_bg, out.acc ** 2, 0.0))
                  / jnp.maximum(jnp.sum(is_bg), 1))
            metrics["bg_acc"] = bg
            total = total + bg_acc_weight * bg
        metrics["total"] = total
        return total, metrics

    def step(state, occ_grids, key, o, d, target_rgb, target_inst):
        b = o.shape[0]
        keys = jax.random.split(key, b)

        def scene_loss_sum(params):
            _, metrics = jax.vmap(one_scene_loss)(
                params, occ_grids, keys, o, d, target_rgb, target_inst
            )
            # sum over scenes: d(sum)/d(params_i) = per-scene grads
            return jnp.sum(metrics["total"]), metrics

        grads, metrics = jax.grad(scene_loss_sum, has_aux=True)(state.params)
        if stage == "instance":
            # frozen-NeRF instance training: see mask_to_instance_head.
            grads = mask_to_instance_head(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if stage == "instance":
            updates = mask_to_instance_head(updates)
        params = optax.apply_updates(state.params, updates)
        mean_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        return NGPTrainState(params, opt_state), mean_metrics

    scene_sh = NamedSharding(mesh, P(DATA_AXES))  # leading (B,) axis
    ray_sh = NamedSharding(mesh, P(DATA_AXES, "sp"))  # (B, R, ...)
    rep = replicated(mesh)
    # state sharding is data-dependent (adam's count is a scalar leaf):
    # the caller commits the state via shard_multiscene_state and jit
    # keeps the committed shardings (None = follow the argument)
    return jax.jit(
        step,
        in_shardings=(None, scene_sh, rep, ray_sh, ray_sh, ray_sh, ray_sh),
    )


def shard_multiscene_state(mesh, state: NGPTrainState, n_scenes: int):
    """Commit a multi-scene train state: leaves with a leading (B,) scene
    axis shard over dcn x data, scalar leaves (e.g. adam's count)
    replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from instance_nerf_tpu.parallel.mesh import DATA_AXES

    scene_sh = NamedSharding(mesh, P(DATA_AXES))
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_scenes:
            return jax.device_put(x, scene_sh)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, state)
