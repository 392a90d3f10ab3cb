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
):
    """Returns jitted ``step(state, occ_grid, key, o, d, rgb, inst) ->
    (state, metrics)`` with ray arrays sharded over ``data``."""

    def step(state, occ_grid, key, o, d, target_rgb, target_inst):
        occ = OccupancyGrid(occ_grid, occ_threshold)

        def loss_fn(p):
            out = render_rays(
                model_apply, p, key, o, d,
                n_samples=n_samples, occ=occ,
                with_instance=stage != "rgb",
                k_occupied=k_occupied,
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
            metrics["total"] = total
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return NGPTrainState(params, opt_state), metrics

    ray_sh = data_sharding(mesh)  # rays over dcn x data
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, ray_sh, ray_sh, ray_sh, ray_sh),
        out_shardings=(rep, rep),
    )
