"""Multi-scene instance-field training driver.

BASELINE config #5 ("batched multi-scene training ... ~1k scenes over a
mesh"): trains MANY scenes' fields simultaneously — per-scene params and
occupancy grids stacked on a (B,) axis sharded over the mesh's
``dcn x data`` axes (parallel/ngp_train_step.make_multiscene_ngp_step).
The reference trains one scene per python process (torch-ngp,
README.md:55-65); here a fleet of fields advances in lock-step with zero
gradient collectives.

Scales: per-device memory holds B/(dcn*data) field param sets; adding
devices adds scenes at constant per-device cost.
"""
from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.data.nerf_dataset import NeRFScene
from instance_nerf_tpu.models.render import init_occupancy
from instance_nerf_tpu.parallel.mesh import data_sharding, make_mesh
from instance_nerf_tpu.parallel.ngp_train_step import (
    NGPTrainState,
    init_multiscene_params,
    make_multiscene_ngp_step,
    shard_multiscene_state,
)
from instance_nerf_tpu.train.ngp_trainer import NGPConfig, fast_ngp_config


class MultiSceneFieldTrainer:
    """Train B scenes' instance fields in one SPMD program.

    ``cfg.n_rays`` is the PER-SCENE ray batch; every step consumes
    (B, n_rays) rays. Occupancy grids are per-scene and updated jointly.
    """

    def __init__(self, scenes: Sequence[NeRFScene], cfg: NGPConfig | None = None,
                 mesh=None, seed: int = 0):
        self.scenes = list(scenes)
        b = len(self.scenes)
        self.cfg = cfg or fast_ngp_config(n_rays=1024)
        import optax

        from instance_nerf_tpu.train.ngp_trainer import InstanceFieldTrainer

        # reuse the single-scene trainer's model factory
        proto = InstanceFieldTrainer(self.cfg, seed=seed)
        self.model = proto.model
        self.tx = optax.adam(self.cfg.lr, b1=0.9, b2=0.99, eps=1e-15)
        if mesh is None:
            n = jax.device_count()
            mesh = make_mesh(n_data=min(b, n), n_spatial=max(1, n // min(b, n)))
        self.mesh = mesh
        params = init_multiscene_params(
            self.model, b, jax.random.split(jax.random.key(seed), b)
        )
        self.state = shard_multiscene_state(
            mesh, NGPTrainState(params, self.tx.init(params)), b
        )
        g = self.cfg.occ_res
        self.occ_grids = jax.device_put(
            jnp.tile(init_occupancy(g, self.cfg.occ_threshold).grid[None],
                     (b, 1, 1, 1)),
            data_sharding(mesh),
        )
        self.np_rng = np.random.default_rng(seed)
        self.key = jax.random.key(seed + 1)
        self._steps = {}
        # per-scene sigma query for occupancy updates, vmapped over B
        self._sigma_all = jax.jit(jax.vmap(
            lambda p, x: proto._sigma_query(p, x)
        ))
        self._build_ray_index()

    def _build_ray_index(self):
        """Concatenated cross-scene pixel/pose stores for the VECTORIZED
        per-step ray batch: one fancy-indexing gather + one einsum over
        (B, R) replaces the per-scene python loop (which scales linearly
        with the fleet size — the round-2 host bottleneck at 6.5k
        aggregate rays/s). Scenes may have different view counts; pixel
        grids (H, W) must match."""
        hw0 = self.scenes[0].hw
        assert all(tuple(s.hw) == tuple(hw0) for s in self.scenes), (
            "multi-scene fleet requires a common image resolution"
        )
        self._hw = hw0
        hwprod = hw0[0] * hw0[1]
        self._intr = np.stack([
            np.asarray(s.intrinsics, np.float32) for s in self.scenes
        ])  # (B, 4)
        self._nview = np.asarray([s.num_views for s in self.scenes])
        self._pose_off = np.concatenate(
            [[0], np.cumsum(self._nview)[:-1]]).astype(np.int64)
        self._poses_all = np.concatenate(
            [np.asarray(s.poses, np.float32) for s in self.scenes])
        self._pix_off = self._pose_off * hwprod
        self._rgb_all = np.concatenate([
            np.asarray(s.images, np.float32).reshape(-1, 3)
            for s in self.scenes
        ])
        if all(s.masks is not None for s in self.scenes):
            self._inst_all = np.concatenate([
                np.asarray(s.masks).reshape(-1) for s in self.scenes
            ]).astype(np.int32)
        else:
            self._inst_all = None

    def _step_fn(self, stage):
        if stage not in self._steps:
            self._steps[stage] = make_multiscene_ngp_step(
                lambda p, x, v: self.model.apply(p, x, v), self.tx, self.mesh,
                n_samples=self.cfg.n_samples,
                k_occupied=self.cfg.k_occupied,
                occ_threshold=self.cfg.occ_threshold,
                stage=stage,
                instance_fg_weight=self.cfg.instance_fg_weight,
                occ_coarse_res=self.cfg.occ_coarse_res,
            )
        return self._steps[stage]

    def _batch(self):
        """(B, R, ...) host ray batch across all scenes — fully
        vectorized (no per-scene python loop; see _build_ray_index)."""
        cfg = self.cfg
        b = len(self.scenes)
        r = cfg.n_rays
        h, w = self._hw
        v = (self.np_rng.random((b, r)) * self._nview[:, None]).astype(
            np.int64)
        pix = self.np_rng.integers(0, h * w, (b, r))
        c2w = self._poses_all[self._pose_off[:, None] + v]  # (B, R, 4, 4)
        lin = self._pix_off[:, None] + v * (h * w) + pix
        rgb = self._rgb_all[lin]
        inst = (self._inst_all[lin] if self._inst_all is not None
                else np.zeros((b, r), np.int32))
        fx, fy = self._intr[:, 0, None], self._intr[:, 1, None]
        cx, cy = self._intr[:, 2, None], self._intr[:, 3, None]
        py_ = (pix // w).astype(np.float32) + 0.5
        px_ = (pix % w).astype(np.float32) + 0.5
        dirs = np.stack(
            [(px_ - cx) / fx, -(py_ - cy) / fy, -np.ones_like(px_)],
            axis=-1)
        d = np.einsum("brij,brj->bri", c2w[..., :3, :3], dirs)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.ascontiguousarray(c2w[..., :3, 3])
        from jax.sharding import NamedSharding, PartitionSpec as P

        ray_sh = NamedSharding(self.mesh, P(("dcn", "data"), "sp"))
        return [jax.device_put(x.astype(np.float32) if x.dtype != np.int32
                               else x, ray_sh)
                for x in (o, d, rgb, inst)]

    def train(self, steps: int, stage: str = "rgb", log_every: int = 100,
              log=print):
        cfg = self.cfg
        step_fn = self._step_fn(stage)
        t0 = time.time()
        last = {}
        for i in range(steps):
            args = self._batch()
            self.key, sk = jax.random.split(self.key)
            with self.mesh:
                self.state, last = step_fn(self.state, self.occ_grids, sk,
                                           *args)
            if (i + 1) % cfg.occ_update_every == 0 and stage != "instance":
                self._update_occupancy()
            if log_every and (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in last.items()}
                rate = len(self.scenes) * cfg.n_rays * (i + 1) / (time.time() - t0)
                log(f"[ms-{stage}] step {i+1}: " +
                    " ".join(f"{k}={v:.4f}" for k, v in m.items()) +
                    f" ({rate:.0f} rays/s aggregate)")
        return {k: float(v) for k, v in last.items()}

    def _update_occupancy(self):
        g = self.cfg.occ_res
        cells = np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"),
                         axis=-1).reshape(-1, 3)
        self.key, jk = jax.random.split(self.key)
        jitter = jax.random.uniform(jk, (cells.shape[0], 3))
        xyz = (jnp.asarray(cells) + jitter) / g
        b = len(self.scenes)
        xyz_b = jnp.broadcast_to(xyz[None], (b, *xyz.shape))
        sig = self._sigma_all(self.state.params, xyz_b)  # (B, G^3)
        sig = sig.reshape(b, g, g, g)
        self.occ_grids = jnp.maximum(self.occ_grids * 0.95, sig)

    def scene_params(self, i: int):
        """Extract one scene's params (e.g. for single-scene rendering
        via InstanceFieldTrainer)."""
        return jax.tree_util.tree_map(lambda x: x[i], self.state.params)

    def save(self, path: str, step: int = 0, metrics=None):
        """Checkpoint the whole fleet (stacked params + opt state +
        occupancy) — resume is bit-exact including adam moments."""
        from instance_nerf_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(path, keep=2)
        mgr.save(step, {"params": self.state.params,
                        "opt_state": self.state.opt_state,
                        "occ_grids": self.occ_grids},
                 config={"n_scenes": len(self.scenes)},
                 metrics=metrics or {})

    def restore(self, path: str):
        from instance_nerf_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(path)
        tmpl = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "occ_grids": self.occ_grids}
        state, meta = mgr.restore(tmpl)
        b = len(self.scenes)
        # re-commit the restored leaves with the dcn x data scene layout
        # (restore hands back host arrays; without this the first step
        # after resume would run fully replicated)
        self.state = shard_multiscene_state(
            self.mesh, NGPTrainState(state["params"], state["opt_state"]), b
        )
        self.occ_grids = jax.device_put(
            jnp.asarray(state["occ_grids"]), data_sharding(self.mesh)
        )
        return meta
