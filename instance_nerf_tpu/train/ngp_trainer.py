"""Instance-field (hash-grid NGP) trainer: staged rgb → instance training.

Capability parity with the torch-ngp instance_nerf training loop
(README.md:55-65, SURVEY.md §2.10): per-scene NGP training on posed
images, occupancy-grid maintenance, then instance-field training against
matched 2D masks (CE on alpha-composited instance logits) with the
radiance field frozen; novel-view rendering of rgb/depth/instance ids;
regular-grid RGBσ extraction for the detector (stage-1 feature export,
README.md:44).
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instance_nerf_tpu.data.nerf_dataset import NeRFScene
from instance_nerf_tpu.models.fast_encode import mask_to_instance_head
from instance_nerf_tpu.models.hashgrid import InstanceNGP, density_activation
from instance_nerf_tpu.models.render import (
    OccupancyGrid,
    camera_rays,
    init_occupancy,
    render_rays,
    update_occupancy,
)


@dataclass
class NGPConfig:
    # "hash" = exact shared-corner NGP encoding (reference parity);
    # "fast" = TPU-native brick-grid encoding (models/fast_encode.py),
    # ~1 gathered row per point-level instead of 8 corner rows
    encoding: str = "hash"
    n_levels: int = 16
    table_size: int = 2 ** 19
    n_features: int = 2
    base_res: int = 16
    max_res: int = 1024
    dense_res: int = 16  # fast encoding: MXU-interpolated base grid
    dense_features: int = 8
    hidden: int = 64
    num_instances: int = 33
    n_rays: int = 4096
    n_samples: int = 128
    lr: float = 1e-2
    occ_res: int = 128
    occ_update_every: int = 16
    occ_threshold: float = 0.01
    # fleet occupancy maintenance: fraction of the G^3 cells re-sampled
    # per update (scatter-max into the decayed grid). 1.0 = dense
    # re-sample of every cell. probe26: the dense (B, G^3) sigma query
    # grows superlinearly in fleet size B (3.1 s at B=32, occ_res 64);
    # subsampling bounds it while the 0.95 EMA decay keeps stale cells
    # dying out (torch-ngp samples cell subsets the same way).
    occ_subsample: float = 1.0
    dtype: str = "float32"  # MLP compute dtype ("bfloat16" on TPU)
    # indoor masks are overwhelmingly background; upweight labeled
    # foreground rays so small instances aren't drowned out
    instance_fg_weight: float = 5.0
    # rgb-stage background-transparency pressure: weight on mean(acc^2)
    # over rays whose GT instance label is 0. Few-view scenes otherwise
    # reach high TRAIN psnr by painting view-dependent fog (pipe_r5f:
    # train psnr 40.9, HOLDOUT render psnr 10.4) — fog that also
    # displaces novel-view instance masks. Only enable when the scene
    # HAS masks: with masks absent the loader feeds label 0 everywhere
    # and this loss would drive the whole field transparent.
    bg_acc_weight: float = 0.0
    # fixed-K occupancy compaction: of n_samples dense candidates, only
    # the first K occupied per ray are queried (None = query all)
    k_occupied: int | None = None
    # two-stage occupancy: coarse MXU selection + fine mask on the K
    # compacted samples (render.py:coarse_occupancy_mxu); None = exact
    occ_coarse_res: int | None = None
    # adaptive-K routing: ((fraction, K), ...) — rays sorted by
    # occupancy hit count, fewest-hit fraction compacted with smallest K
    # (render.py:render_rays k_buckets). Overrides k_occupied when set.
    k_buckets: tuple | None = None
    # ONE field query over all bucket sub-batches (render.py probe16)
    fuse_buckets: bool = True
    # cast brick tables to this dtype for the gather/scatter (probe17);
    # None = f32 reads. The master table/adam state stay f32 either way.
    table_dtype: str | None = None
    # route hash/brick table gradients through the Pallas scatter-add
    # kernel (kernels/scatter_pallas.py) — 1.75x XLA's scatter on the
    # rgb-stage backward (probe8b: brick fwd+bwd 54.6 -> 31.2 ms)
    pallas_grad: bool = False
    # disjoint VMEM accumulator copies inside the Pallas scatter kernel
    # (breaks the serial RMW chain); 1 = single-copy kernel
    pallas_replicas: int = 1
    # ONE stratified jitter per ray instead of per sample (torch-ngp
    # jitters the march start per ray) — S x fewer threefry values;
    # the RNG is a measurable slice of the prefix at S>=48 (probe22)
    ray_jitter: bool = False


def rays_multi(poses, views, pix, scene):
    """Rays for a mixed-view batch (vectorized over per-ray poses)."""
    c2w = poses[jnp.asarray(views)]  # (R, 4, 4)
    fx, fy, cx, cy = scene.intrinsics
    h, w = scene.hw
    pixj = jnp.asarray(pix)
    py = (pixj // w).astype(jnp.float32) + 0.5
    px = (pixj % w).astype(jnp.float32) + 0.5
    dirs = jnp.stack(
        [(px - cx) / fx, -(py - cy) / fy, -jnp.ones_like(px)], axis=-1
    )
    d = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], dirs)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return c2w[:, :3, 3], d


def fast_ngp_config(**overrides) -> NGPConfig:
    """NGPConfig preset for the TPU-native fast encoding: 6 brick levels
    (32..1024), 2^17-row tables, MXU dense base grid, bf16 MLPs."""
    base = dict(
        encoding="fast", n_levels=6, table_size=2 ** 17, n_features=2,
        base_res=32, max_res=1024, dense_res=16, dense_features=8,
        dtype="bfloat16",
    )
    base.update(overrides)
    return NGPConfig(**base)


class InstanceFieldTrainer:
    def __init__(self, cfg: NGPConfig, seed: int = 0):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else None
        if cfg.encoding == "fast":
            from instance_nerf_tpu.models.fast_encode import InstanceNGPFast

            self.model = InstanceNGPFast(
                n_levels=cfg.n_levels,
                table_size=cfg.table_size,
                n_features=cfg.n_features,
                base_res=cfg.base_res,
                max_res=cfg.max_res,
                dense_res=cfg.dense_res,
                dense_features=cfg.dense_features,
                hidden=cfg.hidden,
                num_instances=cfg.num_instances,
                dtype=dtype,
                pallas_grad=cfg.pallas_grad,
                pallas_replicas=cfg.pallas_replicas,
                table_dtype=cfg.table_dtype,
            )
        else:
            self.model = InstanceNGP(
                n_levels=cfg.n_levels,
                table_size=cfg.table_size,
                n_features=cfg.n_features,
                base_res=cfg.base_res,
                max_res=cfg.max_res,
                hidden=cfg.hidden,
                num_instances=cfg.num_instances,
                dtype=dtype,
                pallas_grad=cfg.pallas_grad,
            )
        self.key = jax.random.key(seed)
        self.np_rng = np.random.default_rng(seed)
        xyz0 = jnp.zeros((1, 3))
        vd0 = jnp.asarray([[0.0, 0.0, 1.0]])
        self.params = self.model.init(jax.random.key(seed), xyz0, vd0)
        self.tx = optax.adam(cfg.lr, b1=0.9, b2=0.99, eps=1e-15)
        self.opt_state = self.tx.init(self.params)
        self.occ = init_occupancy(cfg.occ_res, cfg.occ_threshold)
        self._step_fns = {}
        self._render_fns = {}
        # jitted ONCE with params/xyz as arguments — a per-update
        # jax.jit(closure) would bake the ~64 MB hash table in as a
        # compile-time constant (retrace every occ update, and the axon
        # remote compiler rejects large captured constants)
        self._sigma_jit = jax.jit(self._sigma_query)

    def _sigma_query(self, params, xyz):
        sigma_raw, _ = self.model.apply(params, xyz, method="query")
        return density_activation(sigma_raw)

    # -- jitted pieces -------------------------------------------------------

    def _apply(self, params, xyz, vd):
        return self.model.apply(params, xyz, vd)

    def _make_step(self, stage: str):
        cfg = self.cfg

        @jax.jit
        def step(params, opt_state, occ_grid, key, o, d, target_rgb, target_inst):
            occ = OccupancyGrid(occ_grid, cfg.occ_threshold)

            def loss_fn(p):
                out = render_rays(
                    self._apply, p, key, o, d,
                    n_samples=cfg.n_samples, occ=occ,
                    with_instance=stage != "rgb",
                    k_occupied=cfg.k_occupied,
                    occ_coarse_res=cfg.occ_coarse_res,
                    k_buckets=cfg.k_buckets,
                    fuse_buckets=cfg.fuse_buckets,
                    ray_jitter=cfg.ray_jitter,
                )
                losses = {}
                rgb_loss = jnp.mean((out.rgb - target_rgb) ** 2)
                losses["rgb"] = rgb_loss
                total = rgb_loss if stage != "instance" else 0.0
                if stage != "instance" and cfg.bg_acc_weight > 0:
                    is_bg = target_inst == 0
                    bg = jnp.sum(jnp.where(is_bg, out.acc ** 2, 0.0))
                    bg = bg / jnp.maximum(jnp.sum(is_bg), 1)
                    losses["bg_acc"] = bg
                    total = total + cfg.bg_acc_weight * bg
                if stage != "rgb":
                    valid = target_inst >= 0
                    logp = jax.nn.log_softmax(out.instance_logits, axis=-1)
                    ce = -jnp.take_along_axis(
                        logp, jnp.clip(target_inst, 0)[:, None], axis=-1
                    )[:, 0]
                    w = jnp.where(target_inst > 0, cfg.instance_fg_weight, 1.0)
                    w = jnp.where(valid, w, 0.0)
                    inst_loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1)
                    losses["instance"] = inst_loss
                    total = total + inst_loss
                losses["psnr"] = -10.0 * jnp.log10(jnp.maximum(rgb_loss, 1e-8))
                return total, losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if stage == "instance":
                # frozen-NeRF instance training (reference README.md:47-65):
                # mask grads (keeps adam moments clean) AND updates (guards
                # against stale rgb-stage momentum) outside the inst head.
                grads = mask_to_instance_head(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            if stage == "instance":
                updates = mask_to_instance_head(updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        return step

    def _step_fn(self, stage):
        if stage not in self._step_fns:
            self._step_fns[stage] = self._make_step(stage)
        return self._step_fns[stage]

    def _make_scan_step(self, stage: str, n_steps: int, intrinsics, hw):
        """K steps per dispatch under ``lax.scan`` — through the axon
        tunnel each host dispatch costs ~1.3 s, which dominates any real
        train loop stepped one update per call (BENCH_NOTES.md). Ray
        generation (pose gather + direction math) moves inside the
        scanned body so the host only stacks view/pixel ids per chunk.
        """
        cfg = self.cfg
        step = self._step_fn(stage)
        fx, fy, cx, cy = intrinsics
        h, w = hw

        @jax.jit
        def scan_steps(params, opt_state, occ_grid, key, poses, views, pix,
                       rgbs, insts):
            def body(carry, xs):
                params, opt_state, key = carry
                v, px, rgb, inst = xs
                key, sk = jax.random.split(key)
                c2w = poses[v]  # (R, 4, 4)
                py_ = (px // w).astype(jnp.float32) + 0.5
                px_ = (px % w).astype(jnp.float32) + 0.5
                dirs = jnp.stack(
                    [(px_ - cx) / fx, -(py_ - cy) / fy,
                     -jnp.ones_like(px_)], axis=-1)
                d = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], dirs)
                d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
                o = c2w[:, :3, 3]
                params, opt_state, losses = step(
                    params, opt_state, occ_grid, sk, o, d, rgb, inst)
                return (params, opt_state, key), losses

            (params, opt_state, _), losses = jax.lax.scan(
                body, (params, opt_state, key),
                (views, pix, rgbs, insts), length=n_steps)
            return params, opt_state, jax.tree.map(lambda x: x[-1], losses)

        return scan_steps

    def _scan_fn(self, stage, n_steps, intrinsics, hw):
        k = (stage, n_steps, tuple(np.asarray(intrinsics).tolist()), tuple(hw))
        if k not in self._step_fns:
            self._step_fns[k] = self._make_scan_step(
                stage, n_steps, intrinsics, hw)
        return self._step_fns[k]

    # -- training ------------------------------------------------------------

    def set_sampling(self, **overrides):
        """Swap sampler-side config fields mid-run (k_buckets,
        k_occupied, n_samples, ray_jitter, occ_coarse_res, ...) while
        keeping params/opt state — the K-annealing and occupancy-driven
        ladder recipes (VERDICT r4 #6) train phases under different
        static sampling configs. Invalidates the per-config jitted step
        cache; the next step pays one re-jit."""
        import dataclasses

        allowed = {"k_buckets", "k_occupied", "n_samples", "ray_jitter",
                   "occ_coarse_res", "fuse_buckets"}
        bad = set(overrides) - allowed
        if bad:
            raise ValueError(f"set_sampling: not sampler fields: {bad}")
        self.cfg = dataclasses.replace(self.cfg, **overrides)
        self._step_fns.clear()
        self._render_fns.clear()

    def measure_hits(self, scene: NeRFScene, n_rays: int | None = None,
                     seed: int = 0):
        """Per-ray occupancy hit counts on a real ray batch under the
        CURRENT occupancy grid — the input to ``choose_k_buckets``
        (render.py): measure, choose the ladder, ``set_sampling``."""
        from instance_nerf_tpu.models.render import (
            coarse_occupancy_mxu, ray_aabb, sample_points,
        )

        cfg = self.cfg
        n = n_rays or cfg.n_rays
        v, pix, _, _ = scene.ray_batch(np.random.default_rng(seed), n)
        poses = jnp.asarray(scene.poses)
        o, d = self._rays_multi(poses, v, pix, scene)

        @jax.jit
        def hits_fn(occ_grid, o, d):
            occ = OccupancyGrid(occ_grid, cfg.occ_threshold)
            near, far = ray_aabb(o, d)
            valid = far > near
            far = jnp.maximum(far, near + 1e-4)
            xyz, _, _ = sample_points(
                jax.random.key(seed), o, d, cfg.n_samples, near, far,
                True, per_ray_jitter=cfg.ray_jitter)
            xyz = jnp.clip(xyz, 0.0, 1.0)
            if cfg.occ_coarse_res and cfg.occ_coarse_res < occ.res:
                occ_all = coarse_occupancy_mxu(occ, xyz, cfg.occ_coarse_res)
            else:
                occ_all = occ.occupied(xyz)
            return jnp.where(valid, occ_all.sum(-1), 0.0)

        return np.asarray(hits_fn(self.occ.grid, o, d))

    def train(self, scene: NeRFScene, steps: int, stage: str = "rgb",
              log_every: int = 100, log=print,
              steps_per_call: int | None = None):
        """Staged training loop; dispatches ``steps_per_call`` updates per
        device call via ``lax.scan`` (default = occ_update_every, which
        preserves the occupancy-maintenance cadence exactly)."""
        cfg = self.cfg
        spc = steps_per_call or cfg.occ_update_every
        if stage != "instance":
            # occupancy refresh must land every occ_update_every steps
            spc = min(spc, cfg.occ_update_every)
        poses = jnp.asarray(scene.poses)
        scan_fn = self._scan_fn(stage, spc, scene.intrinsics, scene.hw)
        step_fn = self._step_fn(stage)
        t0 = time.time()
        last = {}
        done = 0
        while done < steps:
            k = min(spc, steps - done)
            batches = [scene.ray_batch(self.np_rng, cfg.n_rays)
                       for _ in range(k)]
            vs = np.stack([b[0] for b in batches])
            pixs = np.stack([b[1] for b in batches])
            rgbs = np.stack([b[2] for b in batches])
            insts = np.stack([
                b[3] if b[3] is not None
                else np.zeros((cfg.n_rays,), np.int32) for b in batches
            ])
            self.key, sk = jax.random.split(self.key)
            if k == spc:
                self.params, self.opt_state, last = scan_fn(
                    self.params, self.opt_state, self.occ.grid, sk,
                    poses, jnp.asarray(vs), jnp.asarray(pixs),
                    jnp.asarray(rgbs), jnp.asarray(insts),
                )
            else:  # remainder: single-step path (avoids a scan retrace)
                for j in range(k):
                    o, d = self._rays_multi(poses, vs[j], pixs[j], scene)
                    sk, s2 = jax.random.split(sk)
                    self.params, self.opt_state, last = step_fn(
                        self.params, self.opt_state, self.occ.grid, s2,
                        o, d, jnp.asarray(rgbs[j]), jnp.asarray(insts[j]),
                    )
            done += k
            if stage != "instance" and done % cfg.occ_update_every == 0:
                self.key, ok = jax.random.split(self.key)
                self.occ = update_occupancy(
                    self.occ, lambda x: self._sigma_jit(self.params, x), ok
                )
            if log_every and (done % log_every < spc or done >= steps):
                m = {kk: float(val) for kk, val in last.items()}
                rate = cfg.n_rays * done / (time.time() - t0)
                log(f"[{stage}] step {done}: " +
                    " ".join(f"{kk}={v:.4f}" for kk, v in m.items()) +
                    f" ({rate:.0f} rays/s)")
        return {k: float(v) for k, v in last.items()}

    def benchmark_train(self, reps: int = 30, stage: str = "instance",
                        occupancy: float = 1.0, seed: int = 0,
                        scan_steps: int = 0):
        """Train-step throughput (rays/s) on synthetic rays.

        Chained-dependency timing: each step consumes the previous step's
        params and the ray origins are tied to the previous loss scalar,
        with ONE host readback at the end (block_until_ready does not
        synchronize through the axon tunnel) minus measured per-dispatch
        overhead.

        ``scan_steps`` > 0: run that many steps inside ONE ``lax.scan``
        dispatch and divide — device-true per-step time, immune to the
        tunnel's per-dispatch jitter (probe17b showed ~2x swings on
        ~5 ms dispatches; the scan number is the one to trust).
        """
        cfg = self.cfg
        rng = np.random.default_rng(seed)
        o = rng.normal(size=(cfg.n_rays, 3))
        o = 0.5 + 1.5 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = np.asarray([0.5, 0.5, 0.5]) - o + 0.1 * rng.normal(size=o.shape)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        rgb = jnp.asarray(rng.uniform(size=(cfg.n_rays, 3)), jnp.float32)
        inst = jnp.asarray(
            rng.integers(0, cfg.num_instances, cfg.n_rays), jnp.int32
        )
        occ_grid = self.occ.grid
        if occupancy < 1.0:
            g = occ_grid.shape[0]
            occ_grid = jnp.where(
                jnp.asarray(rng.uniform(size=(g, g, g)) < occupancy), 1e3, 0.0
            )
        step_fn = self._step_fn(stage)

        if scan_steps:
            # device-true: scan_steps updates inside one dispatch; the
            # whole dispatch is still chained `reps` times for stability
            inner = self._make_step(stage)

            # big arrays ride as ARGUMENTS, not closure constants — the
            # axon remote compiler rejects HTTP bodies with large
            # captured constants (CLAUDE.md; ADVICE r4)
            @jax.jit
            def scan_fn(params, opt_state, occ_g, rays_o, rays_d,
                        tgt_rgb, tgt_inst, chain):
                def body(carry, _):
                    p, s, key = carry
                    key, sk = jax.random.split(key)
                    p, s, losses = inner(p, s, occ_g, sk,
                                         rays_o + chain * 0, rays_d,
                                         tgt_rgb, tgt_inst)
                    return (p, s, key), losses["rgb"]

                (params, opt_state, _), ls = jax.lax.scan(
                    body, (params, opt_state, jax.random.key(0)),
                    None, length=scan_steps)
                return params, opt_state, ls[-1]

            t0 = time.perf_counter()
            p, s, chain = scan_fn(self.params, self.opt_state, occ_grid,
                                  o, d, rgb, inst, jnp.float32(0))
            float(chain)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain = jnp.float32(0)
            for _ in range(max(reps // scan_steps, 2)):
                p, s, chain = scan_fn(p, s, occ_grid, o, d, rgb, inst,
                                      chain)
            float(chain)
            n_disp = max(reps // scan_steps, 2)
            from instance_nerf_tpu.utils.profiling import (
                dispatch_overhead_ms,
            )

            disp_s = (time.perf_counter() - t0) / n_disp
            step_s = max(
                (disp_s - dispatch_overhead_ms() / 1000) / scan_steps,
                1e-6)
            return {"step_ms": step_s * 1000,
                    "rays_per_s": cfg.n_rays / step_s,
                    "compile_s": compile_s, "scan_steps": scan_steps}

        def one(params, opt_state, chain):
            params, opt_state, losses = step_fn(
                params, opt_state, occ_grid, jax.random.key(0),
                o + chain * 0, d, rgb, inst,
            )
            return params, opt_state, losses["rgb"]

        t0 = time.perf_counter()
        params, opt_state, chain = one(self.params, self.opt_state,
                                       jnp.float32(0))
        float(chain)  # compile + settle
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        chain = jnp.float32(0)
        for _ in range(reps):
            params, opt_state, chain = one(params, opt_state, chain)
        float(chain)
        dt = time.perf_counter() - t0

        from instance_nerf_tpu.utils.profiling import dispatch_overhead_ms

        step_s = max(dt / reps - dispatch_overhead_ms() / 1000, 1e-6)
        return {
            "step_ms": step_s * 1000,
            "rays_per_s": cfg.n_rays / step_s,
            "compile_s": compile_s,
        }

    def _rays_multi(self, poses, views, pix, scene):
        return rays_multi(poses, views, pix, scene)

    # -- inference -----------------------------------------------------------

    def _render_fn(self, with_instance: bool):
        """Jitted render with params + occupancy grid as ARGUMENTS (jitted
        once per with_instance flag), not closure constants."""
        if with_instance not in self._render_fns:
            cfg = self.cfg

            @jax.jit
            def render(params, occ_grid, key, o, d):
                # same fixed-K compacted integration the field was
                # TRAINED through — rendering with a different sampling
                # scheme evaluates the field off its supervised manifold
                return render_rays(
                    self._apply, params, key, o, d,
                    n_samples=cfg.n_samples,
                    occ=OccupancyGrid(occ_grid, cfg.occ_threshold),
                    stratified=False, with_instance=with_instance,
                    k_occupied=cfg.k_occupied,
                    occ_coarse_res=cfg.occ_coarse_res,
                    k_buckets=cfg.k_buckets,
                    fuse_buckets=cfg.fuse_buckets,
                )

            self._render_fns[with_instance] = render
        return self._render_fns[with_instance]

    def render_image(self, pose, intrinsics, hw, chunk: int = 8192,
                     with_instance: bool = True):
        """Full-image render -> dict(rgb (H,W,3), depth, acc, instance (H,W))."""
        h, w = hw
        o, d = camera_rays(jnp.asarray(pose), intrinsics, hw)
        outs = {"rgb": [], "depth": [], "acc": [], "inst": []}
        render_jit = self._render_fn(with_instance)
        render = lambda p, k, os_, ds_: render_jit(p, self.occ.grid, k, os_, ds_)
        for s in range(0, h * w, chunk):
            sl = slice(s, min(s + chunk, h * w))
            # pad the final chunk to the static size
            os_, ds_ = o[sl], d[sl]
            npad = chunk - os_.shape[0]
            if npad:
                os_ = jnp.pad(os_, ((0, npad), (0, 0)))
                ds_ = jnp.pad(ds_, ((0, npad), (0, 0)), constant_values=1.0)
            out = render(self.params, jax.random.key(0), os_, ds_)
            take = sl.stop - sl.start
            outs["rgb"].append(np.asarray(out.rgb[:take]))
            outs["depth"].append(np.asarray(out.depth[:take]))
            outs["acc"].append(np.asarray(out.acc[:take]))
            if with_instance:
                ids = np.asarray(jnp.argmax(out.instance_logits[:take], axis=-1))
                outs["inst"].append(ids)
        res = {
            "rgb": np.concatenate(outs["rgb"]).reshape(h, w, 3),
            "depth": np.concatenate(outs["depth"]).reshape(h, w),
            "acc": np.concatenate(outs["acc"]).reshape(h, w),
        }
        if with_instance:
            res["instance"] = np.concatenate(outs["inst"]).reshape(h, w)
        return res

    def extract_rgbsigma(self, resolution, chunk: int = 2 ** 16) -> np.ndarray:
        """Sample the field on a regular grid -> (W, L, H, 4) raw RGBσ —
        the detector's input features (stage 1, README.md:44)."""
        if isinstance(resolution, int):
            resolution = (resolution,) * 3
        w, l, h = resolution
        axes = [
            (jnp.arange(n, dtype=jnp.float32) + 0.5) / n for n in resolution
        ]
        gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
        xyz = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
        vd = jnp.asarray([0.0, 0.0, -1.0])

        @jax.jit
        def q(params, pts):
            sigma_raw, geo = self.model.apply(params, pts, method="query")
            rgb = self.model.apply(
                params, geo, jnp.broadcast_to(vd, pts.shape),
                method="color",
            )
            return sigma_raw, rgb

        out = np.zeros((w * l * h, 4), np.float32)
        n = xyz.shape[0]
        for s in range(0, n, chunk):
            pts = xyz[s : s + chunk]
            npad = chunk - pts.shape[0]
            if npad:
                pts = jnp.pad(pts, ((0, npad), (0, 0)))
            sigma_raw, rgb = q(self.params, pts)
            take = min(chunk, n - s)
            out[s : s + take, :3] = np.asarray(rgb[:take])
            out[s : s + take, 3] = np.asarray(sigma_raw[:take])
        return out.reshape(w, l, h, 4)
