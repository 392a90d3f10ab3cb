"""Multi-scene fast-vs-hash quality parity (VERDICT r2 weak #7).

The round-2 "drop-in replacement" claim for the brick encoding rested on
ONE synthetic scene while brick seams are a known approximation
(fast_encode.py). This drives the parity table over N scenes (different
blob layouts/colors per seed), fast vs hash at matched step budgets,
reporting mean +- spread of train PSNR / novel-render PSNR / instance
CE / instance pixel acc.

The fast config is the SHIPPING one: brick encoding + Pallas table VJP
(pallas_grad) + two-stage coarse-MXU occupancy — so the table also
validates those paths in real training, not just microbenchmarks.

Run (TPU): python examples/fast_quality_multi.py \
    --out examples/results/fast_quality_multi.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="examples/results/fast_quality_multi.json")
    p.add_argument("--num_scenes", type=int, default=8)
    p.add_argument("--rgb_steps", type=int, default=1500)
    p.add_argument("--inst_steps", type=int, default=500)
    p.add_argument("--skip_hash", action="store_true")
    p.add_argument("--table_log2", type=int, default=17)
    p.add_argument("--n_levels", type=int, default=6)
    p.add_argument("--dense_res", type=int, default=16)
    p.add_argument("--base_res", type=int, default=32)
    p.add_argument("--n_features", type=int, default=2)
    p.add_argument("--pallas_replicas", type=int, default=1)
    p.add_argument("--k_occupied", type=int, default=32)
    p.add_argument("--arms", default="",
                   help="comma list of named arms (fast_packed, "
                        "fast_unpacked, hash) run on the SAME scenes — "
                        "the controlled A/B for the packed 227k-rays/s "
                        "config (VERDICT r3 weak #3). Empty = legacy "
                        "single-fast(+hash) mode driven by the flags "
                        "above.")
    p.add_argument("--holdout_views", type=int, default=0,
                   help="generate this many EXTRA views excluded from "
                        "training; render PSNR / instance acc are then "
                        "measured on truly novel views (mean over the "
                        "holdout) instead of train view 0")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (the axon sitecustomize "
                        "overrides JAX_PLATFORMS; see CLAUDE.md)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np

    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.ngp_trainer import (
        InstanceFieldTrainer,
        NGPConfig,
        fast_ngp_config,
    )

    fast_common = dict(
        num_instances=5, n_rays=4096, n_samples=96,
        k_occupied=args.k_occupied, occ_res=64, occ_coarse_res=32,
    )
    # named arms for the controlled A/B (BENCH_NOTES "scatter endgame"):
    #   fast_packed   — the 227k-rays/s shipping config: T=2^15 tables,
    #                   3 levels x 4 features (same 12-dim encode), XLA
    #                   collision-aware scatter (pallas off)
    #   fast_unpacked — the round-2 config the 7-scene quality table
    #                   used: T=2^17, 6 levels x 2 features, Pallas VJP
    ARM_DEFS = {
        "fast_packed": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False, **fast_common),
        "fast_unpacked": lambda: fast_ngp_config(
            table_size=2 ** 17, n_levels=6, n_features=2,
            pallas_grad=True, **fast_common),
        "hash": lambda: NGPConfig(
            num_instances=5, n_rays=4096, n_samples=96, k_occupied=32,
            occ_res=64, dtype="bfloat16"),
        # adaptive-K routing on top of the packed config (probe15:
        # rgb 484k/753k rays/s) — the quality question is whether
        # bucket truncation costs pixel acc on real scenes
        "fast_packed_bktA": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False,
            k_buckets=((0.5, 8), (0.25, 16), (0.25, 32)), **fast_common),
        "fast_packed_bktB": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False,
            k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)), **fast_common),
        # round-4 throughput leaders (probe16/17) — quality cover:
        #   dense32_bktB — coarsest brick level moved into the MXU dense
        #                  grid (no gather/scatter for L0), buckets B
        #   bktB_bf16    — bktB with bf16 table reads (table_dtype)
        "fast_dense32_bktB": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=2, n_features=4, base_res=181,
            dense_res=32, pallas_grad=False,
            k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)), **fast_common),
        "fast_bktB_bf16": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False, table_dtype="bfloat16",
            k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)), **fast_common),
        "fast_dense32_bktB_bf16": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=2, n_features=4, base_res=181,
            dense_res=32, pallas_grad=False, table_dtype="bfloat16",
            k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)), **fast_common),
        # S=64 dense candidates (probe18 scan-true: rgb 876k -> 1001k
        # rays/s — the prefix halves): does halving the candidate
        # resolution cost quality at matched K?
        "fast_bktB_S64": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False,
            k_buckets=((0.5, 4), (0.25, 8), (0.25, 16)),
            **{**fast_common, "n_samples": 64}),
        # half the bucket ladder again (avg K 8 -> 4; probe19): the
        # truncation-quality question at K=2 for the emptiest half
        "fast_bktC_S64": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False,
            k_buckets=((0.5, 2), (0.25, 4), (0.25, 8)),
            **{**fast_common, "n_samples": 64}),
        # S=48 candidates (probe21: rgb 1.75M / instance 2.20M rays/s at
        # R=8192): the quality question is whether 48 stratified
        # candidates still land enough samples inside thin occupancy
        "fast_bktC_S48": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False,
            k_buckets=((0.5, 2), (0.25, 4), (0.25, 8)),
            **{**fast_common, "n_samples": 48}),
        # per-ray stratified jitter (probe22): offsets correlated along
        # the ray — the quality question is banding/aliasing in the
        # trained field at the compacted sample counts
        "fast_bktC_S48_rayjit": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False, ray_jitter=True,
            k_buckets=((0.5, 2), (0.25, 4), (0.25, 8)),
            **{**fast_common, "n_samples": 48}),
        # probe23/23b throughput leaders (round 5): thinner bktE ladder
        # (0.625:2/0.25:4/0.125:8, avg K 3.25), L2F6 row packing (2
        # levels x 6 features — same 12-dim encode, 2/3 the scattered
        # rows), and S=32 candidates. Quality questions: truncation at
        # the thinner ladder, capacity of 2 brick levels, and
        # thin-structure coverage with 32 stratified candidates.
        "fast_bktE_S48": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False, ray_jitter=True,
            k_buckets=((0.625, 2), (0.25, 4), (0.125, 8)),
            **{**fast_common, "n_samples": 48}),
        "fast_L2F6_bktE_S48": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=2, n_features=6,
            pallas_grad=False, ray_jitter=True,
            k_buckets=((0.625, 2), (0.25, 4), (0.125, 8)),
            **{**fast_common, "n_samples": 48}),
        "fast_L2F6_bktE_S32": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=2, n_features=6,
            pallas_grad=False, ray_jitter=True,
            k_buckets=((0.625, 2), (0.25, 4), (0.125, 8)),
            **{**fast_common, "n_samples": 32}),
        # K-annealing (VERDICT r4 #6): bucketed bktC for the first 80%
        # of rgb steps, fixed K=16 for the tail — can the fixed-K tail
        # recover the ~1.9 dB bktC novel-view PSNR cost at ~80% of the
        # bucketed throughput?
        "fast_bktC_S48_anneal": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False, ray_jitter=True,
            k_buckets=((0.5, 2), (0.25, 4), (0.25, 8)),
            **{**fast_common, "n_samples": 48}),
        # occupancy-driven ladder (VERDICT r4 #1b): warm up bucketed,
        # then choose the fractions from the MEASURED per-ray hit
        # histogram (render.choose_k_buckets) instead of 0.5/0.25/0.25
        "fast_autoK_S48": lambda: fast_ngp_config(
            table_size=2 ** 15, n_levels=3, n_features=4,
            pallas_grad=False, ray_jitter=True,
            k_buckets=((0.5, 2), (0.25, 4), (0.25, 8)),
            **{**fast_common, "n_samples": 48}),
    }
    if args.arms:
        configs = [(a, ARM_DEFS[a]) for a in args.arms.split(",") if a]
    else:
        configs = [
            ("fast", lambda: fast_ngp_config(
                pallas_grad=True,
                table_size=2 ** args.table_log2, n_levels=args.n_levels,
                dense_res=args.dense_res, base_res=args.base_res,
                n_features=args.n_features,
                pallas_replicas=args.pallas_replicas, **fast_common)),
        ]
        if not args.skip_hash:
            configs.append(("hash", ARM_DEFS["hash"]))

    from instance_nerf_tpu.data.nerf_dataset import NeRFScene

    rows = []
    for seed in range(args.num_scenes):
        rng = np.random.default_rng(seed)
        full, _ = make_synthetic_nerf_scene(
            rng, n_views=12 + args.holdout_views, hw=(64, 64), n_blobs=3)
        if args.holdout_views:
            scene = NeRFScene(full.images[:12], full.poses[:12],
                              full.intrinsics, full.hw, full.masks[:12])
            eval_views = range(12, 12 + args.holdout_views)
        else:
            scene, eval_views = full, range(1)
        for name, mk in configs:
            tr = InstanceFieldTrainer(mk(), seed=seed)
            t0 = time.time()
            extra = {}
            if name.endswith("_anneal"):
                n1 = int(args.rgb_steps * 0.8)
                tr.train(scene, n1, stage="rgb", log_every=0)
                bkts = tr.cfg.k_buckets
                tr.set_sampling(k_buckets=None, k_occupied=16)
                m_rgb = tr.train(scene, args.rgb_steps - n1, stage="rgb",
                                 log_every=0)
                tr.set_sampling(k_buckets=bkts)  # instance stays bucketed
            elif name.startswith("fast_autoK"):
                from instance_nerf_tpu.models.render import choose_k_buckets
                warm = min(160, args.rgb_steps // 4)
                tr.train(scene, warm, stage="rgb", log_every=0)
                ladder = choose_k_buckets(tr.measure_hits(scene),
                                          ks=(2, 4, 8))
                extra["ladder"] = ",".join(f"{f}:{k}" for f, k in ladder)
                tr.set_sampling(k_buckets=ladder)
                m_rgb = tr.train(scene, args.rgb_steps - warm, stage="rgb",
                                 log_every=0)
            else:
                m_rgb = tr.train(scene, args.rgb_steps, stage="rgb",
                                 log_every=0)
            m_inst = tr.train(scene, args.inst_steps, stage="instance",
                              log_every=0)
            psnrs, accs = [], []
            for v in eval_views:
                out = tr.render_image(full.poses[v], full.intrinsics,
                                      full.hw, chunk=4096)
                mse = float(np.mean((out["rgb"] - full.images[v]) ** 2))
                psnrs.append(-10 * np.log10(max(mse, 1e-10)))
                accs.append(float(
                    (out["instance"] == full.masks[v]).mean()))
            row = {
                "scene": seed, "encoding": name,
                "train_psnr": round(float(m_rgb["psnr"]), 2),
                "render_psnr_view0": round(float(np.mean(psnrs)), 2),
                "instance_ce": round(float(m_inst["instance"]), 4),
                "instance_pixel_acc": round(float(np.mean(accs)), 4),
                "wall_s": round(time.time() - t0, 1),
                **extra,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            write_partial(rows, configs, args)

    summary = write_partial(rows, configs, args)
    print("FAST QUALITY MULTI OK", json.dumps(summary), flush=True)


def write_partial(rows, configs, args):
    """Atomic rows+summary write after every arm so a queue timeout
    loses at most one scene-arm (VERDICT r3: the 4 h window cut the
    hash arm's last scene; partial results must survive)."""
    import numpy as np

    summary = {}
    for name, _ in configs:
        sel = [r for r in rows if r["encoding"] == name]
        if not sel:
            continue
        summary[f"{name}_n"] = len(sel)
        for k in ("train_psnr", "render_psnr_view0", "instance_ce",
                  "instance_pixel_acc", "wall_s"):
            v = np.asarray([r[k] for r in sel], np.float64)
            summary[f"{name}_{k}"] = {
                "mean": round(float(v.mean()), 3),
                "std": round(float(v.std()), 3),
                "min": round(float(v.min()), 3),
                "max": round(float(v.max()), 3),
            }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"rows": rows, "summary": summary}, f, indent=2)
    os.replace(tmp, args.out)
    return summary


if __name__ == "__main__":
    main()
