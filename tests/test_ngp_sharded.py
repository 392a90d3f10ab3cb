import numpy as np
import jax
import jax.numpy as jnp
import optax

from instance_nerf_tpu.models.hashgrid import InstanceNGP
from instance_nerf_tpu.models.render import init_occupancy
from instance_nerf_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from instance_nerf_tpu.parallel.ngp_train_step import (
    NGPTrainState,
    make_sharded_ngp_step,
)


def test_sharded_ngp_step_runs_and_matches_single():
    model = InstanceNGP(n_levels=2, table_size=256, max_res=16, hidden=16,
                        num_instances=3)
    apply_fn = lambda p, x, v: model.apply(p, x, v)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                        jnp.asarray([[0.0, 0, 1]]))
    tx = optax.adam(1e-2)
    occ = init_occupancy(8)

    rng = np.random.default_rng(0)
    n = 64
    o = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32).at[:, 2].set(-0.5)
    d = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, 3, n), jnp.int32)

    mesh = make_mesh(n_data=8, n_spatial=1)
    step = make_sharded_ngp_step(apply_fn, tx, mesh, n_samples=16,
                                 stage="instance")
    with mesh:
        state = NGPTrainState(
            jax.device_put(params, replicated(mesh)),
            jax.device_put(tx.init(params), replicated(mesh)),
        )
        args = shard_batch(mesh, (o, d, rgb, inst))
        state2, metrics = step(state, occ.grid, jax.random.key(1), *args)
    assert np.isfinite(float(metrics["total"]))
    assert np.isfinite(float(metrics["instance"]))

    # single-device reference step produces the same loss
    step1 = make_sharded_ngp_step(apply_fn, tx, make_mesh(n_data=1, n_spatial=1),
                                  n_samples=16, stage="instance")
    _, m1 = step1(NGPTrainState(params, tx.init(params)), occ.grid,
                  jax.random.key(1), o, d, rgb, inst)
    np.testing.assert_allclose(float(metrics["total"]), float(m1["total"]),
                               rtol=1e-4)


def test_sharded_bucketed_step_matches_single_device():
    """Adaptive-K over sharded rays (shard_map path): every shard sorts
    and buckets ITS rays locally — with a thin-slab occupancy whose hit
    counts fit the smallest bucket K, routing is a pure permutation, so
    the loss must equal the single-device fixed-K step exactly (psum'd
    partial sums == global mean). stratified=False pins the sample grid
    (the shard_map path folds the shard index into the RNG key, so
    jittered samples would legitimately differ)."""
    model = InstanceNGP(n_levels=2, table_size=256, max_res=16, hidden=16,
                        num_instances=3)
    apply_fn = lambda p, x, v: model.apply(p, x, v)
    params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                        jnp.asarray([[0.0, 0, 1]]))
    tx = optax.adam(1e-2)
    # thin slab: every ray crosses <= ~4 occupied candidates of 16
    fine = np.zeros((16, 16, 16), bool)
    fine[:, :, 7:9] = True
    occ_grid = jnp.asarray(fine * 1e3, jnp.float32)

    rng = np.random.default_rng(0)
    n = 64
    o = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32).at[:, 2].set(-0.5)
    d = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, 3, n), jnp.int32)

    mesh = make_mesh(n_data=8, n_spatial=1)
    step = make_sharded_ngp_step(
        apply_fn, tx, mesh, n_samples=16, stage="instance",
        k_occupied=8, k_buckets=((0.5, 4), (0.25, 8), (0.25, 8)),
        stratified=False)
    with mesh:
        state = NGPTrainState(
            jax.device_put(params, replicated(mesh)),
            jax.device_put(tx.init(params), replicated(mesh)),
        )
        args = shard_batch(mesh, (o, d, rgb, inst))
        state2, metrics = step(state, occ_grid, jax.random.key(1), *args)
    assert np.isfinite(float(metrics["total"]))

    single = make_sharded_ngp_step(
        apply_fn, tx, make_mesh(n_data=1, n_spatial=1), n_samples=16,
        stage="instance", k_occupied=8, stratified=False)
    s1, m1 = single(NGPTrainState(params, tx.init(params)), occ_grid,
                    jax.random.key(1), o, d, rgb, inst)
    np.testing.assert_allclose(float(metrics["total"]), float(m1["total"]),
                               rtol=1e-4)
    # and the resulting params agree (same grads through shard_map+psum)
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_multiscene_step_matches_independent_scenes():
    """Batched multi-scene step == independent per-scene steps (scenes
    shard over dcn x data; adam is elementwise so the stacked update is
    exactly the per-scene update)."""
    from instance_nerf_tpu.parallel.mesh import data_sharding
    from instance_nerf_tpu.parallel.ngp_train_step import (
        init_multiscene_params,
        make_multiscene_ngp_step,
        shard_multiscene_state,
    )

    model = InstanceNGP(n_levels=2, table_size=128, max_res=16, hidden=8,
                        num_instances=3)
    apply_fn = lambda p, x, v: model.apply(p, x, v)
    tx = optax.adam(1e-2)
    b, r = 8, 16
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(0.2, 0.8, (b, r, 3)), jnp.float32)
    d = jnp.zeros((b, r, 3)).at[..., 2].set(1.0)
    rgb = jnp.asarray(rng.uniform(0, 1, (b, r, 3)), jnp.float32)
    inst = jnp.asarray(rng.integers(0, 3, (b, r)), jnp.int32)
    occ_grids = jnp.tile(init_occupancy(8).grid[None], (b, 1, 1, 1))

    params = init_multiscene_params(model, b)
    mesh = make_mesh(n_data=2, n_spatial=2, n_dcn=2)
    step = make_multiscene_ngp_step(apply_fn, tx, mesh, n_samples=8,
                                    stage="instance")
    with mesh:
        state = shard_multiscene_state(
            mesh, __import__("instance_nerf_tpu.parallel.ngp_train_step",
                             fromlist=["NGPTrainState"]).NGPTrainState(
                params, tx.init(params)), b)
        occ_sh = jax.device_put(occ_grids, data_sharding(mesh))
        key = jax.random.key(1)
        from jax.sharding import NamedSharding, PartitionSpec as P
        ray_sh = NamedSharding(mesh, P(("dcn", "data"), "sp"))
        args = [jax.device_put(x, ray_sh) for x in (o, d, rgb, inst)]
        state2, metrics = step(state, occ_sh, key, *args)
    assert np.isfinite(float(metrics["total"]))

    # oracle: run scene 3 independently with the single-scene math
    i = 3
    keys = jax.random.split(key, b)
    p_i = jax.tree_util.tree_map(lambda x: x[i], params)
    single = make_sharded_ngp_step(apply_fn, tx, make_mesh(n_data=1),
                                   n_samples=8, stage="instance")
    s1 = NGPTrainState(p_i, tx.init(p_i))
    s2, m2 = single(s1, occ_grids[i], keys[i], o[i], d[i], rgb[i], inst[i])
    got = jax.tree_util.tree_map(lambda x: np.asarray(x[i]), state2.params)
    want = jax.tree_util.tree_map(np.asarray, s2.params)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-5)


def test_multiscene_save_restore_roundtrip(tmp_path):
    """Fleet checkpoint resume is bit-exact INCLUDING adam moments
    (round-2 advisor finding: restore used to silently reset opt_state),
    and restored leaves are re-committed with the scene sharding."""
    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(1)
    scenes = [make_synthetic_nerf_scene(rng, n_views=2, hw=(16, 16),
                                        n_blobs=1)[0] for _ in range(4)]
    cfg = fast_ngp_config(
        n_rays=32, n_samples=8, k_occupied=4, n_levels=2,
        table_size=256, dense_res=4, dense_features=2, hidden=8,
        num_instances=3, occ_res=8, occ_update_every=5, dtype="float32",
    )
    tr = MultiSceneFieldTrainer(scenes, cfg, seed=0)
    tr.train(5, stage="rgb", log_every=10**9)
    tr.save(str(tmp_path / "fleet"), step=5)

    tr2 = MultiSceneFieldTrainer(scenes, cfg, seed=123)  # different init
    tr2.restore(str(tmp_path / "fleet"))
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.opt_state),
                    jax.tree_util.tree_leaves(tr2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(tr.occ_grids),
                                  np.asarray(tr2.occ_grids))
    # restored state carries the dcn x data scene layout, not replication
    leaf = jax.tree_util.tree_leaves(tr2.state.params)[0]
    assert not leaf.sharding.is_fully_replicated
    # and training continues identically from the restored state
    # (align the ray/key RNGs so both see the same batches)
    tr.np_rng = np.random.default_rng(11)
    tr2.np_rng = np.random.default_rng(11)
    tr.key = jax.random.key(7)
    tr2.key = jax.random.key(7)
    m1 = tr.train(3, stage="rgb", log_every=10**9)
    m2 = tr2.train(3, stage="rgb", log_every=10**9)
    np.testing.assert_allclose(m1["rgb"], m2["rgb"], rtol=1e-5)


def test_multiscene_trainer_end_to_end():
    """MultiSceneFieldTrainer: 4 tiny posed-image scenes advance jointly
    on the CPU mesh; loss drops and per-scene params diverge."""
    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(0)
    scenes = [make_synthetic_nerf_scene(rng, n_views=2, hw=(16, 16),
                                        n_blobs=1)[0] for _ in range(4)]
    cfg = fast_ngp_config(
        n_rays=32, n_samples=8, k_occupied=4, n_levels=2,
        table_size=256, dense_res=4, dense_features=2, hidden=8,
        num_instances=3, occ_res=8, occ_update_every=5,
        dtype="float32",
    )
    tr = MultiSceneFieldTrainer(scenes, cfg, seed=0)
    first = tr.train(2, stage="rgb", log_every=10**9)
    last = tr.train(30, stage="rgb", log_every=10**9)
    assert np.isfinite(last["rgb"]) and last["rgb"] < first["rgb"] * 1.5
    p0 = tr.scene_params(0)
    p1 = tr.scene_params(1)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_multiscene_device_data_path():
    """device_data=True stages uint8 images / int8 masks / padded poses
    in HBM (scene axis over dcn x data) and the scan body draws rays +
    gathers targets ON DEVICE — the host contributes only the PRNG key
    per dispatch. Trains both stages end-to-end; rgb loss drops; the
    staged store round-trips the images exactly at uint8 precision."""
    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(5)
    scenes = [make_synthetic_nerf_scene(rng, n_views=2, hw=(16, 16),
                                        n_blobs=1)[0] for _ in range(4)]
    cfg = fast_ngp_config(
        n_rays=32, n_samples=8, k_occupied=4, n_levels=2,
        table_size=256, dense_res=4, dense_features=2, hidden=8,
        num_instances=3, occ_res=8, occ_update_every=5, dtype="float32",
    )
    tr = MultiSceneFieldTrainer(scenes, cfg, seed=0, device_data=True)
    # staged store: uint8 quantization of the float images, view-padded
    img0 = np.asarray(tr._imgs_dev)[0, 0].reshape(16, 16, 3)
    np.testing.assert_allclose(
        img0 / 255.0, np.clip(np.asarray(scenes[0].images)[0], 0, 1),
        atol=1 / 255.0 + 1e-6)
    assert np.asarray(tr._nview_dev).tolist() == [2, 2, 2, 2]
    assert not tr._imgs_dev.sharding.is_fully_replicated

    first = tr.train(5, stage="rgb", log_every=10**9)
    last = tr.train(30, stage="rgb", log_every=10**9)
    assert np.isfinite(last["rgb"]) and last["rgb"] < first["rgb"] * 1.5
    m = tr.train(10, stage="instance", log_every=10**9)
    assert np.isfinite(m["instance"])
    # per-scene params diverged (independent fields, zero collectives)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        tr.scene_params(0), tr.scene_params(1))
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # memory helper: the opt-in guard callers use
    assert MultiSceneFieldTrainer.fleet_data_bytes(4, 2, (16, 16)) == \
        4 * 2 * 256 * 4


def test_multiscene_background_save_snapshots_at_call_time(tmp_path):
    """background=True must checkpoint the state AS OF the save call even
    while training keeps stepping underneath (no step donates buffers, so
    the snapshotted leaves stay valid for the writer thread)."""
    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(2)
    scenes = [make_synthetic_nerf_scene(rng, n_views=2, hw=(16, 16),
                                        n_blobs=1)[0] for _ in range(4)]
    cfg = fast_ngp_config(
        n_rays=32, n_samples=8, k_occupied=4, n_levels=2,
        table_size=256, dense_res=4, dense_features=2, hidden=8,
        num_instances=3, occ_res=8, occ_update_every=5, dtype="float32",
    )
    tr = MultiSceneFieldTrainer(scenes, cfg, seed=0)
    tr.train(3, stage="rgb", log_every=10**9)
    want = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr.state.params)]
    tr.save(str(tmp_path / "fleet"), step=3, background=True)
    tr.train(3, stage="rgb", log_every=10**9)  # mutates tr.state binding
    tr.wait_for_save()
    tr.wait_for_save()  # idempotent

    tr2 = MultiSceneFieldTrainer(scenes, cfg, seed=9)
    tr2.restore(str(tmp_path / "fleet"))
    got = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr2.state.params)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    # the post-save training moved on from the snapshot
    now = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr.state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(want, now))


def test_multiscene_subsampled_occ_update():
    """occ_subsample < 1 re-queries only M = frac * G^3 cells per scene
    (scatter-max into the decayed grid, ONE jitted dispatch — probe26:
    the dense fleet update grew superlinearly with B). Repeated updates
    must still converge the grid to the same occupied region the dense
    path finds."""
    from instance_nerf_tpu.data.nerf_dataset import make_synthetic_nerf_scene
    from instance_nerf_tpu.train.multiscene import MultiSceneFieldTrainer
    from instance_nerf_tpu.train.ngp_trainer import fast_ngp_config

    rng = np.random.default_rng(7)
    scenes = [make_synthetic_nerf_scene(rng, n_views=2, hw=(16, 16),
                                        n_blobs=1)[0] for _ in range(4)]
    base = dict(
        n_rays=32, n_samples=8, k_occupied=4, n_levels=2,
        table_size=256, dense_res=4, dense_features=2, hidden=8,
        num_instances=3, occ_res=8, occ_update_every=5, dtype="float32",
    )
    tr_dense = MultiSceneFieldTrainer(
        scenes, fast_ngp_config(**base), seed=0)
    tr_sub = MultiSceneFieldTrainer(
        scenes, fast_ngp_config(**base, occ_subsample=0.5), seed=0)
    tr_dense.train(20, stage="rgb", log_every=10**9)
    tr_sub.train(20, stage="rgb", log_every=10**9)
    # identical seeds/data: params follow the same trajectory modulo the
    # occupancy grids; with enough updates the subsampled grid must
    # approach the dense one (EMA decay retires stale cells)
    for _ in range(12):
        tr_dense._update_occupancy()
        tr_sub._update_occupancy()
    gd = np.asarray(tr_dense.occ_grids)
    gs = np.asarray(tr_sub.occ_grids)
    assert gs.shape == gd.shape and np.isfinite(gs).all()
    thr = tr_sub.cfg.occ_threshold
    agree = ((gd > thr) == (gs > thr)).mean()
    assert agree > 0.95, agree
