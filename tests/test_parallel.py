import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.parallel.mesh import (
    batch_sharding,
    data_axis_size,
    grid_sharding,
    make_mesh,
    shard_batch,
)


def test_data_axis_size():
    assert data_axis_size(4, 8) == 4
    assert data_axis_size(2, 8) == 2
    assert data_axis_size(3, 8) == 3
    assert data_axis_size(16, 8) == 8
    assert data_axis_size(5, 4) == 1  # largest divisor of 5 <= 4


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert dict(mesh.shape) == {"dcn": 1, "data": 4, "sp": 2}
    mesh1 = make_mesh(n_data=8, n_spatial=1)
    assert dict(mesh1.shape) == {"dcn": 1, "data": 8, "sp": 1}
    mesh2 = make_mesh(n_dcn=2, n_data=2, n_spatial=2)
    assert dict(mesh2.shape) == {"dcn": 2, "data": 2, "sp": 2}


def test_make_mesh_rejects_oversubscription():
    import pytest

    with pytest.raises(ValueError):
        make_mesh(n_dcn=4, n_data=4, n_spatial=4)


def test_multislice_mesh_trains_scenes_over_dcn_x_data():
    """Scenes shard over dcn x data; the sharded sum is still global —
    the 2x2x2 multi-slice topology of SURVEY §2.16's scale-out story."""
    mesh = make_mesh(n_dcn=2, n_data=2, n_spatial=2)
    x = np.arange(64, dtype=np.float32).reshape(4, 16)
    with mesh:
        (xs,) = shard_batch(mesh, (x,))
        total = jax.jit(jnp.sum)(xs)
    assert len({s.device for s in xs.addressable_shards}) == 8
    np.testing.assert_allclose(float(total), x.sum())


def test_shard_batch_places_arrays():
    mesh = make_mesh(n_data=4, n_spatial=2)
    grids = np.zeros((4, 16, 8, 8, 4), np.float32)
    sizes = np.zeros((4, 3), np.float32)
    scalar = np.zeros((3,), np.float32)  # not divisible -> replicated
    with mesh:
        g, s, c = shard_batch(mesh, (grids, sizes, scalar))
    assert g.sharding.spec == grid_sharding(mesh).spec
    # per-device shard of the grid: batch/4, W/2
    shard = g.addressable_shards[0].data
    assert shard.shape == (1, 8, 8, 8, 4)
    assert s.addressable_shards[0].data.shape == (1, 3)
    assert c.sharding.is_fully_replicated


def test_sharded_sum_is_global():
    mesh = make_mesh(n_data=8, n_spatial=1)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    with mesh:
        (xs,) = shard_batch(mesh, (x,))
        total = jax.jit(jnp.sum)(xs)
    np.testing.assert_allclose(float(total), x.sum())


def test_prefetch_loader_propagates_errors():
    import pytest

    from instance_nerf_tpu.data.prefetch import PrefetchLoader

    def bad(i):
        if i == 2:
            raise ValueError("boom")
        return i

    loader = PrefetchLoader(bad, 5)
    with pytest.raises(ValueError):
        list(loader)


def test_fcos_scan_step_matches_sequential():
    """make_fcos_scan_step(K) == K sequential single steps (same batches,
    same init) — the multi-step dispatch must not change training."""
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.models.fcos import FCOSOverNeRF
    from instance_nerf_tpu.parallel.train_step import (
        init_fcos_state,
        make_fcos_scan_step,
        make_fcos_train_step,
        make_optimizer,
    )

    model = FCOSOverNeRF(backbone=VGG_FPN(cfg="AF", input_size=160))
    tx = make_optimizer(lr=1e-3, total_steps=4)
    g, b, k = 32, 2, 3
    rng = np.random.default_rng(0)
    grids = np.asarray(rng.uniform(0, 1, (k, b, g, g, g, 4)), np.float32)
    sizes = np.full((k, b, 3), float(g), np.float32)
    gt = np.tile(np.array([[4, 4, 4, 20, 20, 20.0]], np.float32),
                 (k, b, 1, 1))
    gtm = np.ones((k, b, 1), bool)

    state0 = init_fcos_state(model, tx, jnp.asarray(grids[0]))
    step = make_fcos_train_step(model, tx)
    s1 = state0
    for j in range(k):
        s1, m1 = step(s1, grids[j], sizes[j], gt[j], gtm[j])

    scan = make_fcos_scan_step(model, tx, k)
    s2, m2 = scan(state0, grids, sizes, gt, gtm)

    assert int(s2.step) == k
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_rcnn_scan_step_matches_sequential():
    """make_rcnn_scan_step(K) == K sequential steps with the same
    per-step key split (jax.random.split(key, K))."""
    import optax

    from instance_nerf_tpu.models import rcnn as RC
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.parallel.train_step import make_rcnn_scan_step
    from instance_nerf_tpu.train.rcnn_trainer import (
        RCNNConfig,
        make_rcnn_step_fn,
    )
    from instance_nerf_tpu.train.train_utils import partition_optimizer

    cfg = RCNNConfig(batch_size_per_image=8, num_classes=3,
                     freeze_backbone=True)
    model = RC.NeRF_RCNN(
        backbone=VGG_FPN(cfg="AF", input_size=160),
        num_classes=3,
        input_shape=(16, 16, 16),
    )
    ksteps, b, p, ngt, g = 2, 1, 4, 2, 16
    rng = np.random.default_rng(5)
    grids = np.asarray(rng.uniform(0, 1, (ksteps, b, g, g, g, 4)), np.float32)
    sizes = np.full((ksteps, b, 3), float(g), np.float32)
    lo = rng.uniform(0, g * 0.5, (ksteps, b, p, 3))
    hi = lo + rng.uniform(2, g * 0.4, (ksteps, b, p, 3))
    rois = np.asarray(np.concatenate([lo, np.minimum(hi, g)], -1), np.float32)
    glo = rng.uniform(0, g * 0.5, (ksteps, b, ngt, 3))
    ghi = glo + rng.uniform(2, g * 0.4, (ksteps, b, ngt, 3))
    gt = np.asarray(np.concatenate([glo, np.minimum(ghi, g)], -1), np.float32)
    gtl = np.asarray(rng.integers(1, 3, (ksteps, b, ngt)), np.int32)
    gtm = np.ones((ksteps, b, ngt), bool)
    rv = np.ones((ksteps, b, p), bool)
    vm = np.asarray(rng.uniform(0, 1, (ksteps, b, ngt, g, g, g)) < 0.2,
                    np.uint8)

    params = model.init(jax.random.key(0), jnp.asarray(grids[0]),
                        jnp.asarray(rois[0, :, :2]), with_masks=True)
    tx = partition_optimizer(
        optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-3)),
        params, frozen_prefixes=("backbone",),
    )
    opt_state = tx.init(params)
    mask_slots = 2
    key = jax.random.key(11)

    step = jax.jit(make_rcnn_step_fn(model, tx, cfg, mask_slots))
    keys = jax.random.split(key, ksteps)
    p1, o1 = params, opt_state
    for j in range(ksteps):
        p1, o1, m1 = step(p1, o1, keys[j], grids[j], sizes[j], rois[j],
                          rv[j], gt[j], gtl[j], gtm[j], vm[j])

    scan = make_rcnn_scan_step(model, tx, cfg, ksteps, mask_slots=mask_slots)
    p2, o2, m2 = scan(params, opt_state, key, grids, sizes, rois, rv, gt,
                      gtl, gtm, vm)
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_rcnn_sharded_step_matches_single_device():
    """The SPMD RoI-head step (batch over dcn x data, params replicated)
    produces the same update as the single-device jit — the DDP-parity
    property (ref run_rcnn.py:755-826 trains RCNN with DDP over 4 GPUs)."""
    import optax

    from instance_nerf_tpu.models import rcnn as RC
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.parallel.mesh import data_sharding, replicated
    from instance_nerf_tpu.parallel.train_step import make_rcnn_train_step
    from instance_nerf_tpu.train.rcnn_trainer import (
        RCNNConfig,
        make_rcnn_step_fn,
    )
    from instance_nerf_tpu.train.train_utils import partition_optimizer

    cfg = RCNNConfig(batch_size_per_image=16, num_classes=4,
                     freeze_backbone=True)
    model = RC.NeRF_RCNN(
        backbone=VGG_FPN(cfg="AF", input_size=160),
        num_classes=4,
        input_shape=(32, 32, 32),
    )
    b, p, k, g = 4, 8, 2, 32
    rng = np.random.default_rng(0)
    grids = jnp.asarray(rng.uniform(0, 1, (b, g, g, g, 4)), jnp.float32)
    sizes = jnp.full((b, 3), float(g))
    lo = rng.uniform(0, g * 0.5, (b, p, 3))
    hi = lo + rng.uniform(4, g * 0.4, (b, p, 3))
    rois = jnp.asarray(np.concatenate([lo, np.minimum(hi, g)], -1), jnp.float32)
    glo = rng.uniform(0, g * 0.5, (b, k, 3))
    ghi = glo + rng.uniform(4, g * 0.4, (b, k, 3))
    gt = jnp.asarray(np.concatenate([glo, np.minimum(ghi, g)], -1), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(1, 4, (b, k)), jnp.int32)
    gt_mask = jnp.ones((b, k), bool)
    roi_valid = jnp.ones((b, p), bool)
    vmasks = jnp.asarray(rng.uniform(0, 1, (b, k, g, g, g)) < 0.2, jnp.uint8)

    params = model.init(jax.random.key(0), grids[:1], rois[:1, :2],
                        with_masks=True)
    tx = partition_optimizer(
        optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-3)),
        params, frozen_prefixes=("backbone",),
    )
    opt_state = tx.init(params)
    mask_slots = 4
    args = (jax.random.key(7), grids, sizes, rois, roi_valid, gt, gt_labels,
            gt_mask, vmasks)

    p1, o1, m1 = jax.jit(make_rcnn_step_fn(model, tx, cfg, mask_slots))(
        params, opt_state, *args)

    mesh = make_mesh(n_data=2, n_spatial=2, n_dcn=2)
    step = make_rcnn_train_step(model, tx, cfg, mesh, mask_slots=mask_slots)
    with mesh:
        ds = data_sharding(mesh)
        rep = replicated(mesh)
        sharded = [jax.device_put(x, ds) for x in args[1:]]
        p2, o2, m2 = step(jax.device_put(params, rep),
                          jax.device_put(opt_state, rep), args[0], *sharded)

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
    assert int(m1["num_pos"]) == int(m2["num_pos"])
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # grads cross the device all-reduce in a different summation
        # order; adam's rsqrt amplifies near-zero elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=1e-4)


def test_rpn_sharded_step_matches_single_device():
    """The SPMD anchor-RPN step (batch over dcn x data, grids on sp,
    params replicated) produces the same update as the single-device jit
    — DDP parity for the last reference-parallelized stage (run_rpn.py
    mp.spawn, train_rpn.sh)."""
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.models.rpn import NeRFRegionProposalNetwork
    from instance_nerf_tpu.parallel.mesh import (
        data_sharding,
        grid_sharding,
        replicated,
    )
    from instance_nerf_tpu.parallel.train_step import (
        make_optimizer,
        make_rpn_train_step,
    )
    from instance_nerf_tpu.train.rpn_trainer import RPNConfig

    cfg = RPNConfig(resolution=32, batch_size_per_mesh=32,
                    proj2d_loss_weight=1.0)
    model = NeRFRegionProposalNetwork(backbone=VGG_FPN(cfg="AF", input_size=160))
    tx = make_optimizer(lr=1e-3, total_steps=4)
    b, g, k = 4, 32, 2
    rng = np.random.default_rng(0)
    grids = jnp.asarray(rng.uniform(0, 1, (b, g, g, g, 4)), jnp.float32)
    sizes = jnp.full((b, 3), float(g))
    lo = rng.uniform(0, g * 0.5, (b, k, 3))
    hi = lo + rng.uniform(4, g * 0.4, (b, k, 3))
    gt = jnp.asarray(np.concatenate([lo, np.minimum(hi, g)], -1), jnp.float32)
    gtm = jnp.ones((b, k), bool)
    key = jax.random.key(3)

    params = model.init(jax.random.key(0), grids[:1])
    state0 = (params, tx.init(params), jnp.zeros((), jnp.int32))

    s1, m1 = make_rpn_train_step(model, tx, cfg)(
        state0, key, grids, sizes, gt, gtm)

    mesh = make_mesh(n_data=2, n_spatial=2, n_dcn=2)
    step = make_rpn_train_step(model, tx, cfg, mesh=mesh)
    with mesh:
        rep = replicated(mesh)
        s2, m2 = step(
            jax.device_put(state0, rep), key,
            jax.device_put(grids, grid_sharding(mesh)),
            jax.device_put(sizes, data_sharding(mesh)),
            jax.device_put(gt, data_sharding(mesh)),
            jax.device_put(gtm, data_sharding(mesh)),
        )

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(s1[0]),
                    jax.tree_util.tree_leaves(s2[0])):
        # cross-device all-reduce changes the grad summation order;
        # adam's rsqrt amplifies near-zero elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=1e-4)


def test_rpn_train_loop_sharded_smoke(tmp_path):
    """RPNTrainer.train_loop drives the sharded step (the trainer mesh
    spans >1 virtual device here) end to end: loader -> augment ->
    SPMD step -> checkpoint."""
    from instance_nerf_tpu.data.synthetic import write_dataset
    from instance_nerf_tpu.train.rpn_trainer import RPNConfig, RPNTrainer

    root = str(tmp_path / "ds")
    write_dataset(root, num_scenes=4, grid_size=(32, 32, 32), num_boxes=3)
    cfg = RPNConfig(
        features_path=root + "/features",
        boxes_path=root + "/metadata",
        dataset_split=root + "/dataset_split.json",
        resolution=32,
        batch_size=2,
        num_epochs=1,
        eval_interval=10 ** 9,
        backbone_type="vgg_AF",
        max_gt=8,
        save_path=str(tmp_path / "ckpt"),
    )
    t = RPNTrainer(cfg)
    assert t.mesh.devices.size > 1  # conftest forces 8 virtual devices
    t.train_loop()
    assert int(t.state[2]) == 1  # 2 train scenes / bs 2 = 1 step
    assert t.ckpt.latest_step() == 1


def test_fcos_train_loop_scan_smoke(tmp_path):
    """train_loop with steps_per_call>1 exercises the stacked-batch scan
    dispatch path end to end (loader -> stack -> scan -> metrics)."""
    from instance_nerf_tpu.data.synthetic import write_dataset
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer

    root = str(tmp_path / "ds")
    write_dataset(root, num_scenes=8, grid_size=(32, 32, 32), num_boxes=3)
    cfg = FCOSConfig(
        features_path=root + "/features",
        boxes_path=root + "/metadata",
        dataset_split=root + "/dataset_split.json",
        resolution=32,
        batch_size=2,
        num_epochs=1,
        steps_per_call=2,
        eval_interval=10 ** 9,
        backbone_type="vgg_AF",
        max_gt=8,
    )
    t = FCOSTrainer(cfg)
    t.train_loop()  # 4 scenes / bs2 = 2 steps -> one scan dispatch
    assert int(t.state.step) == 2


def test_rcnn_train_loop_scan_smoke(tmp_path):
    from instance_nerf_tpu.data.synthetic import write_dataset
    from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig, RCNNTrainer

    root = str(tmp_path / "ds")
    write_dataset(root, num_scenes=4, grid_size=(32, 32, 32), num_boxes=3)
    cfg = RCNNConfig(
        dataset_root=root,
        resolution=32,
        batch_size=2,
        num_epochs=1,
        steps_per_call=2,
        eval_interval=10 ** 9,
        backbone_type="vgg_AF",
        num_classes=11,
        batch_size_per_image=16,
        max_rois=16,
        max_gt=8,
    )
    t = RCNNTrainer(cfg)
    t.train_loop()


def test_fcos_train_step_additional_l1_plumbed():
    """use_additional_l1_loss must reach fcos_loss through
    make_fcos_train_step (regression: the kwarg existed on FCOSConfig and
    fcos_loss but was dropped by the step factory, silently training OBB
    without the reference's midpoint-offset L1 — loss.py:570-577)."""
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.models.fcos import FCOSOverNeRF
    from instance_nerf_tpu.parallel.train_step import (
        init_fcos_state,
        make_fcos_train_step,
        make_optimizer,
    )

    model = FCOSOverNeRF(backbone=VGG_FPN(cfg="AF", input_size=160),
                         use_obb=True)
    tx = make_optimizer(lr=1e-3, total_steps=2)
    g = 32
    rng = np.random.default_rng(1)
    grids = jnp.asarray(rng.uniform(0, 1, (1, g, g, g, 4)), jnp.float32)
    sizes = jnp.full((1, 3), float(g), jnp.float32)
    gt = jnp.asarray([[[14.0, 14, 12, 12, 8, 10, 0.4]]], jnp.float32)
    gtm = jnp.ones((1, 1), bool)

    state = init_fcos_state(model, tx, grids)
    base = make_fcos_train_step(model, tx, use_obb=True)
    with_l1 = make_fcos_train_step(model, tx, use_obb=True,
                                   use_additional_l1_loss=True)
    _, m0 = base(state, grids, sizes, gt, gtm)
    _, m1 = with_l1(state, grids, sizes, gt, gtm)
    assert np.isfinite(float(m1["loss_reg"]))
    # the aux L1 adds a non-negative term that is nonzero for random init
    assert float(m1["loss_reg"]) > float(m0["loss_reg"])
