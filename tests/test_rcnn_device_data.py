"""Device-resident RCNN train loop (cfg.device_data): the whole split
uploads once (grids bf16, voxel masks bit-packed) and batches are
on-device index gathers. End-to-end on a tiny synthetic dataset."""
import json
import os

import numpy as np
import jax.numpy as jnp


def _write_tiny(root):
    from instance_nerf_tpu.data.synthetic import write_dataset

    write_dataset(root, num_scenes=4, grid_size=(16, 16, 16), num_boxes=2,
                  splits=(0.75, 0.25))


def test_device_data_loop_runs_and_packbits_roundtrip(tmp_path):
    from instance_nerf_tpu.data.datasets import SegmentationDataset
    from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig, RCNNTrainer

    root = str(tmp_path / "ds")
    _write_tiny(root)
    cfg = RCNNConfig(
        dataset_root=root, resolution=16, batch_size=2, num_epochs=2,
        steps_per_call=2, device_data=True, eval_interval=10 ** 9,
        batch_size_per_image=16, max_rois=32, max_gt=4,
        dtype="float32", freeze_backbone=False,
    )
    tr = RCNNTrainer(cfg)
    tr.init_state()

    # packbits store roundtrips exactly against the raw batch masks
    ds = SegmentationDataset("train", root)
    store = tr._build_device_store(ds)
    b0 = ds.batch([0], (16,) * 3, max_gt=4, max_rois=32)
    fn = tr._make_index_step(1)
    # reach the unpack through a gather: compare against raw uint8 masks
    pk = jnp.take(store["vmasks_packed"], jnp.asarray([0]), axis=0)
    shifts = 7 - jnp.arange(8, dtype=jnp.uint8)
    bits = ((pk[..., None] >> shifts) & jnp.uint8(1)).reshape(1, 4, 16, 16, 16)
    np.testing.assert_array_equal(np.asarray(bits[0]),
                                  b0.gt_voxel_masks[0])

    # the loop itself: scan path (spc=2) + finite losses
    import jax

    tr.train_loop()
    p, o, m = fn(tr.params, tr.opt_state, jax.random.key(0),
                 jnp.asarray([0, 1], jnp.int32), store)
    assert np.isfinite(float(m["total"]))


def test_frozen_backbone_precomputed_feats_matches_raw(tmp_path):
    """freeze_backbone + device_data stores the FPN pyramid instead of
    grids (reference's precomputed level_features, datasets.py:500-664);
    one step through it must match the raw-grid frozen step exactly."""
    import jax

    from instance_nerf_tpu.data.datasets import SegmentationDataset
    from instance_nerf_tpu.train.rcnn_trainer import (
        RCNNConfig, RCNNTrainer, make_rcnn_step_fn,
    )

    root = str(tmp_path / "ds")
    _write_tiny(root)
    cfg = RCNNConfig(
        dataset_root=root, resolution=16, batch_size=2, num_epochs=1,
        steps_per_call=1, device_data=True, eval_interval=10 ** 9,
        batch_size_per_image=16, max_rois=32, max_gt=4,
        dtype="float32", freeze_backbone=True,
    )
    tr = RCNNTrainer(cfg)
    tr.init_state()
    ds = SegmentationDataset("train", root)
    store = tr._build_device_store(ds)
    assert "feats" in store and "grids" not in store

    idx = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.key(3)
    fn = tr._make_index_step(1)
    p1, o1, m1 = fn(tr.params, tr.opt_state, key, idx, store)

    # raw-grid frozen step on the same batch
    raw = make_rcnn_step_fn(tr.model, tr.tx, cfg, tr.mask_slots)
    b = ds.batch([0, 1], (16,) * 3, max_gt=4, max_rois=32)
    p2, o2, m2 = jax.jit(raw)(
        tr.params, tr.opt_state, key,
        jnp.asarray(b.grids, jnp.float32), jnp.asarray(b.grid_sizes),
        jnp.asarray(b.rois), jnp.asarray(b.roi_mask),
        jnp.asarray(b.gt_boxes), jnp.asarray(b.gt_labels.astype(np.int32)),
        jnp.asarray(b.gt_mask), jnp.asarray(b.gt_voxel_masks),
    )
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=2e-4)
    # backbone params must be untouched by the update
    flat1 = jax.tree_util.tree_leaves(
        {k: v for k, v in p1["params"].items() if k == "backbone"})
    flat0 = jax.tree_util.tree_leaves(
        {k: v for k, v in tr.params["params"].items() if k == "backbone"})
    for a, b_ in zip(flat1, flat0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_reference_recipe_defaults():
    """The canonical reference recipe (train_rcnn.sh) trains the backbone
    (only the unused rpn_head is frozen, run_rcnn.py:406-427) with
    AdamW + OneCycle (run_rcnn.py:493-497). Pin both here so the default
    never silently regresses to the frozen mode again."""
    import optax

    from instance_nerf_tpu.parallel.train_step import make_optimizer
    from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig

    assert RCNNConfig().freeze_backbone is False

    # make_optimizer(total_steps) must produce a warmup->peak->decay lr
    sched = optax.cosine_onecycle_schedule(transition_steps=100,
                                           peak_value=1e-3)
    tx = make_optimizer(lr=1e-3, total_steps=100)
    assert tx is not None
    lrs = [float(sched(s)) for s in (0, 30, 99)]
    assert lrs[1] > lrs[0] and lrs[1] > lrs[2]


def test_remat_step_matches_no_remat():
    """cfg.remat only changes the autodiff schedule (backbone forward is
    recomputed in the backward), never the math: one step from identical
    state must produce identical losses and identical updated params."""
    import jax
    import jax.numpy as jnp
    import optax

    from instance_nerf_tpu.models import rcnn as RC
    from instance_nerf_tpu.models.backbones import VGG_FPN
    from instance_nerf_tpu.train.rcnn_trainer import (
        RCNNConfig, make_rcnn_step_fn,
    )

    g, b, p, k = 16, 1, 4, 2
    model = RC.NeRF_RCNN(
        backbone=VGG_FPN(cfg="AF", input_size=160), num_classes=3,
        input_shape=(g, g, g),
    )
    rng = np.random.default_rng(7)
    grids = jnp.asarray(rng.uniform(0, 1, (b, g, g, g, 4)), jnp.float32)
    sizes = jnp.full((b, 3), float(g))
    lo = rng.uniform(0, g * 0.5, (b, p, 3))
    hi = lo + rng.uniform(3, g * 0.4, (b, p, 3))
    rois = jnp.asarray(np.concatenate([lo, np.minimum(hi, g)], -1),
                       jnp.float32)
    glo = rng.uniform(0, g * 0.5, (b, k, 3))
    ghi = glo + rng.uniform(3, g * 0.4, (b, k, 3))
    gt = jnp.asarray(np.concatenate([glo, np.minimum(ghi, g)], -1),
                     jnp.float32)
    gt_labels = jnp.asarray(rng.integers(1, 3, (b, k)), jnp.int32)
    gt_mask = jnp.ones((b, k), bool)
    roi_valid = jnp.ones((b, p), bool)
    vmasks = jnp.asarray(rng.uniform(0, 1, (b, k, g, g, g)) < 0.2,
                         jnp.uint8)
    params = model.init(jax.random.key(1), grids, rois[:, :2],
                        with_masks=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    args = (jax.random.key(2), grids, sizes, rois, roi_valid, gt,
            gt_labels, gt_mask, vmasks)

    outs = {}
    for remat in (False, True):
        cfg = RCNNConfig(batch_size_per_image=8, num_classes=3,
                         freeze_backbone=False, remat=remat)
        step = jax.jit(make_rcnn_step_fn(model, tx, cfg, mask_slots=2))
        outs[remat] = step(params, opt, *args)

    for (pa, _, ma), (pb, _, mb) in [(outs[False], outs[True])]:
        np.testing.assert_allclose(float(ma["total"]), float(mb["total"]),
                                   rtol=1e-6)
        leaves_a = jax.tree.leaves(pa)
        leaves_b = jax.tree.leaves(pb)
        for la, lb in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-6)
