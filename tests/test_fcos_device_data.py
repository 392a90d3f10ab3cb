"""Device-resident FCOS train split: on-device augment parity with the
host transforms (augment.py) and the end-to-end index-fed loop."""
import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.data.augment import flip_axis, rotate90_z
from instance_nerf_tpu.train.fcos_trainer import device_augment


def _padded(g, pad):
    out = np.zeros((*pad, g.shape[-1]), np.float32)
    out[: g.shape[0], : g.shape[1], : g.shape[2]] = g
    return out


def _run_device(g_pad, size, boxes, flip_p, rot_p, obb=False):
    g, s, b = device_augment(
        jax.random.key(0), jnp.asarray(g_pad, jnp.bfloat16),
        jnp.asarray(size, jnp.float32), jnp.asarray(boxes, jnp.float32),
        flip_p, rot_p, obb)
    return np.asarray(g, np.float32), np.asarray(s), np.asarray(b)


def test_device_rot90_matches_host_padded_scene():
    rng = np.random.default_rng(0)
    g = (rng.uniform(0, 1, (6, 10, 4, 4)) > 0.5).astype(np.float32)
    boxes = np.asarray([[1.0, 2, 0, 5, 9, 3], [0.0, 0, 0, 2, 3, 1]],
                       np.float32)
    pad = (12, 12, 4)
    want_g, want_b = rotate90_z(g, boxes.copy())
    got_g, got_s, got_b = _run_device(
        _padded(g, pad), (6, 10, 4), boxes, flip_p=0.0, rot_p=1.0)
    np.testing.assert_array_equal(
        got_g[: want_g.shape[0], : want_g.shape[1], : want_g.shape[2]],
        want_g)
    # padding stays zero outside the rotated content
    assert got_g[want_g.shape[0]:].sum() == 0
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)
    np.testing.assert_array_equal(got_s, [10, 6, 4])


def test_device_flips_match_host():
    rng = np.random.default_rng(1)
    g = rng.uniform(0, 1, (8, 8, 6, 4)).astype(np.float32)
    boxes = np.asarray([[1.0, 2, 1, 5, 7, 4]], np.float32)
    want_g, want_b = flip_axis(*flip_axis(g, boxes.copy(), 0), 1)
    got_g, _, got_b = _run_device(
        g, (8, 8, 6), boxes, flip_p=1.0, rot_p=0.0)
    np.testing.assert_allclose(got_g, want_g, atol=1e-2)  # bf16 grid
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)


def test_device_flip_obb_theta_negates():
    g = np.zeros((4, 4, 4, 4), np.float32)
    obb = np.asarray([[2.0, 1, 1, 2, 1, 1, 0.3]], np.float32)
    want_g, want_b = flip_axis(*flip_axis(g, obb.copy(), 0), 1)
    _, _, got_b = _run_device(g, (4, 4, 4), obb, flip_p=1.0, rot_p=0.0,
                              obb=True)
    np.testing.assert_allclose(got_b, want_b, atol=1e-5)


def test_fcos_device_data_loop_runs(tmp_path):
    from instance_nerf_tpu.data.synthetic import write_dataset
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer

    root = str(tmp_path / "ds")
    write_dataset(root, num_scenes=4, grid_size=(16, 16, 16), num_boxes=2,
                  splits=(0.75, 0.25))
    cfg = FCOSConfig(
        features_path=f"{root}/features", boxes_path=f"{root}/metadata",
        dataset_split=f"{root}/dataset_split.json",
        resolution=16, batch_size=2, num_epochs=2, steps_per_call=2,
        device_data=True, eval_interval=10 ** 9, max_gt=4,
        dtype="float32",
    )
    t = FCOSTrainer(cfg)
    t.train_loop()  # finishes without error; losses synced each dispatch


def test_stop_after_epochs_chunked_resume(tmp_path):
    """Chunked training (stop_after_epochs) + resume covers the queue
    pattern the OBB/e2e drivers rely on: two 1-epoch train_loop() calls
    with resume reach the same checkpoint step as one 2-epoch run, and
    a negative stop_after_epochs restores without training (eval_only)."""
    from instance_nerf_tpu.data.synthetic import write_dataset
    from instance_nerf_tpu.train.fcos_trainer import FCOSConfig, FCOSTrainer

    root = str(tmp_path / "ds")
    write_dataset(root, num_scenes=4, grid_size=(16, 16, 16), num_boxes=2,
                  splits=(0.75, 0.25))
    kw = dict(
        features_path=f"{root}/features", boxes_path=f"{root}/metadata",
        dataset_split=f"{root}/dataset_split.json",
        save_path=str(tmp_path / "ckpt"),
        resolution=16, batch_size=2, num_epochs=2, steps_per_call=1,
        device_data=True, eval_interval=10 ** 9, max_gt=4,
        dtype="float32",
    )
    t = FCOSTrainer(FCOSConfig(**kw, stop_after_epochs=1))
    steps_per_epoch = max(1, len(t.make_dataset("train")) // 2)
    t.train_loop()  # chunk 1: epoch 0 only
    assert t.ckpt.latest_step() == steps_per_epoch
    t.cfg.resume = True
    t.train_loop()  # chunk 2: epoch 1
    assert t.ckpt.latest_step() == 2 * steps_per_epoch
    # eval_only: restore, train nothing, step unchanged
    t.cfg.stop_after_epochs = -1
    t.train_loop()
    assert t.ckpt.latest_step() == 2 * steps_per_epoch
