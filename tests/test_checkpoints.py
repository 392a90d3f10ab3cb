import os

import numpy as np
import jax.numpy as jnp

from instance_nerf_tpu.train.checkpoints import CheckpointManager, load_embedded_config


def make_state(v):
    return {
        "params": {"w": jnp.full((4, 4), float(v)), "b": jnp.zeros((4,))},
        "step": jnp.asarray(v),
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    mgr.save(1, make_state(1), config={"lr": 0.1}, metrics={"recall_50": 0.5})
    mgr.save(2, make_state(2), config={"lr": 0.1}, metrics={"recall_50": 0.7})
    state, meta = mgr.restore(make_state(0))
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 2.0)
    assert meta["step"] == 2
    assert meta["config"]["lr"] == 0.1


def test_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for i in range(1, 5):
        mgr.save(i, make_state(i))
    assert mgr.all_steps() == [3, 4]


def test_best_tracking(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3, best_metric="recall_50")
    mgr.save(1, make_state(1), metrics={"recall_50": 0.5})
    mgr.save(2, make_state(2), metrics={"recall_50": 0.9})
    mgr.save(3, make_state(3), metrics={"recall_50": 0.6})
    state, meta = mgr.restore(make_state(0), best=True)
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 2.0)
    # best survives restart
    mgr2 = CheckpointManager(str(tmp_path), keep=3, best_metric="recall_50")
    assert mgr2.best_value == 0.9


def test_restore_any_no_template(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(5, make_state(7), config={"backbone": "vgg_EF"})
    state, meta = mgr.restore_any()
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 7.0)
    assert load_embedded_config(str(tmp_path))["backbone"] == "vgg_EF"


def test_save_with_structured_metrics(tmp_path):
    """Eval metrics may carry per-class AP lists with Nones for absent
    classes (rcnn eval since the per-class breakdown) — save() must not
    choke on non-scalar values (regression: float() on a list killed
    the 48^3 recipe-validation run at its first eval save)."""
    mgr = CheckpointManager(str(tmp_path), keep=2, best_metric="box_mAP_25")
    metrics = {
        "box_mAP_25": 0.25,
        "box_AP_25_per_class": [0.0, 0.5, None, 0.25],
        "nested": {"a": 1, "b": [None, 2.0]},
        "npfloat": np.float32(0.125),
    }
    mgr.save(1, make_state(1), config={"lr": 1e-3}, metrics=metrics)
    _, meta = mgr.restore_any(step=1)
    assert meta["metrics"]["box_AP_25_per_class"] == [0.0, 0.5, None, 0.25]
    assert meta["metrics"]["nested"] == {"a": 1, "b": [None, 2.0]}
    assert meta["metrics"]["npfloat"] == 0.125
    assert meta["metric_value"] == 0.25


def test_torn_checkpoint_not_offered_for_resume(tmp_path):
    """A save interrupted after the state write but before meta.json
    (crash/tunnel death) must be invisible to latest_step/restore
    (regression: resume picked the torn step_40 and died on meta.json)."""
    mgr = CheckpointManager(str(tmp_path), keep=3)
    mgr.save(1, make_state(1), config={})
    # simulate the torn save: state dir present, no meta.json
    torn = tmp_path / "step_2"
    (torn / "state").mkdir(parents=True)
    os.rename(tmp_path / "step_1" / "meta.json", tmp_path / "keep_meta")
    os.rename(tmp_path / "keep_meta", tmp_path / "step_1" / "meta.json")
    assert mgr.all_steps() == [1]
    assert mgr.latest_step() == 1
    state, meta = mgr.restore(make_state(0))
    assert meta["step"] == 1
