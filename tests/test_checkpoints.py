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
