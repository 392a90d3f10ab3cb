"""Checkpoint save/restore with embedded config (orbax).

Capability parity with the reference's checkpointing (SURVEY.md §5.4):
component state dicts + the full train-args dict embedded in the
checkpoint (run_rcnn.py:449-469 re-hydrates constructor args from it),
``--resume`` restoring optimizer/scheduler/epoch, best-model tracking by
val metric, and keep-N retention.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _jsonable(v):
    """Metric values may be scalars OR structured (e.g. per-class AP
    lists with Nones for absent classes) — keep anything JSON-native,
    coerce numpy/jax scalars to float."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return float(v)


class CheckpointManager:
    """Step-indexed checkpoints under ``dir/step_N`` + ``dir/best``.

    Each checkpoint stores the pytree state plus ``config.json`` (the
    embedded train args). Retention keeps the ``keep`` most recent.
    """

    def __init__(self, directory: str, keep: int = 2, best_metric: str | None = None):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.keep = keep
        self.best_metric = best_metric
        self.best_value = -float("inf")
        self._ckptr = ocp.StandardCheckpointer()
        # recover best value across restarts
        best_meta = os.path.join(self.dir, "best", "meta.json")
        if os.path.isfile(best_meta):
            with open(best_meta) as f:
                self.best_value = json.load(f).get("metric_value", -float("inf"))

    # -- save ---------------------------------------------------------------

    def save(self, step: int, state: Any, config: dict | None = None,
             metrics: dict | None = None):
        path = os.path.join(self.dir, f"step_{step}")
        self._write(path, state, config, metrics, step)
        self._retain()
        if self.best_metric and metrics and self.best_metric in metrics:
            v = float(metrics[self.best_metric])
            if v > self.best_value:
                self.best_value = v
                best = os.path.join(self.dir, "best")
                if os.path.isdir(best):
                    shutil.rmtree(best)
                shutil.copytree(path, best)

    def _write(self, path, state, config, metrics, step):
        if os.path.isdir(path):
            shutil.rmtree(path)
        self._ckptr.save(os.path.join(path, "state"), _tree_to_numpy(state))
        self._ckptr.wait_until_finished()
        meta = {
            "step": step,
            "config": config or {},
            "metrics": {k: _jsonable(v) for k, v in (metrics or {}).items()},
        }
        if self.best_metric and metrics and self.best_metric in metrics:
            meta["metric_value"] = float(metrics[self.best_metric])
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    def _retain(self):
        steps = self.all_steps()
        for s in steps[: -self.keep]:
            shutil.rmtree(os.path.join(self.dir, f"step_{s}"), ignore_errors=True)

    # -- load ---------------------------------------------------------------

    def all_steps(self) -> list[int]:
        """Committed steps only: ``meta.json`` is written LAST in
        ``_write`` and so acts as the commit marker — a save interrupted
        mid-write (crash, tunnel death) leaves ``state`` without it and
        must not be offered for resume."""
        steps = []
        for d in os.listdir(self.dir):
            if d.startswith("step_") and os.path.isfile(
                os.path.join(self.dir, d, "meta.json")
            ):
                try:
                    steps.append(int(d.split("_")[1]))
                except ValueError:
                    pass
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore_any(self, step: int | None = None, best: bool = False):
        """Restore without a template (returns plain numpy pytree + meta).
        Used to graft sub-trees (e.g. RPN backbone -> RCNN) across
        differently-shaped states (run_rcnn.py:390-427 pattern)."""
        if best:
            path = os.path.join(self.dir, "best")
        else:
            step = step if step is not None else self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.dir}")
            path = os.path.join(self.dir, f"step_{step}")
        state = self._ckptr.restore(os.path.join(path, "state"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, meta

    def restore(self, state_template: Any, step: int | None = None,
                best: bool = False):
        """Restore into the structure of ``state_template``. Returns
        (state, meta dict)."""
        if best:
            path = os.path.join(self.dir, "best")
        else:
            step = step if step is not None else self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.dir}")
            path = os.path.join(self.dir, f"step_{step}")
        state = self._ckptr.restore(
            os.path.join(path, "state"), _tree_to_numpy(state_template)
        )
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, meta


def load_embedded_config(ckpt_dir: str, step: int | None = None) -> dict:
    """Read just the embedded train config (run_rcnn.py:369-378 pattern:
    eval re-consumes the training args from the checkpoint)."""
    mgr = CheckpointManager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    path = os.path.join(ckpt_dir, "best" if step is None else f"step_{step}")
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)["config"]
