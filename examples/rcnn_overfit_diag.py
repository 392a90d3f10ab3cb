"""CPU diagnostic for VERDICT r2 weak #3 (class-aware mAP 0.11):
can the RoI class head learn classes AT ALL when the backbone is
trainable?

Trains the full RCNN (unfrozen, random-init backbone) on 2 tiny 64-res
room scenes and reports IN-SAMPLE argmax-class accuracy on GT boxes fed
as ROIs. Outcomes:
  - acc -> ~1.0: label flow + losses are correct; the held-out failure
    is the frozen objectness-trained backbone (recipe) -> fix by
    unfreezing for a fine-tune stage in the benchmark driver.
  - acc stuck at chance/background: a real label/loss/score bug.
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.data.synthetic import write_dataset
from instance_nerf_tpu.data.datasets import SegmentationDataset
from instance_nerf_tpu.train.rcnn_trainer import RCNNConfig, RCNNTrainer


def gt_class_accuracy(tr, ds, n_scenes=2):
    """Feed GT boxes as ROIs; report argmax class vs GT label."""
    correct, total, rows = 0, 0, []
    for i in range(min(n_scenes, len(ds))):
        d = ds.load_scene(i)
        gt = np.asarray(d["boxes"], np.float32)
        gl = np.asarray(d["class_ids"], np.int64)
        grids = jnp.asarray(d["grid"])[None]
        rois = jnp.asarray(gt)[None]
        feats = tr.model.apply(tr.params, grids, method=tr.model.features)
        logits, _ = tr.model.apply(tr.params, feats, rois,
                                   method=tr.model.box_forward)
        pred = np.asarray(jnp.argmax(logits[0], axis=-1))
        sm = np.asarray(jax.nn.softmax(logits[0], axis=-1))
        for j in range(len(gl)):
            rows.append((int(gl[j]), int(pred[j]),
                         round(float(sm[j, gl[j]]), 3),
                         round(float(sm[j].max()), 3)))
        correct += int((pred == gl).sum())
        total += len(gl)
    return correct / max(total, 1), rows


def main():
    root = os.path.join(tempfile.gettempdir(), "rcnn_overfit64")
    if not os.path.exists(os.path.join(root, "dataset_split.json")):
        write_dataset(root, num_scenes=2, grid_size=(64, 64, 48),
                      num_boxes=5, style="room", splits=(1.0, 0.0))
    cfg = RCNNConfig(
        dataset_root=root, resolution=64, batch_size=2,
        num_epochs=int(os.environ.get("DIAG_EPOCHS", "150")),
        freeze_backbone=False, lr=1e-3, eval_interval=10 ** 9,
        log_interval=20, batch_size_per_image=64, max_rois=64,
        cache_scenes=True, dtype="float32",
    )
    tr = RCNNTrainer(cfg)
    tr.init_state()
    ds = SegmentationDataset("train", root, cache=True)
    acc0, _ = gt_class_accuracy(tr, ds)
    print(f"pre-train GT-roi class acc: {acc0:.3f}", flush=True)
    tr.train_loop()
    acc, rows = gt_class_accuracy(tr, ds)
    print(f"post-train GT-roi class acc: {acc:.3f}")
    print("(gt, pred, p_gt, p_max):", rows)
    verdict = ("label flow OK -> held-out failure is the frozen-backbone "
               "recipe" if acc >= 0.8 else
               "CLASS PATH BUG: cannot overfit 2 scenes")
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
