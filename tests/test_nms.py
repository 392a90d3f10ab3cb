import numpy as np
import jax
import jax.numpy as jnp

from instance_nerf_tpu.ops import nms as N
from tests.test_boxes import random_aabbs, ref_iou_aabb


def greedy_nms_numpy(boxes, scores, thr):
    """Reference greedy NMS (semantics of nerf_rcnn/model/utils.py:217-232)."""
    idxs = np.argsort(-scores)
    keep = []
    while len(idxs):
        i = idxs[0]
        keep.append(i)
        if len(idxs) == 1:
            break
        ious = np.array([ref_iou_aabb(boxes[i], boxes[j]) for j in idxs[1:]])
        idxs = idxs[1:][ious <= thr]
    return sorted(keep)


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes = random_aabbs(rng, 40, size=50.0)
        scores = rng.uniform(0, 1, 40).astype(np.float32)
        for thr in (0.1, 0.3, 0.5):
            keep = N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thr)
            got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
            want = greedy_nms_numpy(boxes, scores, thr)
            assert got == want, f"trial={trial} thr={thr}"


def test_nms_respects_valid_mask():
    rng = np.random.default_rng(1)
    boxes = random_aabbs(rng, 20)
    scores = rng.uniform(0, 1, 20).astype(np.float32)
    valid = np.zeros(20, dtype=bool)
    valid[:10] = True
    keep = np.asarray(
        N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5, jnp.asarray(valid))
    )
    assert not keep[10:].any()
    # result on first 10 must equal NMS run on them alone
    keep10 = np.asarray(N.nms_mask(jnp.asarray(boxes[:10]), jnp.asarray(scores[:10]), 0.5))
    np.testing.assert_array_equal(keep[:10], keep10)


def test_batched_nms_is_per_class():
    rng = np.random.default_rng(2)
    boxes = random_aabbs(rng, 30, size=30.0)
    scores = rng.uniform(0, 1, 30).astype(np.float32)
    classes = rng.integers(0, 3, 30)
    keep = np.asarray(
        N.batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.25
        )
    )
    for c in range(3):
        sel = classes == c
        want = greedy_nms_numpy(boxes[sel], scores[sel], 0.25)
        got = sorted(np.nonzero(keep[sel])[0].tolist())
        assert got == want, f"class {c}"


def test_nms_jits():
    rng = np.random.default_rng(3)
    boxes = jnp.asarray(random_aabbs(rng, 16))
    scores = jnp.asarray(rng.uniform(0, 1, 16).astype(np.float32))
    f = jax.jit(lambda b, s: N.nms_mask(b, s, 0.5))
    keep1 = np.asarray(f(boxes, scores))
    keep2 = np.asarray(N.nms_mask(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep1, keep2)


def test_top_k_by_score():
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7])
    valid = jnp.asarray([True, True, False, True])
    idx, mask = N.top_k_by_score(scores, 3, valid)
    assert np.asarray(idx).tolist() == [1, 3, 0]
    assert np.asarray(mask).all()
