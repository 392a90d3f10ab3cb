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


def test_streamed_sweep_matches_dense_aabb():
    """O(block*N)-memory streamed sweep == dense O(N^2) sweep, AABB."""
    rng = np.random.default_rng(4)
    n = 700  # non-multiple of block to exercise padding
    boxes = random_aabbs(rng, n, size=40.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(size=n) < 0.9
    order = np.argsort(-np.where(valid, scores, -1e30))
    sboxes = jnp.asarray(boxes[order])
    svalid = jnp.asarray(valid[order])
    from instance_nerf_tpu.ops.boxes import box_iou_3d

    dense = N._sweep_xla(box_iou_3d(sboxes, sboxes), svalid, 0.3)
    streamed = N._sweep_xla_streamed(sboxes, svalid, 0.3, block=128)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(streamed))


def test_streamed_sweep_matches_dense_obb():
    rng = np.random.default_rng(5)
    n = 200
    ctr = rng.uniform(10, 40, (n, 3))
    ext = rng.uniform(4, 15, (n, 3))
    theta = rng.uniform(-np.pi / 2, np.pi / 2, (n, 1))
    boxes = jnp.asarray(
        np.concatenate([ctr, ext, theta], -1), jnp.float32
    )
    valid = jnp.ones((n,), bool)
    from instance_nerf_tpu.ops.rotated_iou import cal_iou_3d

    iou = cal_iou_3d(boxes[:, None, :], boxes[None, :, :])
    dense = N._sweep_xla(iou, valid, 0.3)
    streamed = N._sweep_xla_streamed(boxes, valid, 0.3, block=64)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(streamed))


def test_nms_boxes_pallas_interpret_matches_dense():
    """Fused in-kernel-IoU Pallas sweep (interpret mode) == dense sweep."""
    from instance_nerf_tpu.kernels.nms_pallas import nms_boxes_pallas
    from instance_nerf_tpu.ops.boxes import box_iou_3d

    rng = np.random.default_rng(6)
    n = 300
    boxes = random_aabbs(rng, n, size=40.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(size=n) < 0.9
    order = np.argsort(-np.where(valid, scores, -1e30))
    sboxes = jnp.asarray(boxes[order], jnp.float32)
    svalid = jnp.asarray(valid[order])
    dense = N._sweep_xla(box_iou_3d(sboxes, sboxes), svalid, 0.3)
    fused = nms_boxes_pallas(sboxes, svalid, 0.3, interpret=True)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(fused))


def test_top_k_by_score():
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7])
    valid = jnp.asarray([True, True, False, True])
    idx, mask = N.top_k_by_score(scores, 3, valid)
    assert np.asarray(idx).tolist() == [1, 3, 0]
    assert np.asarray(mask).all()


def test_nms_boxes_pallas_vmap_interpret():
    """nms_boxes_pallas under vmap (fcos_postprocess wraps NMS in a
    per-scene vmap) matches per-scene dense sweeps."""
    from instance_nerf_tpu.kernels.nms_pallas import nms_boxes_pallas
    from instance_nerf_tpu.ops.boxes import box_iou_3d

    rng = np.random.default_rng(7)
    b, n = 3, 140
    boxes = np.stack([random_aabbs(rng, n, size=40.0) for _ in range(b)])
    valid = rng.uniform(size=(b, n)) < 0.9
    sboxes = jnp.asarray(boxes, jnp.float32)
    svalid = jnp.asarray(valid)
    got = jax.vmap(lambda bb, vv: nms_boxes_pallas(bb, vv, 0.3,
                                                   interpret=True))(
        sboxes, svalid)
    for i in range(b):
        want = N._sweep_xla(box_iou_3d(sboxes[i], sboxes[i]), svalid[i], 0.3)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want)), i
