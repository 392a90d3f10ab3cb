import numpy as np

from instance_nerf_tpu.eval import metrics as M


def perfect_preds(gts):
    return [g.copy() for g in gts], [np.linspace(1, 0.5, len(g)) for g in gts]


def test_recall_perfect():
    rng = np.random.default_rng(0)
    gts = [
        np.sort(rng.uniform(0, 50, (4, 6)).reshape(4, 2, 3), axis=1).reshape(4, 6)
        + np.array([0, 0, 0, 5, 5, 5])
        for _ in range(3)
    ]
    preds, scores = perfect_preds(gts)
    r = M.evaluate_box_proposals_recall(preds, scores, gts)
    assert r["num_pos"] == 12
    np.testing.assert_allclose(r["recalls"], 1.0)
    np.testing.assert_allclose(r["ar"], 1.0)


def test_recall_no_preds():
    gts = [np.array([[0, 0, 0, 5, 5, 5.0]])]
    r = M.evaluate_box_proposals_recall([np.zeros((0, 6))], [np.zeros(0)], gts)
    assert r["num_pos"] == 0  # scene skipped entirely (ref semantics)


def test_recall_half():
    gt = np.array([[0, 0, 0, 10, 10, 10], [20, 20, 20, 30, 30, 30.0]])
    preds = np.array([[0, 0, 0, 10, 10, 10.0]])  # only covers gt 0
    r = M.evaluate_box_proposals_recall([preds], [np.array([0.9])], [gt])
    np.testing.assert_allclose(r["recalls"], 0.5)


def test_recall_limit():
    gt = np.array([[0, 0, 0, 10, 10, 10.0]])
    # best proposal has LOW score; limit=1 keeps only the bad one
    preds = np.array([[50, 50, 50, 60, 60, 60], [0, 0, 0, 10, 10, 10.0]])
    scores = np.array([0.9, 0.1])
    r = M.evaluate_box_proposals_recall([preds], [scores], [gt], limit=1)
    np.testing.assert_allclose(r["recalls"], 0.0)


def test_voc_ap_perfect():
    rng = np.random.default_rng(1)
    gts = [
        np.sort(rng.uniform(0, 50, (3, 6)).reshape(3, 2, 3), axis=1).reshape(3, 6)
        + np.array([0, 0, 0, 5, 5, 5])
        for _ in range(2)
    ]
    preds, scores = perfect_preds(gts)
    r = M.evaluate_box_proposals_ap(preds, scores, gts, iou_thresh=0.25)
    np.testing.assert_allclose(r["ap"], 1.0, atol=1e-6)


def test_voc_ap_duplicates_are_fp():
    gt = [np.array([[0, 0, 0, 10, 10, 10.0]])]
    preds = [np.array([[0, 0, 0, 10, 10, 10], [0, 0, 0, 10, 10, 10.0]])]
    scores = [np.array([0.9, 0.8])]
    r = M.evaluate_box_proposals_ap(preds, scores, gt, iou_thresh=0.5)
    # 1 TP + 1 FP duplicate: AP stays 1.0 (recall saturates first), but
    # final precision is 0.5
    np.testing.assert_allclose(r["precisions"][-1], 0.5)
    np.testing.assert_allclose(r["ap"], 1.0, atol=1e-6)


def test_average_precision_runs():
    gt = [np.array([[0, 0, 0, 10, 10, 10.0]])]
    preds = [np.array([[0, 0, 0, 10, 10, 10], [30, 30, 30, 40, 40, 40.0]])]
    scores = [np.array([0.9, 0.3])]
    r = M.evaluate_box_proposals_average_precision(preds, scores, gt, iou_thresh=0.25)
    assert 0.0 < r["ap"] <= 1.0


def test_map_recall_classes():
    gt_boxes = [np.array([[0, 0, 0, 10, 10, 10], [20, 20, 20, 30, 30, 30.0]])]
    gt_labels = [np.array([1, 2])]
    pred_boxes = [np.array([[0, 0, 0, 10, 10, 10], [20, 20, 20, 30, 30, 30.0]])]
    pred_labels = [np.array([1, 2])]
    scores = [np.array([0.9, 0.8])]
    ap, rec = M.evaluate_map_recall(
        pred_boxes, scores, pred_labels, gt_boxes, gt_labels, iou_thresh=0.25
    )
    np.testing.assert_allclose(ap[1:], 1.0)
    np.testing.assert_allclose(rec[1:], 1.0)


def test_map_recall_wrong_class_is_fp():
    gt_boxes = [np.array([[0, 0, 0, 10, 10, 10.0]])]
    gt_labels = [np.array([1])]
    pred_boxes = [np.array([[0, 0, 0, 10, 10, 10.0]])]
    pred_labels = [np.array([2])]  # right box, wrong class
    scores = [np.array([0.9])]
    ap, rec = M.evaluate_map_recall(
        pred_boxes, scores, pred_labels, gt_boxes, gt_labels
    )
    np.testing.assert_allclose(ap[1], 0.0)  # class 1: gt but no preds
    # class 2 has predictions but no gt: reference leaves rec[l] None ->
    # AP is NaN (eval.py:491-494), excluded from the mean
    assert np.isnan(ap[2])


def test_map_recall_mask_iou():
    m_gt = np.zeros((1, 8, 8, 8), bool)
    m_gt[0, :4] = True
    m_pred = np.zeros((1, 8, 8, 8), bool)
    m_pred[0, :4] = True
    ap, rec = M.evaluate_map_recall(
        [m_pred], [np.array([0.9])], [np.array([1])],
        [m_gt], [np.array([1])], iou_type="mask",
    )
    np.testing.assert_allclose(ap[1], 1.0)


def test_mask_iou_3d_np():
    a = np.zeros((2, 4, 4, 4), bool)
    a[0, :2] = True
    a[1, 2:] = True
    iou = M.mask_iou_3d_np(a, a)
    np.testing.assert_allclose(iou, np.eye(2))


def test_evaluate_labels_and_classification():
    props = [np.array([[0, 0, 0, 10, 10, 10], [50, 50, 50, 60, 60, 60.0]])]
    gts = [np.array([[0, 0, 0, 10, 10, 10.0]])]
    labels = M.evaluate_labels(props, gts, ap_thresholds=(0.5,))
    assert labels[0][0].tolist() == [1, 0]
    scores = [np.array([0.9, 0.8])]
    acc = M.evaluate_classification_accuracy(scores, labels[0], threshold=0.85)
    np.testing.assert_allclose(acc, 1.0)
    res = M.evaluate_classification(scores, labels[0], threshold=0.85)
    np.testing.assert_allclose(res["precision"], 1.0)
