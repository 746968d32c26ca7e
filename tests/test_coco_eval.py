import numpy as np

from uvhand_tpu.evaluation.coco_eval import (
    assembly_keypoint_metrics, box_iou, evaluate_detections,
)


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detections_ap1():
    gts = [{"boxes": [[0, 0, 10, 10], [20, 20, 40, 40]], "labels": [1, 2]}]
    preds = [{"boxes": [[0, 0, 10, 10], [20, 20, 40, 40]], "labels": [1, 2],
              "scores": [0.9, 0.8]}]
    out = evaluate_detections(preds, gts)
    assert abs(out["AP"] - 1.0) < 1e-6
    assert abs(out["AP50"] - 1.0) < 1e-6


def test_missed_and_false_positive():
    gts = [{"boxes": [[0, 0, 10, 10]], "labels": [1]}]
    preds = [{"boxes": [[50, 50, 60, 60]], "labels": [1], "scores": [0.9]}]
    out = evaluate_detections(preds, gts)
    assert out["AP"] < 0.01


def test_assembly_keypoint_metrics(rng):
    gt = rng.uniform(0, 1, (2, 3, 63)).astype(np.float32)
    pred = gt.copy()
    valid = np.ones((2, 3), bool)
    out = assembly_keypoint_metrics(pred, gt, valid)
    assert out["mpjpe_uv_px"] == 0.0
    pred2 = gt + 0.01
    out2 = assembly_keypoint_metrics(pred2, gt, valid)
    assert out2["mpjpe_uv_px"] > 1.0  # ~1% of 640/480 px
