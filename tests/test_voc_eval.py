import numpy as np
import pytest

from aod_meh_hua_tpu.utils.voc_eval import eval_map, tpfp_default, average_precision


def test_perfect_detection_map_one():
    gt = {"bboxes": np.array([[0, 0, 10, 10]], np.float32), "labels": np.array([0])}
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    out = eval_map(dets, [gt], mode="11points")
    assert out["mAP"] == pytest.approx(1.0)
    out2 = eval_map(dets, [gt], mode="area")
    assert out2["mAP"] == pytest.approx(1.0)


def test_false_positive_and_duplicate():
    gt = {"bboxes": np.array([[0, 0, 10, 10]], np.float32), "labels": np.array([0])}
    dets = [[np.array([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8]], np.float32)]]
    tp, fp = tpfp_default(dets[0][0], gt["bboxes"])
    np.testing.assert_array_equal(tp, [1, 0])
    np.testing.assert_array_equal(fp, [0, 1])  # duplicate match is FP


def test_ignored_gt_neither_tp_nor_fp():
    gt = np.zeros((0, 4), np.float32)
    ig = np.array([[0, 0, 10, 10]], np.float32)
    det = np.array([[0, 0, 10, 10, 0.9]], np.float32)
    tp, fp = tpfp_default(det, gt, ig)
    assert tp[0] == 0 and fp[0] == 0


def test_low_iou_is_fp():
    gt = np.array([[0, 0, 10, 10]], np.float32)
    det = np.array([[8, 8, 20, 20, 0.9]], np.float32)
    tp, fp = tpfp_default(det, gt)
    assert tp[0] == 0 and fp[0] == 1


def test_class_without_gt_excluded_from_mean():
    gt = {"bboxes": np.array([[0, 0, 10, 10]], np.float32), "labels": np.array([0])}
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32), np.zeros((0, 5), np.float32)]]
    out = eval_map(dets, [gt])
    assert out["mAP"] == pytest.approx(1.0)  # class 1 has no gts, excluded


def test_11point_vs_area():
    # recall plateaus at 0.5 with precision 1.0: 11-point gives 6/11
    recalls = np.array([0.5])
    precisions = np.array([1.0])
    ap11 = average_precision(recalls, precisions, "11points")
    assert ap11 == pytest.approx(6 / 11)
    ap_area = average_precision(recalls, precisions, "area")
    assert ap_area == pytest.approx(0.5)


def test_half_detected():
    gt = {
        "bboxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
        "labels": np.array([0, 0]),
    }
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    out = eval_map(dets, [gt], mode="area")
    assert out["mAP"] == pytest.approx(0.5)
