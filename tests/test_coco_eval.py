"""COCO mAP evaluator (references/detection/coco_eval.py) — hand-computed
cases (counterpart of the reference's pycocotools wrapper,
``references/detection/coco_eval.py:1-100``)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
from references.detection.coco_eval import CocoEvaluator, box_iou_xyxy  # noqa: E402


class TestBoxIoU:
    def test_identity_and_disjoint(self):
        a = np.array([[0, 0, 10, 10]], np.float64)
        b = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [5, 5, 15, 15]], np.float64)
        iou = box_iou_xyxy(a, b)
        np.testing.assert_allclose(iou[0, 0], 1.0)
        np.testing.assert_allclose(iou[0, 1], 0.0)
        np.testing.assert_allclose(iou[0, 2], 25.0 / 175.0)


class TestCocoEvaluator:
    def test_perfect_detections(self):
        ev = CocoEvaluator()
        gt = np.array([[0, 0, 50, 50], [60, 60, 100, 100]], np.float64)
        ev.update(gt, np.array([0.9, 0.8]), np.array([1, 2]), gt, np.array([1, 2]))
        s = ev.summarize()
        assert s["map"] == pytest.approx(1.0)
        assert s["map_50"] == pytest.approx(1.0)

    def test_miss_halves_ap(self):
        ev = CocoEvaluator()
        gt = np.array([[0, 0, 50, 50], [60, 60, 100, 100]], np.float64)
        # only the first gt detected (same class)
        ev.update(gt[:1], np.array([0.9]), np.array([1]), gt, np.array([1, 1]))
        s = ev.summarize()
        # recall caps at 0.5: 51 of 101 recall points have precision 1
        assert s["map"] == pytest.approx(51 / 101, abs=1e-6)

    def test_false_positive_lowers_precision(self):
        ev = CocoEvaluator()
        gt = np.array([[0, 0, 50, 50]], np.float64)
        # false positive scored HIGHER than the true positive
        preds = np.array([[200, 200, 250, 250], [0, 0, 50, 50]], np.float64)
        ev.update(preds, np.array([0.95, 0.9]), np.array([1, 1]), gt, np.array([1]))
        s = ev.summarize()
        # precision at full recall is 1/2
        assert s["map"] == pytest.approx(0.5, abs=1e-6)

    def test_localization_quality_gates_iou_levels(self):
        ev = CocoEvaluator()
        gt = np.array([[0, 0, 100, 100]], np.float64)
        # IoU vs gt = 8000/12000 = 2/3: counts at thr .50-.65, not above
        pred = np.array([[0, 20, 100, 120]], np.float64)
        iou = box_iou_xyxy(pred, gt)[0, 0]
        assert 0.65 < iou < 0.7
        ev.update(pred, np.array([0.9]), np.array([1]), gt, np.array([1]))
        s = ev.summarize()
        assert s["map_50"] == pytest.approx(1.0)
        assert s["map_75"] == pytest.approx(0.0)
        assert s["map"] == pytest.approx(4 / 10, abs=1e-6)

    def test_area_buckets(self):
        ev = CocoEvaluator()
        small = [0, 0, 10, 10]       # area 100 < 32^2
        large = [0, 0, 200, 200]     # area 4e4 > 96^2
        gt = np.array([small, large], np.float64)
        ev.update(gt, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1, 1]))
        s = ev.summarize()
        assert s["map_small"] == pytest.approx(1.0)
        assert s["map_large"] == pytest.approx(1.0)
        assert s["map_medium"] == 0.0  # no medium gt -> no contribution

    def test_duplicate_detection_is_fp(self):
        ev = CocoEvaluator()
        gt = np.array([[0, 0, 50, 50]], np.float64)
        preds = np.tile(gt, (2, 1))
        ev.update(preds, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1]))
        s = ev.summarize()
        # second (duplicate) detection is a false positive at recall 1
        assert s["map_50"] == pytest.approx(1.0)


class TestEndToEndMAP:
    def test_detector_style_usage(self):
        """Synthetic multi-image scenario with jittered detections."""
        rng = np.random.default_rng(0)
        ev = CocoEvaluator()
        for _ in range(8):
            g = rng.integers(1, 5)
            xy = rng.uniform(0, 200, (g, 2))
            wh = rng.uniform(30, 80, (g, 2))
            gt = np.concatenate([xy, xy + wh], axis=1)
            labels = rng.integers(1, 4, g)
            jitter = rng.normal(0, 2.0, gt.shape)
            ev.update(gt + jitter, rng.uniform(0.5, 1.0, g), labels, gt, labels)
        s = ev.summarize()
        assert 0.5 < s["map"] <= 1.0
        assert s["map_50"] >= s["map"] >= s["map_75"] * 0.5
