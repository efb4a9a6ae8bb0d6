"""Golden tests for the metrics engine — the reference's synthetic
self-test scenarios (reference validator.py:706-880) define the numerical
contract; each case's expected P/R/IoU is asserted here against our
implementation."""

import numpy as np

from dfine_tpu.eval.rle import mask_to_rle, masks_to_rle, rle_to_mask, rle_to_masks
from dfine_tpu.eval.validator import Validator
from dfine_tpu.eval.coco_map import compute_map


def box_from_mask(m):
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        return np.asarray([0, 0, 0, 0], np.float32)
    return np.asarray([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)


def pack(masks, labels, scores=None):
    if len(masks) == 0:
        out = {
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int64),
            "masks": np.zeros((0, 1, 1), np.uint8),
        }
    else:
        ms = np.stack(masks, 0).astype(np.uint8)
        out = {
            "boxes": np.stack([box_from_mask(m) for m in masks], 0),
            "labels": np.asarray(labels, np.int64),
            "masks": ms,
        }
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float32)
        out["all_scores"] = out["scores"]
        out["all_labels"] = out["labels"]
        out["all_boxes"] = out["boxes"]
    return out


def run_case(gt, preds, iou_thr=0.5):
    labels = set()
    for g in gt:
        labels.update(g["labels"].tolist())
    for p in preds:
        labels.update(p["labels"].tolist())
    v = Validator(gt, preds, {l: f"class_{l}" for l in labels}, 0.5, iou_thr)
    return v.compute_metrics()


def _m(rows):
    return np.asarray(rows, np.uint8)


GT1 = _m([[0, 0, 0, 0], [0, 1, 1, 0], [0, 1, 1, 0], [0, 0, 0, 0]])


def test_case1_perfect_match():
    m = run_case([pack([GT1], [0])], [pack([GT1.copy()], [0], [1.0])])
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["iou"] == 1.0
    assert m["mAP_50"] == 1.0


def test_case2_partial_above_threshold():
    gt = np.ones((4, 4), np.uint8)
    pred = gt.copy()
    pred[3] = 0  # intersection 12, union 16 -> IoU 0.75
    m = run_case([pack([gt], [0])], [pack([pred], [0], [1.0])])
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    np.testing.assert_allclose(m["iou"], 0.75)


def test_case3_misclassification():
    m = run_case([pack([GT1], [0])], [pack([GT1.copy()], [1], [1.0])])
    assert m["precision"] == 0.0 and m["recall"] == 0.0 and m["iou"] == 0.0
    assert m["TPs"] == 0 and m["FPs"] == 1 and m["FNs"] == 1


def test_case4_pure_fp():
    m = run_case([pack([], [])], [pack([GT1], [0], [1.0])])
    assert m["precision"] == 0.0 and m["recall"] == 0.0
    assert m["FPs"] == 1 and m["FNs"] == 0


def test_case5_cross_resolution_upsample():
    gt = np.ones((10, 10), np.uint8)
    pred = np.ones((5, 5), np.uint8)
    m = run_case([pack([gt], [2])], [pack([pred], [2], [1.0])])
    assert m["precision"] == 1.0 and m["recall"] == 1.0
    np.testing.assert_allclose(m["iou"], 1.0)


def test_case6_multi_pred_one_gt():
    gt6 = _m(
        [
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 1, 1, 1, 1, 1, 1, 0],
            [0, 1, 1, 1, 1, 1, 1, 0],
            [0, 1, 1, 1, 1, 1, 1, 0],
            [0, 1, 1, 1, 1, 1, 1, 0],
            [0, 1, 1, 1, 1, 1, 1, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
        ]
    )
    p1 = _m(
        [
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 1, 1, 1, 1, 1, 0, 0],
            [0, 1, 1, 1, 1, 1, 0, 0],
            [0, 1, 1, 1, 0, 0, 0, 0],
            [0, 1, 1, 0, 0, 0, 0, 0],
            [0, 1, 1, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 0, 1, 1, 0],
        ]
    )
    p2 = _m(
        [
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 1, 1, 0],
            [0, 0, 0, 0, 0, 1, 1, 0],
            [0, 0, 0, 0, 0, 1, 1, 0],
        ]
    )
    m = run_case([pack([gt6], [0])], [pack([p1, p2], [0, 0], [1.0, 1.0])])
    np.testing.assert_allclose(m["iou"], 0.28125)
    np.testing.assert_allclose(m["recall"], 1.0)
    np.testing.assert_allclose(m["precision"], 0.5)


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    masks = (rng.uniform(size=(4, 17, 23)) > 0.6).astype(np.uint8)
    rles = masks_to_rle(masks)
    back = rle_to_masks(rles)
    np.testing.assert_array_equal(masks, back)
    # edge: all-ones and all-zeros
    for m in (np.ones((5, 7), np.uint8), np.zeros((5, 7), np.uint8)):
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_validator_with_rle_masks():
    gt = pack([GT1], [0])
    pred = pack([GT1.copy()], [0], [1.0])
    for s in (gt, pred):
        s["masks_rle"] = masks_to_rle(s.pop("masks"))
    m = run_case([gt], [pred])
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["iou"] == 1.0


def test_map_ranking_sensitivity():
    """mAP must penalize a high-scoring FP more than a low-scoring one."""
    gt = [{"labels": np.asarray([0]), "boxes": np.asarray([[0, 0, 10, 10]], np.float32)}]

    def preds(fp_score):
        return [{
            "labels": np.asarray([0, 0]),
            "scores": np.asarray([0.9, fp_score], np.float32),
            "boxes": np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
        }]

    hi = compute_map(preds(0.95), gt)["map_50"]
    lo = compute_map(preds(0.1), gt)["map_50"]
    assert lo > hi
    np.testing.assert_allclose(lo, 1.0)
    np.testing.assert_allclose(hi, 0.5, atol=0.02)


def test_threshold_sweep_best():
    gt = [pack([GT1], [0])]
    pred = pack([GT1.copy(), np.ones((4, 4), np.uint8)], [0, 0], [0.9, 0.3])
    v = Validator([pack([GT1], [0])], [pred], {0: "c0"})
    sweep = v.threshold_sweep()
    assert sweep["best_f1"] == 1.0
    assert sweep["best_threshold"] > 0.3  # FP filtered out at best threshold
