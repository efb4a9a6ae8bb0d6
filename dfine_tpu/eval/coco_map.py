"""COCO-style mean average precision in pure numpy.

Replaces the torchmetrics/faster-coco-eval dependency of the reference
(src/dl/validator.py:50-64, 76-101) — neither ships in this image.  Follows
the COCOeval protocol: greedy score-ordered matching per (image, class) at
each IoU threshold, 101-point interpolated precision, AP averaged over
classes present in GT; thresholds 0.50:0.05:0.95; maxDet 100.

Supports boxes (xyxy absolute) and instance masks (dense [N,H,W] or RLE
dicts from dfine_tpu.eval.rle).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .rle import rle_iou_matrix

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def box_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def mask_iou_matrix(pm, gm) -> np.ndarray:
    if isinstance(pm, list) or isinstance(gm, list):
        return rle_iou_matrix(pm, gm)
    if len(pm) == 0 or len(gm) == 0:
        return np.zeros((len(pm), len(gm)), np.float32)
    if pm.shape[1:] != gm.shape[1:]:
        # cross-resolution: nearest-upsample preds to GT size
        # (reference validator.py case 5 semantics)
        import cv2

        pm = np.stack(
            [
                cv2.resize(m.astype(np.uint8), (gm.shape[2], gm.shape[1]),
                           interpolation=cv2.INTER_NEAREST)
                for m in pm
            ],
            0,
        )
    p = pm.astype(np.float32).reshape(len(pm), -1)
    g = gm.astype(np.float32).reshape(len(gm), -1)
    inter = p @ g.T
    union = p.sum(1, keepdims=True) + g.sum(1, keepdims=True).T - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def _match_image(
    iou: np.ndarray,  # [Np, Ng] preds already score-sorted
    thresholds: np.ndarray,
) -> np.ndarray:
    """COCO greedy matching: per threshold, each pred (in score order) takes
    the unmatched GT with the highest IoU >= t.  Returns tp [T, Np] bool."""
    np_, ng = iou.shape
    t_count = len(thresholds)
    tp = np.zeros((t_count, np_), bool)
    for ti, t in enumerate(thresholds):
        taken = np.zeros(ng, bool)
        for p in range(np_):
            best, best_iou = -1, t
            row = iou[p]
            for g in range(ng):
                if taken[g] or row[g] < best_iou:
                    continue
                best, best_iou = g, row[g]
            if best >= 0:
                taken[best] = True
                tp[ti, p] = True
    return tp


def average_precision(
    scores: np.ndarray, tp: np.ndarray, n_gt: int
) -> np.ndarray:
    """scores [N] (all images, one class), tp [T, N] -> AP [T]."""
    if n_gt == 0:
        return np.full(tp.shape[0], np.nan)
    if tp.shape[1] == 0:  # GT exists but no predictions of this class
        return np.zeros(tp.shape[0])
    order = np.argsort(-scores, kind="stable")
    tp = tp[:, order]
    aps = np.zeros(tp.shape[0])
    for ti in range(tp.shape[0]):
        tps = np.cumsum(tp[ti])
        fps = np.cumsum(~tp[ti])
        recall = tps / n_gt
        precision = tps / np.maximum(tps + fps, 1e-12)
        # precision envelope (monotone non-increasing from the right)
        for i in range(len(precision) - 1, 0, -1):
            precision[i - 1] = max(precision[i - 1], precision[i])
        # 101-point interpolation
        idx = np.searchsorted(recall, RECALL_POINTS, side="left")
        prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
        aps[ti] = prec_at.mean()
    return aps


def compute_map(
    preds: Sequence[Dict],
    gts: Sequence[Dict],
    iou_type: str = "bbox",  # bbox | segm
    max_det: int = 100,
    thresholds: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """preds/gts: per-image dicts with 'labels', 'scores' (preds), and
    'boxes' xyxy abs or 'masks' (dense or RLE list).  Returns map, map_50,
    map_75."""
    thresholds = IOU_THRESHOLDS if thresholds is None else thresholds
    classes = set()
    for g in gts:
        classes.update(np.asarray(g["labels"]).tolist())
    classes = sorted(classes)

    per_class_scores = {c: [] for c in classes}
    per_class_tp = {c: [] for c in classes}
    per_class_ngt = {c: 0 for c in classes}

    for pred, gt in zip(preds, gts):
        p_labels = np.asarray(pred["labels"]).astype(int)
        p_scores = np.asarray(pred["scores"]).astype(np.float32)
        g_labels = np.asarray(gt["labels"]).astype(int)
        for c in classes:
            g_sel = np.nonzero(g_labels == c)[0]
            per_class_ngt[c] += len(g_sel)
            p_sel = np.nonzero(p_labels == c)[0]
            if len(p_sel) == 0:
                continue
            order = np.argsort(-p_scores[p_sel], kind="stable")[:max_det]
            p_sel = p_sel[order]
            if iou_type == "bbox":
                iou = box_iou_matrix(
                    np.asarray(pred["boxes"], np.float32)[p_sel],
                    np.asarray(gt["boxes"], np.float32)[g_sel]
                    if len(g_sel)
                    else np.zeros((0, 4), np.float32),
                )
            else:
                pm = pred["masks"]
                gm = gt["masks"]
                pm_sel = [pm[i] for i in p_sel] if isinstance(pm, list) else pm[p_sel]
                gm_sel = [gm[i] for i in g_sel] if isinstance(gm, list) else (
                    gm[g_sel] if len(g_sel) else np.zeros((0, 1, 1), np.uint8)
                )
                iou = mask_iou_matrix(pm_sel, gm_sel)
            tp = _match_image(iou, thresholds)
            per_class_scores[c].append(p_scores[p_sel])
            per_class_tp[c].append(tp)

    ap_per_class = []
    ap50_per_class = []
    ap75_per_class = []
    t50 = int(np.argmin(np.abs(thresholds - 0.5)))
    t75 = int(np.argmin(np.abs(thresholds - 0.75)))
    for c in classes:
        if per_class_ngt[c] == 0:
            continue
        if per_class_scores[c]:
            scores = np.concatenate(per_class_scores[c])
            tp = np.concatenate(per_class_tp[c], axis=1)
        else:
            scores = np.zeros((0,), np.float32)
            tp = np.zeros((len(thresholds), 0), bool)
        aps = average_precision(scores, tp, per_class_ngt[c])
        ap_per_class.append(np.nanmean(aps))
        ap50_per_class.append(aps[t50])
        ap75_per_class.append(aps[t75])

    if not ap_per_class:
        return {"map": 0.0, "map_50": 0.0, "map_75": 0.0}
    return {
        "map": float(np.mean(ap_per_class)),
        "map_50": float(np.mean(ap50_per_class)),
        "map_75": float(np.mean(ap75_per_class)),
    }
