"""Run-length mask codec — numpy replacement for the pycocotools C codec.

The reference RLE-encodes every mask so dataset-scale eval stays in bounded
RAM (src/dl/utils.py:1022-1141, validator.py:84-101).  pycocotools is not in
this image; this codec keeps the COCO convention (column-major scan, counts
alternate starting with zeros) so artifacts stay interoperable.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def mask_to_rle(mask: np.ndarray) -> Dict:
    """mask: [H, W] (bool/uint8) -> {'size': [H, W], 'counts': uint32[...]}"""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).reshape(h, w).T.reshape(-1)  # column-major
    # positions where value changes
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], diff, [flat.size]])).astype(np.uint32)
    if flat.size and flat[0] == 1:  # counts must start with a zero-run
        runs = np.concatenate([[np.uint32(0)], runs])
    return {"size": [int(h), int(w)], "counts": runs}


def rle_to_mask(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int64)
    total = int(counts.sum())
    flat = np.zeros(h * w, np.uint8)
    # odd-indexed runs are ones
    ends = np.cumsum(counts)
    starts = ends - counts
    for i in range(1, len(counts), 2):
        flat[starts[i] : ends[i]] = 1
    assert total == h * w, "RLE does not cover the mask"
    return flat.reshape(w, h).T


def masks_to_rle(masks: np.ndarray) -> List[Dict]:
    return [mask_to_rle(m) for m in masks]


def rle_to_masks(rles: List[Dict]) -> np.ndarray:
    if not rles:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack([rle_to_mask(r) for r in rles], 0)


def rle_area(rle: Dict) -> int:
    counts = np.asarray(rle["counts"], np.int64)
    return int(counts[1::2].sum())


def rle_iou_matrix(pred_rles: List[Dict], gt_rles: List[Dict]) -> np.ndarray:
    """Pairwise IoU decoded in one batch (small eval sets)."""
    if not pred_rles or not gt_rles:
        return np.zeros((len(pred_rles), len(gt_rles)), np.float32)
    pm = rle_to_masks(pred_rles).astype(np.float32).reshape(len(pred_rles), -1)
    gm = rle_to_masks(gt_rles).astype(np.float32).reshape(len(gt_rles), -1)
    inter = pm @ gm.T
    union = pm.sum(1, keepdims=True) + gm.sum(1, keepdims=True).T - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)
