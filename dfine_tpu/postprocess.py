"""Prediction postprocessing — NMS-free top-k decode + geometry un-mapping.

Split by device/host boundary the TPU way:
* ``topk_decode`` is pure JAX and is FUSED into the jitted inference graph
  (sigmoid -> flat top-k over Q*C -> gather), mirroring the reference decode
  (src/dl/train.py:251-266, src/infer/torch_model.py:156-234).
* box un-letterboxing is vectorized numpy (per-image scalars), masks resize
  with cv2 on host — original sizes are ragged, which is exactly the part
  that must not live inside an XLA program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------ device side --


def topk_decode(
    logits: jnp.ndarray,  # [B, Q, C]
    boxes: jnp.ndarray,  # [B, Q, 4] cxcywh normalized
    num_top_queries: int = 300,
    use_focal_loss: bool = True,
    masks: Optional[jnp.ndarray] = None,  # [B, Q, Hm, Wm] (logits or probs)
):
    """Returns dict of scores [B,K], labels [B,K], boxes [B,K,4] (normalized
    cxcywh), and optionally masks [B,K,Hm,Wm] gathered for the top queries."""
    b, q, c = logits.shape
    if use_focal_loss:
        scores_all = jax.nn.sigmoid(logits.astype(jnp.float32))
        flat = scores_all.reshape(b, q * c)
        k = min(num_top_queries, q * c)
        scores, idx = jax.lax.top_k(flat, k)
        labels = idx % c
        qidx = idx // c
    else:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
        per_q_scores = probs.max(-1)
        labels_q = probs.argmax(-1)
        k = min(num_top_queries, q)
        scores, qidx = jax.lax.top_k(per_q_scores, k)
        labels = jnp.take_along_axis(labels_q, qidx, axis=1)
    out = {
        "scores": scores,
        "labels": labels.astype(jnp.int32),
        "boxes": jnp.take_along_axis(boxes, qidx[..., None], axis=1),
        "qidx": qidx.astype(jnp.int32),
    }
    if masks is not None:
        km = jnp.take_along_axis(masks, qidx[..., None, None], axis=1)
        out["masks"] = km
    return out


# -------------------------------------------------------------- host side --


def norm_cxcywh_to_abs_xyxy(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    cx, cy, bw, bh = boxes[..., 0] * w, boxes[..., 1] * h, boxes[..., 2] * w, boxes[..., 3] * h
    return np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)


def unletterbox_boxes(
    boxes_xyxy: np.ndarray,
    proc_hw: Tuple[int, int],
    orig_hw: Tuple[int, int],
    pad_tl: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Invert letterbox mapping (reference utils.py:637-655 semantics).

    ``pad_tl`` is the actual (pad_top, pad_left) used at preprocess time;
    when omitted, centered padding is assumed (the classic letterbox).  Rect
    mode anchors the image top-left, so it must pass (0, 0)."""
    ph, pw = proc_hw
    oh, ow = orig_hw
    gain = min(ph / oh, pw / ow)
    if pad_tl is None:
        padw = round((pw - ow * gain) / 2 - 0.1)
        padh = round((ph - oh * gain) / 2 - 0.1)
    else:
        padh, padw = pad_tl
    b = boxes_xyxy.copy()
    b[..., [0, 2]] -= padw
    b[..., [1, 3]] -= padh
    b /= gain
    b[..., [0, 2]] = b[..., [0, 2]].clip(0, ow)
    b[..., [1, 3]] = b[..., [1, 3]].clip(0, oh)
    return b


def boxes_to_original(
    boxes_norm: np.ndarray,  # [K, 4] cxcywh normalized (in processed frame)
    proc_hw: Tuple[int, int],
    orig_hw: Tuple[int, int],
    keep_ratio: bool,
    pad_tl: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    ph, pw = proc_hw
    oh, ow = orig_hw
    xyxy = norm_cxcywh_to_abs_xyxy(boxes_norm, ph, pw)
    if keep_ratio:
        return unletterbox_boxes(xyxy, proc_hw, orig_hw, pad_tl)
    xyxy[..., [0, 2]] *= ow / pw
    xyxy[..., [1, 3]] *= oh / ph
    xyxy[..., [0, 2]] = xyxy[..., [0, 2]].clip(0, ow)
    xyxy[..., [1, 3]] = xyxy[..., [1, 3]].clip(0, oh)
    return xyxy


def masks_to_original(
    mask_probs: np.ndarray,  # [K, Hm, Wm] float in [0,1]
    proc_hw: Tuple[int, int],
    orig_hw: Tuple[int, int],
    keep_ratio: bool,
    pad_tl: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Resize mask probabilities to the original image (reference
    utils.py:715-769: upsample to processed size, strip letterbox pad,
    resize to original).  ``pad_tl`` = actual (pad_top, pad_left); centered
    assumed when omitted; rect mode passes (0, 0)."""
    ph, pw = proc_hw
    oh, ow = orig_hw
    k = mask_probs.shape[0]
    if k == 0:
        return np.zeros((0, oh, ow), np.float32)
    out = np.empty((k, oh, ow), np.float32)
    y1 = x1 = 0
    y2, x2 = ph, pw
    if keep_ratio:
        gain = min(ph / oh, pw / ow)
        nh, nw = int(round(oh * gain)), int(round(ow * gain))
        if pad_tl is None:
            padw = max(round((pw - ow * gain) / 2 - 0.1), 0)
            padh = max(round((ph - oh * gain) / 2 - 0.1), 0)
        else:
            padh, padw = max(int(pad_tl[0]), 0), max(int(pad_tl[1]), 0)
        y1, y2 = padh, min(padh + nh, ph)
        x1, x2 = padw, min(padw + nw, pw)
    for i in range(k):
        m = cv2.resize(mask_probs[i].astype(np.float32), (pw, ph), interpolation=cv2.INTER_LINEAR)
        m = m[y1:y2, x1:x2]
        out[i] = cv2.resize(m, (ow, oh), interpolation=cv2.INTER_LINEAR)
    return out.clip(0.0, 1.0)


def cleanup_masks(masks: np.ndarray, boxes_xyxy: np.ndarray) -> np.ndarray:
    """Zero mask pixels outside each instance's own box
    (reference utils.py:772-786)."""
    n, h, w = masks.shape
    if n == 0:
        return masks
    ys = np.arange(h)[None, :, None]
    xs = np.arange(w)[None, None, :]
    x1, y1, x2, y2 = boxes_xyxy.T
    inside = (
        (xs >= x1[:, None, None])
        & (xs < x2[:, None, None])
        & (ys >= y1[:, None, None])
        & (ys < y2[:, None, None])
    )
    return masks * inside.astype(masks.dtype)


def postprocess_predictions(
    decoded: Dict[str, np.ndarray],  # numpy'd output of topk_decode
    proc_hw: Tuple[int, int],
    orig_sizes: Sequence[Tuple[int, int]],  # per image (h, w)
    conf_thresh: float = 0.5,
    keep_ratio: bool = False,
    per_class_conf: Optional[Dict[int, float]] = None,
    masks_are_logits: bool = False,
    pads: Optional[Sequence[Optional[Tuple[int, int]]]] = None,
) -> List[Dict[str, np.ndarray]]:
    """Final per-image dicts matching the reference serving contract
    (labels/boxes/scores [+ masks], plus all_* arrays for mAP;
    reference train.py:226-319, torch_model.py:156-234).

    ``pads`` — optional per-image (pad_top, pad_left) actually applied at
    preprocess; None entries fall back to the centered-letterbox assumption.
    """
    scores = np.asarray(decoded["scores"])
    labels = np.asarray(decoded["labels"])
    boxes = np.asarray(decoded["boxes"])
    masks = np.asarray(decoded["masks"]) if "masks" in decoded else None
    if masks is not None and masks_are_logits:
        masks = 1.0 / (1.0 + np.exp(-masks))

    results = []
    for b in range(scores.shape[0]):
        oh, ow = orig_sizes[b]
        pad_tl = pads[b] if pads is not None else None
        bb_all = boxes_to_original(boxes[b], proc_hw, (oh, ow), keep_ratio, pad_tl)
        if per_class_conf:
            thr = np.asarray([per_class_conf.get(int(l), conf_thresh) for l in labels[b]])
        else:
            thr = conf_thresh
        keep = scores[b] >= thr
        out = {
            "labels": labels[b][keep],
            "boxes": bb_all[keep],
            "scores": scores[b][keep],
            "all_labels": labels[b],
            "all_boxes": bb_all,
            "all_scores": scores[b],
        }
        if masks is not None:
            # masks may cover only the top-K (score-sorted) queries (the
            # trainer/bench ship K=100 to bound D2H); kept predictions past
            # that tail get an empty mask — unreachable at standard conf
            # thresholds since keeps are a prefix of the score order
            km = masks.shape[1]
            keep_arr = np.broadcast_to(np.asarray(keep), scores[b].shape)
            mk = masks_to_original(
                masks[b][keep_arr[:km]].astype(np.float32),
                proc_hw, (oh, ow), keep_ratio, pad_tl,
            )
            binary = (mk >= conf_thresh).astype(np.uint8)
            n_kept = int(keep_arr.sum())
            if binary.shape[0] < n_kept:
                binary = np.concatenate(
                    [binary, np.zeros((n_kept - binary.shape[0],) + binary.shape[1:],
                                      np.uint8)], 0
                )
            out["masks"] = cleanup_masks(binary, out["boxes"])
        results.append(out)
    return results
