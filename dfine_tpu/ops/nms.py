"""Class-wise NMS as a jittable fixed-shape JAX op.

The reference calls torchvision.ops.nms per class on CPU/GPU
(src/infer/torch_model.py:528-599, optional — D-FINE is NMS-free by
default).  Here: one vectorized O(N^2) IoU matrix + a sequential
suppression scan under ``lax.fori_loop`` — static shapes, no host sync.
Class separation via the standard coordinate-offset trick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import box_iou_pairwise


def nms(
    boxes: jnp.ndarray,  # [N, 4] xyxy
    scores: jnp.ndarray,  # [N]
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Returns keep mask [N] (True = kept).  Boxes are processed in score
    order; a box is suppressed if it overlaps a kept higher-score box."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou, _ = box_iou_pairwise(b, b)

    def body(i, keep):
        # suppressed if any kept earlier (higher-score) box overlaps it
        sup = jnp.any((iou[i] > iou_threshold) & keep & (jnp.arange(n) < i))
        return keep.at[i].set(~sup)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_class_nms(
    boxes: jnp.ndarray,  # [N, 4] xyxy
    scores: jnp.ndarray,  # [N]
    labels: jnp.ndarray,  # [N]
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Class-wise NMS via the coordinate-offset trick (boxes of different
    classes never overlap after offsetting)."""
    offset = labels.astype(boxes.dtype)[:, None] * (boxes.max() + 1.0)
    return nms(boxes + offset, scores, iou_threshold)
