"""Contrastive denoising (CDN) group construction — static-shape JAX version.

The reference builds DN groups dynamically from the batch's max GT count
(reference: src/d_fine/arch/utils.py:357-467).  For XLA we fix the group
geometry at compile time from ``max_gt`` (the dataset-level GT padding): the
number of groups is ``max(1, num_denoising // max_gt)`` and every group has
``2*max_gt`` slots (positive half + negative half).  Padding slots carry the
background class and are excluded from positives via the validity mask —
the training signal is identical, only the (masked-out) group capacity
differs from the per-batch dynamic layout.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.boxes import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh, inverse_sigmoid


class DnMeta(NamedTuple):
    num_group: int  # static
    num_denoising: int  # static total DN slots = 2 * num_group * max_gt
    max_gt: int  # static


def dn_attn_mask(num_group: int, max_gt: int, num_queries: int) -> np.ndarray:
    """Boolean KEEP-mask [T, T] (True = may attend), T = DN + Q.

    Equivalent to the reference's block mask (arch/utils.py:436-455) with
    inverted polarity: match queries never see DN; DN groups are mutually
    blind; everyone sees the match queries.
    """
    d = 2 * max_gt * num_group
    t = d + num_queries
    keep = np.ones((t, t), dtype=bool)
    keep[d:, :d] = False  # match queries cannot see DN
    for g in range(num_group):
        s, e = 2 * max_gt * g, 2 * max_gt * (g + 1)
        keep[s:e, :s] = False
        keep[s:e, e:d] = False
    return keep


def build_cdn_queries(
    labels: jnp.ndarray,  # [B, G] int32 class ids (pad rows arbitrary)
    boxes: jnp.ndarray,  # [B, G, 4] cxcywh in [0,1]
    valid: jnp.ndarray,  # [B, G] bool
    rng: jax.Array,
    num_classes: int,
    num_denoising: int = 100,
    label_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
):
    """Returns (dn_class_ids [B,D], dn_bbox_unact [B,D,4], meta).

    D = 2 * num_group * G.  Pad slots carry class == num_classes (the
    embedding's zero row) and logit(0)-boxes; they are masked everywhere by
    construction (negatives of pad GTs are also pad).
    """
    b, g = labels.shape
    num_group = max(1, num_denoising // g)
    reps = 2 * num_group

    pad_class = jnp.full_like(labels, num_classes)
    cls = jnp.where(valid, labels, pad_class)
    cls = jnp.tile(cls, (1, reps))  # [B, D]
    box = jnp.tile(jnp.where(valid[..., None], boxes, 0.0), (1, reps, 1))
    vmask = jnp.tile(valid, (1, reps))

    # negative half of each group (second G slots)
    neg = np.zeros((1, 2 * g), dtype=np.float32)
    neg[:, g:] = 1.0
    negative_mask = jnp.asarray(np.tile(neg, (1, num_group)))  # [1, D]

    k_label, k_new, k_sign, k_part = jax.random.split(rng, 4)

    if label_noise_ratio > 0:
        flip = jax.random.uniform(k_label, cls.shape) < (label_noise_ratio * 0.5)
        new_label = jax.random.randint(k_new, cls.shape, 0, num_classes, dtype=cls.dtype)
        cls = jnp.where(flip & vmask, new_label, cls)

    if box_noise_scale > 0:
        known = box_cxcywh_to_xyxy(box)
        diff = jnp.tile(box[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        sign = jax.random.randint(k_sign, box.shape, 0, 2).astype(box.dtype) * 2.0 - 1.0
        part = jax.random.uniform(k_part, box.shape)
        part = part + negative_mask[..., None]  # negatives pushed outside [1,2)
        known = known + sign * part * diff
        known = jnp.clip(known, 0.0, 1.0)
        box = jnp.abs(box_xyxy_to_cxcywh(known))

    dn_bbox_unact = inverse_sigmoid(box)
    meta = DnMeta(num_group=num_group, num_denoising=reps * g, max_gt=g)
    return cls, dn_bbox_unact, meta


def dn_match_indices(valid: jnp.ndarray, num_group: int):
    """Deterministic DN matching (reference dfine_criterion.py:610-632).

    For each group g and GT slot j: DN query ``g*2*G + j`` <-> target ``j``.
    Returns (query_idx [B, num_group*G] int32, tgt_idx [..] int32,
    pair_valid [..] bool).
    """
    b, g = valid.shape
    j = np.arange(g, dtype=np.int32)
    q_idx = np.concatenate([gg * 2 * g + j for gg in range(num_group)])  # [num_group*G]
    t_idx = np.tile(j, num_group)
    q_idx = jnp.asarray(np.tile(q_idx[None], (b, 1)))
    t_idx = jnp.asarray(np.tile(t_idx[None], (b, 1)))
    pair_valid = jnp.tile(valid, (1, num_group))
    return q_idx, t_idx, pair_valid
