"""Hungarian matching for D-FINE training — fully on-device design.

The reference matcher (src/d_fine/matcher.py:52-130) computes dense costs on
GPU then loops scipy's LAPJV per image on CPU — a GPU->CPU sync in the middle
of every train step (SURVEY.md hot loop #3).  Here everything stays on the
TPU: costs for EVERY output set (final + aux layers + pre + encoder) are
computed in one traced function, stacked [S, B, G, Q], and solved by a
vmapped exact Hungarian kernel (dfine_tpu/ops/hungarian.py).  The "go
indices" union across decoder layers (reference dfine_criterion.py:371-392)
is likewise pure device code, so the whole criterion is one XLA program.

Static shapes: targets are padded to G slots with a validity mask; padded GT
rows get a constant-0 cost row, which is neutral for the optimum over valid
rows (uniform rows add the same total to every assignment).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou_pairwise
from .ops.hungarian import hungarian


@dataclass(frozen=True)
class MatcherConfig:
    """Cost weights (reference src/d_fine/configs.py:40-51)."""

    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    alpha: float = 0.25
    gamma: float = 2.0
    use_focal_loss: bool = True
    # > 0 enables one-to-many repeat matching with that many rounds
    # (reference matcher.py:31-50 ``return_topk``); see match_one_to_many.
    return_topk: int = 0


def matching_cost(
    pred_logits: jnp.ndarray,  # [B, Q, C]
    pred_boxes: jnp.ndarray,  # [B, Q, 4] cxcywh
    tgt_labels: jnp.ndarray,  # [B, G] int32
    tgt_boxes: jnp.ndarray,  # [B, G, 4] cxcywh
    tgt_valid: jnp.ndarray,  # [B, G] bool
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """Dense cost [B, G, Q] (rows = GT slots, cols = queries).

    Same cost formula as the reference (focal-style class cost + L1 + -GIoU,
    matcher.py:92-110); invalid GT rows are zeroed (neutral)."""
    logits = pred_logits.astype(jnp.float32)
    boxes = pred_boxes.astype(jnp.float32)
    tboxes = tgt_boxes.astype(jnp.float32)

    if cfg.use_focal_loss:
        prob = jax.nn.sigmoid(logits)  # [B,Q,C]
        p = jnp.take_along_axis(
            prob[:, :, None, :],
            tgt_labels[:, None, :, None].astype(jnp.int32),
            axis=-1,
        )[..., 0]  # [B,Q,G]
        neg = (1 - cfg.alpha) * (p**cfg.gamma) * (-jnp.log1p(-(p - 1e-8)))
        # -log(1 - p + 1e-8) == -log1p(-(p - 1e-8))
        pos = cfg.alpha * ((1 - p) ** cfg.gamma) * (-jnp.log(p + 1e-8))
        cost_class = pos - neg
    else:
        prob = jax.nn.softmax(logits, axis=-1)
        cost_class = -jnp.take_along_axis(
            prob[:, :, None, :],
            tgt_labels[:, None, :, None].astype(jnp.int32),
            axis=-1,
        )[..., 0]

    cost_bbox = jnp.abs(boxes[:, :, None, :] - tboxes[:, None, :, :]).sum(-1)  # [B,Q,G]
    cost_giou = -generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(tboxes)
    )
    c = cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class + cfg.cost_giou * cost_giou
    c = jnp.nan_to_num(c, nan=1.0)  # reference matcher.py:114
    c = jnp.transpose(c, (0, 2, 1))  # [B, G, Q]
    return jnp.where(tgt_valid[..., None], c, 0.0)


def go_union(
    match: jnp.ndarray,  # [S, B, G] query index per GT slot per set
    tgt_valid: jnp.ndarray,  # [B, G]
    num_queries: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Union of (query, target) matches across all output sets, deduped so
    each query keeps the target it was most frequently matched to (ties ->
    smallest target index) — the reference's go-indices
    (dfine_criterion.py:371-392) as fixed-size device arrays.

    Returns go_q [B, S*G] int32, go_t [B, S*G] int32, go_valid [B, S*G].
    """
    s, b, g = match.shape
    k = s * g
    q_flat = jnp.transpose(match, (1, 0, 2)).reshape(b, k)  # [B, S*G]
    t_flat = jnp.tile(jnp.arange(g, dtype=jnp.int32)[None, None], (b, s, 1)).reshape(b, k)
    v_flat = jnp.tile(tgt_valid[:, None, :], (1, s, 1)).reshape(b, k)

    # count of identical (q, t) pairs: same t <=> same g slot, so count how
    # many sets matched slot g to the same query
    same = match[:, None] == match[None, :]  # [S, S, B, G]
    count = same.sum(0).astype(jnp.int32)  # [S, B, G]
    c_flat = jnp.transpose(count, (1, 0, 2)).reshape(b, k)

    # priority: higher count wins; ties -> smaller target index. Scores of
    # distinct pairs sharing a query are always distinct (|t1-t2| < G+1).
    score = c_flat * (g + 1) + (g - t_flat)
    score = jnp.where(v_flat, score, -1)

    b_ar = jnp.arange(b)[:, None]
    best = jnp.full((b, num_queries), -1, jnp.int32).at[b_ar, q_flat].max(score, mode="drop")
    winner = v_flat & (score == best[b_ar, q_flat])
    # among duplicate winners of the same pair keep the lowest flat index
    idx = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (b, 1))
    first = (
        jnp.full((b, num_queries), k, jnp.int32)
        .at[b_ar, jnp.where(winner, q_flat, num_queries)]
        .min(jnp.where(winner, idx, k), mode="drop")
    )
    keep = winner & (idx == first[b_ar, q_flat])
    return q_flat, t_flat, keep


def match_one_to_many(
    costs: jnp.ndarray,  # [S, B, G, Q] (or [B, G, Q])
    tgt_valid: jnp.ndarray,  # [B, G]
    k: int,
) -> jnp.ndarray:
    """One-to-many top-k repeat matching (reference matcher.py:123-158,
    ``return_topk`` / ``get_top_k_matches``): run the exact assignment k
    times, blocking each round's matched queries with a prohibitive cost so
    every valid GT slot collects k DISTINCT queries.

    Returns query indices [..., k, G] (round-major), fixed-size on device.
    The reference's numpy fancy-indexing incidentally also blocks query rows
    whose index equals a matched target column (``c[:, idx_k] = 1e6`` hits a
    [2, n] index array); we implement the documented intent — block matched
    queries only.
    """
    squeeze = costs.ndim == 3
    c = costs[None] if squeeze else costs
    q = c.shape[-1]
    rounds = []
    for _ in range(k):
        m = hungarian(c)  # [S, B, G]
        rounds.append(m)
        # block matched queries of VALID rows for the following rounds
        midx = jnp.where(tgt_valid[None], m, q)  # padded rows stay neutral
        blocked = jax.nn.one_hot(midx, q, dtype=c.dtype).sum(2) > 0  # [S,B,Q]
        c = c + jnp.where(blocked[:, :, None, :], 1e6, 0.0)
    out = jnp.stack(rounds, axis=-2)  # [S, B, k, G]
    return out[0] if squeeze else out


def solve_matchings(
    costs: jnp.ndarray,  # [S, B, G, Q]
    tgt_valid: jnp.ndarray,  # [B, G]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve every (set, image) assignment on device and build the go union.

    One vmapped exact-Hungarian kernel over S*B tiny problems — no host
    round-trip (the TPU runtime here has no host-callback support, and the
    reference's GPU->CPU scipy hop is the very bottleneck we remove).
    Padded GT rows are skipped inside the solver (reference scipy solves the
    reduced per-image problem).  The solver marks them -1, but the returned
    indices are SANITIZED to 0: every consumer masks pairs by
    ``tgt_valid``/``go_valid`` anyway, and gathers with -1 (negative indices
    wrap in jnp.take_along_axis) kernel-fault the axon TPU runtime in some
    fused vmapped programs when a whole batch has zero valid GT (empty-image
    batches; found via a deterministic repro, see NOTES.md round 3)."""
    s, b, g, q = costs.shape
    match = hungarian(costs, row_valid=tgt_valid)  # [S, B, G], -1 on pads
    go_q, go_t, go_valid = go_union(match, tgt_valid, q)
    match = jnp.where(match >= 0, match, 0)
    go_q = jnp.where(go_valid, go_q, 0)
    return match, go_q, go_t, go_valid
