"""Matcher tests: LAPJV optimality vs scipy, cost parity with the reference
formula, padded-GT neutrality, and go-union semantics."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from dfine_tpu.matcher import MatcherConfig, matching_cost, solve_matchings
from dfine_tpu.native import lapjv_batch, have_native
from dfine_tpu.ops.hungarian import hungarian


def _np_reference_cost(logits, boxes, tlabels, tboxes, cfg):
    """Independent numpy derivation of the focal matching cost
    (formula from reference matcher.py:92-110)."""
    prob = 1 / (1 + np.exp(-logits))  # [Q,C]
    p = prob[:, tlabels]  # [Q,G]
    neg = (1 - cfg.alpha) * p**cfg.gamma * -np.log(1 - p + 1e-8)
    pos = cfg.alpha * (1 - p) ** cfg.gamma * -np.log(p + 1e-8)
    cost_class = pos - neg
    cost_bbox = np.abs(boxes[:, None] - tboxes[None]).sum(-1)

    def xyxy(b):
        return np.concatenate([b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1)

    a, b_ = xyxy(boxes), xyxy(tboxes)
    area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area2 = (b_[:, 2] - b_[:, 0]) * (b_[:, 3] - b_[:, 1])
    lt = np.maximum(a[:, None, :2], b_[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b_[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None] - inter
    iou = inter / union
    lt2 = np.minimum(a[:, None, :2], b_[None, :, :2])
    rb2 = np.maximum(a[:, None, 2:], b_[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    hull = wh2[..., 0] * wh2[..., 1]
    giou = iou - (hull - union) / hull
    return cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class + cfg.cost_giou * (-giou)


def test_matching_cost_matches_numpy_formula():
    rng = np.random.default_rng(0)
    B, Q, C, G = 2, 12, 5, 4
    logits = rng.normal(size=(B, Q, C)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(B, Q, 4)).astype(np.float32)
    tl = rng.integers(0, C, size=(B, G)).astype(np.int32)
    tb = rng.uniform(0.2, 0.6, size=(B, G, 4)).astype(np.float32)
    valid = np.ones((B, G), bool)
    cfg = MatcherConfig()
    c = np.asarray(
        matching_cost(jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(tl),
                      jnp.asarray(tb), jnp.asarray(valid), cfg)
    )
    for b in range(B):
        ref = _np_reference_cost(logits[b], boxes[b], tl[b], tb[b], cfg)  # [Q,G]
        np.testing.assert_allclose(c[b], ref.T, rtol=2e-4, atol=2e-5)


def test_padded_rows_are_neutral():
    """Assignment of valid GTs must be unaffected by padding slots."""
    rng = np.random.default_rng(1)
    G, Q = 6, 20
    c_valid = rng.normal(size=(1, 3, Q)).astype(np.float32)
    pad = np.zeros((1, G - 3, Q), np.float32)
    c_pad = np.concatenate([c_valid, pad], axis=1)
    a_small = lapjv_batch(c_valid)[0]
    a_big = lapjv_batch(c_pad)[0][:3]
    tot_small = c_valid[0][np.arange(3), a_small].sum()
    tot_big = c_valid[0][np.arange(3), a_big].sum()
    assert abs(tot_small - tot_big) < 1e-5


def test_solve_matchings_optimal_and_injective():
    rng = np.random.default_rng(2)
    S, B, G, Q = 3, 2, 5, 30
    costs = rng.normal(size=(S, B, G, Q)).astype(np.float32)
    valid = np.ones((B, G), bool)
    valid[1, 3:] = False
    costs_j = jnp.asarray(costs) * jnp.asarray(valid, jnp.float32)[None, :, :, None]
    match, go_q, go_t, go_valid = jax.jit(solve_matchings)(costs_j, jnp.asarray(valid))
    match = np.asarray(match)
    for s in range(S):
        for b in range(B):
            v = valid[b]
            # padded rows are skipped by the solver (like scipy never seeing
            # them in the reference's reduced problem); solve_matchings
            # sanitizes their entries to 0 (safe gather index — consumers
            # mask by tgt_valid), so pads must all read 0 here
            assert (match[s, b][~v] == 0).all()
            vq = match[s, b][v]
            assert (vq >= 0).all()
            assert len(set(vq.tolist())) == v.sum()  # injective over valid
            # optimal on the REDUCED problem, exactly like scipy
            r, col = linear_sum_assignment(costs[s, b][v])
            tot_sp = costs[s, b][v][r, col].sum()
            tot_us = costs[s, b][v][np.arange(v.sum()), vq].sum()
            assert abs(tot_sp - tot_us) < 1e-4


def test_go_union_dedup_by_query_count_priority():
    # 2 sets; GT0 matched to q5 twice, GT1 to q7 then q8.
    S, B, G, Q = 2, 1, 2, 10
    costs = np.full((S, B, G, Q), 10.0, np.float32)
    costs[0, 0, 0, 5] = 0.0
    costs[1, 0, 0, 5] = 0.0
    costs[0, 0, 1, 7] = 0.0
    costs[1, 0, 1, 5] = 0.5  # q5 taken by GT0 (cost 0): GT1 -> next best
    costs[1, 0, 1, 8] = 0.6
    valid = np.ones((B, G), bool)
    match, go_q, go_t, go_valid = jax.jit(solve_matchings)(
        jnp.asarray(costs), jnp.asarray(valid)
    )
    # (5,0) appears twice -> kept; (7,1) and (8,1) once each -> both kept
    pairs = {
        (int(q), int(t))
        for q, t, v in zip(np.asarray(go_q)[0], np.asarray(go_t)[0], np.asarray(go_valid)[0])
        if v
    }
    assert (5, 0) in pairs
    assert (7, 1) in pairs and (8, 1) in pairs
    assert len(pairs) == 3


def test_go_union_conflict_resolved_by_count():
    # GT0 and GT1 both end up matched to q3 in different sets:
    # GT0 twice (sets 0,1), GT1 once (set 2) -> q3 keeps GT0.
    S, B, G, Q = 3, 1, 2, 8
    match = np.zeros((S, B, G), np.int32)
    match[0, 0] = [3, 6]
    match[1, 0] = [3, 7]
    match[2, 0] = [4, 3]
    valid = np.ones((B, G), bool)
    from dfine_tpu.matcher import go_union

    go_q, go_t, go_valid = jax.jit(lambda m, v: go_union(m, v, Q))(
        jnp.asarray(match), jnp.asarray(valid)
    )
    pairs = {
        (int(q), int(t))
        for q, t, v in zip(np.asarray(go_q)[0], np.asarray(go_t)[0], np.asarray(go_valid)[0])
        if v
    }
    assert pairs == {(3, 0), (6, 1), (7, 1), (4, 0)}


def test_device_hungarian_matches_scipy_optimum():
    rng = np.random.default_rng(7)
    for _ in range(10):
        G = int(rng.integers(1, 24))
        Q = int(rng.integers(G, 310))
        c = rng.normal(size=(3, G, Q)).astype(np.float32)
        ours = np.asarray(jax.jit(hungarian)(jnp.asarray(c)))
        for b in range(3):
            assert len(set(ours[b].tolist())) == G
            r, col = linear_sum_assignment(c[b])
            np.testing.assert_allclose(
                c[b][np.arange(G), ours[b]].sum(), c[b][r, col].sum(), rtol=1e-5, atol=1e-4
            )


def test_device_hungarian_matches_native_cpp():
    rng = np.random.default_rng(8)
    c = rng.normal(size=(6, 10, 50)).astype(np.float32)
    dev = np.asarray(hungarian(jnp.asarray(c)))
    nat = lapjv_batch(c)
    tot_dev = np.take_along_axis(c, dev[..., None].transpose(0, 2, 1), axis=2)
    # compare objective values (assignments may differ on ties)
    for b in range(6):
        td = c[b][np.arange(10), dev[b]].sum()
        tn = c[b][np.arange(10), nat[b]].sum()
        assert abs(td - tn) < 1e-4


def test_native_lib_builds():
    assert have_native()


def test_one_to_many_topk_matching():
    """match_one_to_many (reference matcher.py:123-158 get_top_k_matches):
    k rounds of exact assignment, matched queries blocked between rounds ->
    per image each valid GT slot collects k DISTINCT queries, round 1 equals
    the standard matching, and every round is scipy-optimal on the cost with
    previous rounds' queries blocked."""
    from dfine_tpu.matcher import match_one_to_many

    rng = np.random.default_rng(11)
    B, G, Q, K = 3, 5, 40, 3
    c = rng.normal(size=(B, G, Q)).astype(np.float32)
    valid = np.ones((B, G), bool)
    valid[1, 3:] = False  # padded GT rows must stay neutral

    out = np.asarray(
        jax.jit(lambda c, v: match_one_to_many(c, v, K))(
            jnp.asarray(c), jnp.asarray(valid)
        )
    )  # [B, K, G]
    assert out.shape == (B, K, G)

    base = np.asarray(hungarian(jnp.asarray(c)))
    np.testing.assert_array_equal(out[:, 0], base)

    for b in range(B):
        g_valid = valid[b]
        # distinct queries across rounds for each valid row, and per-round
        # scipy optimality on the progressively blocked cost
        cb = c[b].copy()
        used = set()
        for r in range(K):
            qs = out[b, r][g_valid]
            assert len(set(qs.tolist()) & used) == 0
            assert len(set(qs.tolist())) == g_valid.sum()
            rr, cc = linear_sum_assignment(cb[g_valid])
            np.testing.assert_allclose(
                cb[g_valid][np.arange(g_valid.sum()), qs].sum(),
                cb[g_valid][rr, cc].sum(),
                rtol=1e-5, atol=1e-4,
            )
            used |= set(qs.tolist())
            cb[:, qs] += 1e6
