"""Golden tests for box/FDR/deformable-attention ops.

Where the semantics come from torch ops (grid_sample), we test directly
against torch-CPU.  FDR functions are tested against hand-derived values and
invariants from the reference formulas (arch/utils.py:119-354).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dfine_tpu.ops import boxes as B
from dfine_tpu.ops import fdr
from dfine_tpu.ops.deform_attn import grid_sample_bilinear, ms_deform_attn_core


def test_box_roundtrip():
    rng = np.random.default_rng(0)
    cxcywh = rng.uniform(0.1, 0.9, size=(16, 4)).astype(np.float32)
    xyxy = B.box_cxcywh_to_xyxy(jnp.asarray(cxcywh))
    back = B.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), cxcywh, atol=1e-6)


def test_iou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]])
    iou, _ = B.box_iou_pairwise(a, b)
    np.testing.assert_allclose(np.asarray(iou[0]), [1 / 7, 1.0, 0.0], atol=1e-6)
    giou = B.generalized_box_iou_pairwise(a, b)
    # disjoint unit boxes inside 6x6 hull: iou=0, union=5, hull=36
    np.testing.assert_allclose(np.asarray(giou[0, 2]), 0.0 - (36 - 5) / 36, atol=1e-6)


def test_aligned_matches_pairwise_diag():
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 1, size=(8, 2, 2)), axis=-1)
    a = jnp.asarray(x[..., 0].reshape(8, 2).repeat(2, -1)[:, :4]) * 0  # placeholder
    a1 = jnp.asarray(np.concatenate([x[:, :, 0], x[:, :, 1]], -1))  # x0,y0,x1,y1 sorted
    b1 = jnp.roll(a1, 1, axis=0)
    diag = jnp.diagonal(B.generalized_box_iou_pairwise(a1, b1), axis1=-2, axis2=-1)
    al = B.generalized_box_iou_aligned(a1, b1)
    np.testing.assert_allclose(np.asarray(diag), np.asarray(al), atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.asarray([0.5, 0.1, 0.0, 1.0])
    y = B.inverse_sigmoid(x)
    np.testing.assert_allclose(np.asarray(y[0]), 0.0, atol=1e-6)
    assert np.isfinite(np.asarray(y)).all()


# ---------------------------------------------------------------- FDR ----


def test_weighting_function_structure():
    reg_max, up, reg_scale = 32, 0.5, 4.0
    w = np.asarray(fdr.weighting_function(reg_max, up, reg_scale))
    assert w.shape == (reg_max + 1,)
    # endpoints = +-2*up*reg_scale, middle zero, antisymmetric
    np.testing.assert_allclose(w[0], -4.0, atol=1e-5)
    np.testing.assert_allclose(w[-1], 4.0, atol=1e-5)
    np.testing.assert_allclose(w[reg_max // 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(w, -w[::-1], atol=1e-5)
    assert (np.diff(w) > 0).all()


def test_translate_gt_interpolation_consistency():
    reg_max, up, reg_scale = 32, 0.5, 4.0
    w = np.asarray(fdr.weighting_function(reg_max, up, reg_scale))
    # in-range values must reconstruct: wl*W[i] + wr*W[i+1] == gt
    gt = jnp.asarray([0.0, 0.3, -0.3, 1.7, -3.9, 3.9])
    idx, wr, wl = fdr.translate_gt(gt, reg_max, reg_scale, up)
    idx, wr, wl = np.asarray(idx), np.asarray(wr), np.asarray(wl)
    ii = idx.astype(int)
    recon = wl * w[ii] + wr * w[np.minimum(ii + 1, reg_max)]
    np.testing.assert_allclose(recon, np.asarray(gt), atol=1e-5)
    # out-of-range below/above
    idx2, wr2, wl2 = fdr.translate_gt(jnp.asarray([-100.0, 100.0]), reg_max, reg_scale, up)
    assert float(idx2[0]) == 0.0 and float(wl2[0]) == 1.0 and float(wr2[0]) == 0.0
    np.testing.assert_allclose(float(idx2[1]), reg_max - 0.1, atol=1e-5)
    assert float(wr2[1]) == 1.0 and float(wl2[1]) == 0.0


def test_bbox2distance_roundtrip_through_distance2bbox():
    # decode(encode(gt)) == gt when distances are exactly representable
    reg_max, up, reg_scale = 32, 0.5, 4.0
    rng = np.random.default_rng(2)
    pts = np.stack(
        [
            rng.uniform(0.3, 0.7, 16),
            rng.uniform(0.3, 0.7, 16),
            rng.uniform(0.1, 0.2, 16),
            rng.uniform(0.1, 0.2, 16),
        ],
        -1,
    ).astype(np.float32)
    gt_xyxy = np.stack(
        [
            pts[:, 0] - rng.uniform(0.02, 0.1, 16),
            pts[:, 1] - rng.uniform(0.02, 0.1, 16),
            pts[:, 0] + rng.uniform(0.02, 0.1, 16),
            pts[:, 1] + rng.uniform(0.02, 0.1, 16),
        ],
        -1,
    ).astype(np.float32)
    bins, wr, wl = fdr.bbox2distance(jnp.asarray(pts), jnp.asarray(gt_xyxy), reg_max, reg_scale, up)
    w = np.asarray(fdr.weighting_function(reg_max, up, reg_scale))
    ii = np.asarray(bins).astype(int)
    dist = (np.asarray(wl) * w[ii] + np.asarray(wr) * w[np.minimum(ii + 1, reg_max)]).reshape(-1, 4)
    dec = fdr.distance2bbox(jnp.asarray(pts), jnp.asarray(dist), reg_scale)
    dec_xyxy = np.asarray(B.box_cxcywh_to_xyxy(dec))
    np.testing.assert_allclose(dec_xyxy, gt_xyxy, atol=2e-4)


def test_integral_expectation():
    reg_max = 32
    proj = fdr.weighting_function(reg_max, 0.5, 4.0)
    # a delta distribution at bin k must return W(k)
    logits = np.full((1, 4 * (reg_max + 1)), -1e9, np.float32)
    for e, k in enumerate([0, 5, 16, 32]):
        logits[0, e * (reg_max + 1) + k] = 0.0
    out = np.asarray(fdr.integral(jnp.asarray(logits), proj, reg_max))
    np.testing.assert_allclose(out[0], np.asarray(proj)[[0, 5, 16, 32]], atol=1e-4)


# ------------------------------------------------- deformable attention ----


def _torch_grid_sample(img_nhwc, grid):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1))  # NCHW
    g = torch.from_numpy(grid)
    out = F.grid_sample(t, g, mode="bilinear", padding_mode="zeros", align_corners=False)
    return np.moveaxis(out.numpy(), 1, -1)


def test_grid_sample_parity_with_torch():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(2, 5, 4, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    ref = _torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ms_deform_attn_parity_with_torch_grid_sample():
    """Full multi-level core vs a torch grid_sample composition (the exact
    computation of reference arch/utils.py:210-264, re-run here in torch)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    bs, nhead, d, q = 2, 4, 8, 6
    shapes = [(8, 12), (4, 6)]
    npoints = [3, 2]
    total_p = sum(npoints)
    value = rng.normal(size=(bs, sum(h * w for h, w in shapes), nhead, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(bs, q, nhead, total_p, 2)).astype(np.float32)
    att = rng.uniform(0, 1, size=(bs, q, nhead, total_p)).astype(np.float32)
    att /= att.sum(-1, keepdims=True)

    ours = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att), npoints)
    )

    # torch reference composition
    out_t = np.zeros((bs, q, nhead, d), np.float32)
    start_hw, start_p = 0, 0
    for (h, w), p in zip(shapes, npoints):
        v = value[:, start_hw : start_hw + h * w]  # [B,HW,nh,d]
        v = torch.from_numpy(v).permute(0, 2, 3, 1).reshape(bs * nhead, d, h, w)
        g = torch.from_numpy(2 * loc[:, :, :, start_p : start_p + p] - 1)
        g = g.permute(0, 2, 1, 3, 4).reshape(bs * nhead, q, p, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        s = s.reshape(bs, nhead, d, q, p).permute(0, 3, 1, 4, 2).numpy()  # [B,Q,nh,P,d]
        out_t += np.einsum(
            "bqnpd,bqnp->bqnd", s, att[:, :, :, start_p : start_p + p]
        )
        start_hw += h * w
        start_p += p
    np.testing.assert_allclose(ours, out_t.reshape(bs, q, nhead * d), atol=1e-4)
