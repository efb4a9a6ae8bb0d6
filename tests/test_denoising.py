"""CDN group construction invariants (reference arch/utils.py:357-467)."""

import numpy as np
import jax
import jax.numpy as jnp

from dfine_tpu.models.denoising import build_cdn_queries, dn_attn_mask, dn_match_indices
from dfine_tpu.ops.boxes import box_cxcywh_to_xyxy


def _setup(box_noise=1.0, label_noise=0.5, G=5, B=3, C=7):
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, C, (B, G)).astype(np.int32))
    boxes = jnp.asarray(rng.uniform(0.3, 0.6, (B, G, 4)).astype(np.float32))
    valid = jnp.asarray(np.tile(np.arange(G)[None] < np.array([[5], [3], [0]]), (1, 1)))
    cls, dn_unact, meta = build_cdn_queries(
        labels, boxes, valid, jax.random.key(1), C, num_denoising=20,
        label_noise_ratio=label_noise, box_noise_scale=box_noise,
    )
    return labels, boxes, valid, cls, dn_unact, meta, C


def test_geometry_and_padding():
    labels, boxes, valid, cls, dn_unact, meta, C = _setup()
    G = 5
    assert meta.num_group == 4  # 20 // 5
    assert meta.num_denoising == 2 * 4 * G
    assert cls.shape == (3, meta.num_denoising)
    # padded GT slots carry the background class everywhere
    cls_np = np.asarray(cls).reshape(3, 2 * meta.num_group, G)
    v = np.asarray(valid)
    for b in range(3):
        assert (cls_np[b][:, ~v[b]] == C).all()
    # image with zero GTs: all background
    assert (np.asarray(cls)[2] == C).all()


def test_negative_half_pushed_outside_box():
    """Negative-group boxes must lie outside the GT box (part in [1,2))."""
    labels, boxes, valid, cls, dn_unact, meta, C = _setup(box_noise=1.0, label_noise=0.0)
    G = 5
    dn_boxes = np.asarray(jax.nn.sigmoid(dn_unact)).reshape(3, meta.num_group, 2, G, 4)
    gt = np.asarray(boxes)
    v = np.asarray(valid)
    b = 0  # all valid
    for g in range(meta.num_group):
        pos = dn_boxes[b, g, 0]
        neg = dn_boxes[b, g, 1]
        # all noisy boxes stay normalized
        assert (pos >= -1e-6).all() and (pos <= 1 + 1e-6).all()
        assert (neg >= -1e-6).all() and (neg <= 1 + 1e-6).all()
        # negative centers displaced further than positive centers on average
        # (negatives' noise part lives in [1,2), positives' in [0,1))
        assert np.abs(neg[:, :2] - gt[b][:, :2]).mean() > np.abs(
            pos[:, :2] - gt[b][:, :2]
        ).mean()


def test_attn_mask_block_structure():
    keep = dn_attn_mask(num_group=2, max_gt=3, num_queries=4)
    d = 2 * 3 * 2
    # match queries cannot see DN
    assert not keep[d:, :d].any()
    # match queries see themselves
    assert keep[d:, d:].all()
    # DN groups mutually blind, see themselves + match queries
    assert keep[0:6, 0:6].all() and not keep[0:6, 6:12].any()
    assert not keep[6:12, 0:6].any() and keep[6:12, 6:12].all()
    assert keep[0:6, d:].all()


def test_dn_match_indices_layout():
    valid = jnp.asarray([[True, True, False]])
    q, t, pv = dn_match_indices(valid, num_group=2)
    # group g positives sit at g*2*G + j
    assert q[0].tolist() == [0, 1, 2, 6, 7, 8]
    assert t[0].tolist() == [0, 1, 2, 0, 1, 2]
    assert pv[0].tolist() == [True, True, False, True, True, False]
