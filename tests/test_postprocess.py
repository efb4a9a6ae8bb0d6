"""Postprocess: top-k decode semantics and geometry round-trips."""

import numpy as np
import jax
import jax.numpy as jnp

from dfine_tpu.postprocess import (
    boxes_to_original,
    cleanup_masks,
    masks_to_original,
    postprocess_predictions,
    topk_decode,
    unletterbox_boxes,
)


def test_topk_decode_flat_qc():
    """Flat top-k over Q*C: label = idx % C, query = idx // C
    (reference train.py:251-258)."""
    B, Q, C = 1, 4, 3
    logits = np.full((B, Q, C), -10.0, np.float32)
    logits[0, 2, 1] = 5.0  # best
    logits[0, 0, 2] = 3.0  # second
    boxes = np.tile(np.asarray([[0.1, 0.1, 0.05, 0.05]], np.float32), (Q, 1))[None]
    boxes[0, 2] = [0.5, 0.5, 0.2, 0.2]
    out = jax.tree.map(np.asarray, topk_decode(jnp.asarray(logits), jnp.asarray(boxes), 5))
    assert out["labels"][0, 0] == 1 and out["qidx"][0, 0] == 2
    assert out["labels"][0, 1] == 2 and out["qidx"][0, 1] == 0
    np.testing.assert_allclose(out["boxes"][0, 0], [0.5, 0.5, 0.2, 0.2])
    np.testing.assert_allclose(out["scores"][0, 0], 1 / (1 + np.exp(-5.0)), rtol=1e-5)


def test_box_letterbox_roundtrip():
    """letterbox forward (data/augment) then unletterbox must recover the
    original absolute box."""
    from dfine_tpu.data.augment import letterbox

    orig_hw = (300, 500)
    proc_hw = (128, 128)
    box_abs = np.asarray([[50.0, 60.0, 350.0, 200.0]], np.float32)
    img = np.zeros((*orig_hw, 3), np.uint8)
    _, scale, (top, left) = letterbox(img, proc_hw)
    fwd = box_abs * scale
    fwd[:, [0, 2]] += left
    fwd[:, [1, 3]] += top
    back = unletterbox_boxes(fwd, proc_hw, orig_hw)
    # ~1px quantization in the letterboxed frame unmaps to ~1/scale px;
    # the reference's scale_boxes_ratio_kept has the same asymmetry.
    atol = 1.5 / scale
    np.testing.assert_allclose(back, box_abs, atol=atol)


def test_boxes_to_original_plain():
    proc_hw, orig_hw = (100, 100), (200, 400)
    boxes_norm = np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32)
    out = boxes_to_original(boxes_norm, proc_hw, orig_hw, keep_ratio=False)
    np.testing.assert_allclose(out[0], [160, 80, 240, 120], atol=1e-3)


def test_masks_to_original_and_cleanup():
    probs = np.zeros((1, 8, 8), np.float32)
    probs[0, 2:6, 2:6] = 1.0
    out = masks_to_original(probs, (64, 64), (32, 32), keep_ratio=False)
    assert out.shape == (1, 32, 32)
    assert out[0, 16, 16] > 0.9 and out[0, 0, 0] < 0.1
    binary = (out >= 0.5).astype(np.uint8)
    cleaned = cleanup_masks(binary, np.asarray([[0.0, 0.0, 16.0, 32.0]]))
    assert cleaned[0, :, 17:].sum() == 0  # zeroed outside own box
    assert cleaned[0, :, :16].sum() > 0


def test_postprocess_predictions_contract():
    B, K = 2, 6
    rng = np.random.default_rng(0)
    decoded = {
        "scores": np.linspace(0.9, 0.1, B * K).reshape(B, K).astype(np.float32),
        "labels": rng.integers(0, 3, (B, K)).astype(np.int32),
        "boxes": rng.uniform(0.3, 0.6, (B, K, 4)).astype(np.float32),
    }
    res = postprocess_predictions(decoded, (100, 100), [(50, 80), (70, 30)],
                                  conf_thresh=0.5, keep_ratio=False)
    assert len(res) == 2
    for r, (oh, ow) in zip(res, [(50, 80), (70, 30)]):
        assert (r["scores"] >= 0.5).all()
        assert len(r["all_scores"]) == K
        if len(r["boxes"]):
            assert r["boxes"][:, [0, 2]].max() <= ow and r["boxes"][:, [1, 3]].max() <= oh
