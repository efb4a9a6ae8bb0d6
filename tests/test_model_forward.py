"""Shape/smoke tests for the full DFINE model (CPU, tiny inputs, jitted)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dfine_tpu.models import build_model


@pytest.mark.parametrize("size,img", [("n", 320), ("s", 160)])
def test_eval_forward_shapes(size, img):
    model = build_model(size, num_classes=7, enable_mask_head=False)
    x = jnp.zeros((2, img, img, 3), jnp.float32)
    variables = jax.jit(lambda: model.init({"params": jax.random.key(0)}, x, train=False))()
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out["pred_logits"].shape == (2, 300, 7)
    assert out["pred_boxes"].shape == (2, 300, 4)
    b = np.asarray(out["pred_boxes"])
    assert (b >= -1e-6).all() and (b <= 1 + 1e-6).all()


def test_eval_forward_tiny_canvas_clamps_queries():
    """rect-mode serving can produce canvases where sumHW < num_queries (n
    model, 2 levels at stride 16/32: 160x320 -> 250 anchors).  The decoder
    must clamp the query count to the anchor count instead of crashing in
    top_k (regression: r2 TPU serving bug)."""
    model = build_model("n", num_classes=3, enable_mask_head=False)
    x = jnp.zeros((1, 160, 320, 3), jnp.float32)
    variables = jax.jit(lambda: model.init({"params": jax.random.key(0)}, x, train=False))()
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out["pred_logits"].shape == (1, 250, 3)
    assert out["pred_boxes"].shape == (1, 250, 4)
    # and topk_decode copes with Q*C < requested k
    from dfine_tpu.postprocess import topk_decode

    dec = topk_decode(out["pred_logits"], out["pred_boxes"], 300)
    assert dec["scores"].shape[1] == min(300, 250 * 3)


def test_train_forward_with_dn_and_masks():
    model = build_model("n", num_classes=5, enable_mask_head=True)
    x = jnp.zeros((2, 320, 320, 3), jnp.float32)
    max_gt = 10
    targets = {
        "labels": jnp.zeros((2, max_gt), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[0.5, 0.5, 0.2, 0.2]]), (2, max_gt, 1)),
        "valid": jnp.asarray([[True] * 3 + [False] * 7, [False] * 10]),
    }
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "dn": jax.random.key(1)}, x, targets, train=True
        )
    )()
    out, mutated = jax.jit(
        lambda v, x, t: model.apply(
            v, x, t, train=True, rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"]
        )
    )(variables, x, targets)
    num_group = max(1, 100 // max_gt)
    d = 2 * num_group * max_gt
    assert out["pred_logits"].shape == (2, 300, 5)
    assert out["dn_outputs"][-1]["pred_logits"].shape == (2, d, 5)
    assert len(out["aux_outputs"]) == 3 - 1  # n has 3 decoder layers
    assert out["pred_corners"].shape == (2, 300, 4 * 33)
    # train mode ships the LAZY mask head: per-set query embeddings + the
    # shared pixel features (the criterion einsums only matched rows);
    # [B,Q,Hm,Wm] pred_masks exist only in eval mode (decoder.py)
    ch = out["mask_feat"].shape[-1]
    assert out["mask_embed"].shape == (2, 300, ch)
    # n's finest feature level is stride 16 (configs.py feat_strides), so the
    # pixel decoder's upconv lands at stride 8 = 40x40 at 320 (s/m/l/x have a
    # stride-8 level and land at stride 4, like the reference)
    assert out["mask_feat"].shape[:3] == (2, 40, 40)
    assert out["dn_outputs"][0]["mask_embed"].shape == (2, d, ch)
    assert all("mask_embed" in a for a in out["aux_outputs"])
    assert "pred_masks" not in out
    assert "batch_stats" in mutated
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_layer_scale_widened_tail_layers():
    """layer_scale > 1 widens the post-eval_idx decoder layers (reference
    dfine_decoder.py:574,684,693 — wide heads; :475-480 — nearest channel
    upsample of query_pos/output/value at the transition).  Train forward
    runs the wide tail; eval stops at eval_idx so the tail is pruned."""
    model = build_model(
        "n", num_classes=4, enable_mask_head=False,
        cfg_overrides=(("decoder.layer_scale", 2), ("decoder.eval_idx", 1)),
    )
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    g = 4
    targets = {
        "labels": jnp.zeros((1, g), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]], jnp.float32), (1, g, 1)),
        "valid": jnp.asarray([[True, True, False, False]]),
    }
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "dn": jax.random.key(1)}, x, targets, train=True
        )
    )()
    dec = variables["params"]["decoder"]
    hd = 128  # n hidden_dim
    # layer 2 (post-eval_idx) must hold widened params, layers 0-1 normal
    assert dec["decoder_layers_1"]["linear1"]["kernel"].shape == (hd, 512)
    assert dec["decoder_layers_2"]["linear1"]["kernel"].shape == (2 * hd, 2 * 512)
    assert dec["dec_bbox_head_2"]["layers_0"]["kernel"].shape[0] == 2 * hd
    out, _ = jax.jit(
        lambda v, x, t: model.apply(
            v, x, t, train=True, rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"]
        )
    )(variables, x, targets)
    assert len(out["aux_outputs"]) == 2  # 3 layers -> 2 aux
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()
    # eval path never traces the wide tail and still works off these params
    out_eval = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out_eval["pred_logits"].shape == (1, 300, 4)
