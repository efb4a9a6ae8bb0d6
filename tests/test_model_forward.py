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
    assert out["pred_masks"].shape[:2] == (2, 300)
    assert out["dn_outputs"][0]["pred_masks"].shape[:2] == (2, d)
    assert "batch_stats" in mutated
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()
