"""Cross-dataset pretrained import: Obj365-pretrained reference weights into
a COCO-indexed model with class-head row remapping (reference
d_fine/utils.py load_tuning_state capability)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import build_reference_model


@pytest.mark.slow
def test_obj365_to_coco_head_adaptation():
    from dfine_tpu.models import build_model
    from dfine_tpu.utils.checkpoint import OBJ365_IDS, load_torch_checkpoint

    ref = build_reference_model("n", 366)  # "obj365-pretrained"
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    model = build_model("n", num_classes=80)
    g = 4
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    tgt = {"labels": jnp.zeros((1, g), jnp.int32),
           "boxes": jnp.full((1, g, 4), 0.5), "valid": jnp.ones((1, g), bool)}
    template = model.init(
        {"params": jax.random.key(0), "dn": jax.random.key(1)}, x, tgt, train=True
    )
    out = load_torch_checkpoint(sd, template, verbose=False)

    w_ours = np.asarray(out["params"]["decoder"]["enc_score_head"]["kernel"]).T
    b_ours = np.asarray(out["params"]["decoder"]["enc_score_head"]["bias"])
    w_ref = sd["decoder.enc_score_head.weight"]
    b_ref = sd["decoder.enc_score_head.bias"]
    for coco_id in (0, 7, 42, 79):
        np.testing.assert_array_equal(w_ours[coco_id], w_ref[OBJ365_IDS[coco_id] + 1])
        np.testing.assert_array_equal(b_ours[coco_id], b_ref[OBJ365_IDS[coco_id] + 1])
    # per-layer decoder score heads remapped too
    w3 = np.asarray(out["params"]["decoder"]["dec_score_head_2"]["kernel"]).T
    w3_ref = sd["decoder.dec_score_head.2.weight"]
    np.testing.assert_array_equal(w3[5], w3_ref[OBJ365_IDS[5] + 1])
    # size-mismatched denoising embedding dropped -> keeps the template init
    emb = np.asarray(out["params"]["decoder"]["denoising_class_embed"]["embedding"])
    assert emb.shape[0] == 81
