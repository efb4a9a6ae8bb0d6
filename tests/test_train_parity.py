"""Train-mode parity with the reference: aux-branch wiring and gradients.

Eval parity (test_torch_parity) pins the shared modules; these tests pin the
train-only paths: per-layer aux outputs / pre outputs / encoder aux (with
denoising disabled so randomness is out of the picture), and the GRADIENT of
the criterion w.r.t. model outputs (stop-gradient placement)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import build_reference_model, _install_stubs


@pytest.mark.slow
def test_train_forward_aux_parity():
    """All aux/pre/enc branch outputs must match the reference in train mode
    (num_denoising=0 to remove randomness)."""
    import torch

    from dfine_tpu.models import build_model
    from dfine_tpu.utils.checkpoint import load_torch_checkpoint

    num_classes, img = 5, 320
    ref = build_reference_model("n", num_classes)
    ref.decoder.num_denoising = 0
    ref.train()
    # put BN in eval statistics mode but keep the train-path control flow:
    # running stats are fresh (0/1) on both sides, but train-mode BN uses
    # batch stats — also identical math. So full train() is comparable.

    model = build_model("n", num_classes=num_classes)
    g = 4
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    tgt = {
        "labels": jnp.zeros((1, g), jnp.int32),
        "boxes": jnp.full((1, g, 4), 0.5, jnp.float32),
        "valid": jnp.ones((1, g), bool),
    }
    template = model.init(
        {"params": jax.random.key(0), "dn": jax.random.key(1)}, x, tgt, train=True
    )
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    variables = jax.tree.map(
        jnp.asarray, load_torch_checkpoint(sd, template, verbose=False)
    )

    rng = np.random.default_rng(3)
    xi = rng.uniform(size=(1, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xi.transpose(0, 3, 1, 2)), targets=None)

    # our model with CDN disabled: pass targets=None in train mode
    out, _ = model.apply(
        variables, jnp.asarray(xi), None, train=True,
        rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"],
    )

    def pair(r, o):
        rb, ob = r["pred_boxes"].detach().numpy()[0], np.asarray(o["pred_boxes"])[0]
        cost = np.abs(rb[:, None] - ob[None]).sum(-1)
        m = cost.argmin(1)
        assert len(set(m.tolist())) == len(m)
        np.testing.assert_allclose(ob[m], rb, atol=1e-3, rtol=1e-2)
        rl, ol = r["pred_logits"].detach().numpy()[0], np.asarray(o["pred_logits"])[0]
        np.testing.assert_allclose(ol[m], rl, atol=5e-3, rtol=5e-2)
        return m

    pair(ref_out, out)
    assert len(ref_out["aux_outputs"]) == len(out["aux_outputs"])
    for r_aux, o_aux in zip(ref_out["aux_outputs"], out["aux_outputs"]):
        pair(r_aux, o_aux)
    pair(ref_out["pre_outputs"], out["pre_outputs"])
    for r_enc, o_enc in zip(ref_out["enc_aux_outputs"], out["enc_aux_outputs"]):
        pair(r_enc, o_enc)


@pytest.mark.slow
def test_criterion_gradient_parity():
    """d(total weighted loss)/d(pred tensors) must match the reference —
    this pins every stop_gradient/detach placement."""
    import torch

    sys.path.insert(0, "tests")
    from test_criterion_parity import _make_raw, C, G, Q, REG_MAX

    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.d_fine.dfine_criterion import DFINECriterion
    from src.d_fine.matcher import HungarianMatcher

    rng = np.random.default_rng(7)
    raw = _make_raw(rng)

    # ---- reference: build torch graph with leaves requiring grad
    crit = DFINECriterion(
        HungarianMatcher({"cost_class": 2, "cost_bbox": 5, "cost_giou": 2},
                         use_focal_loss=True, alpha=0.25, gamma=2.0),
        weight_dict={"loss_vfl": 1, "loss_bbox": 5, "loss_giou": 2,
                     "loss_fgl": 0.15, "loss_ddf": 1.5},
        losses=["vfl", "boxes", "local"], alpha=0.75, gamma=2.0,
        num_classes=C, reg_max=REG_MAX,
    )
    leaves = {}

    def leaf(name, arr):
        t = torch.from_numpy(arr).clone().requires_grad_(True)
        leaves[name] = t
        return t

    final = raw["layers"][-1]
    outputs = {
        "pred_logits": leaf("logits", final["logits"]),
        "pred_boxes": leaf("boxes", final["boxes"]),
        "pred_corners": leaf("corners", final["corners"]),
        "ref_points": torch.from_numpy(final["refs"]),
        "up": torch.tensor([0.5]), "reg_scale": torch.tensor([4.0]),
    }
    aux0 = raw["layers"][0]
    outputs["aux_outputs"] = [{
        "pred_logits": leaf("aux_logits", aux0["logits"]),
        "pred_boxes": leaf("aux_boxes", aux0["boxes"]),
        "pred_corners": leaf("aux_corners", aux0["corners"]),
        "ref_points": torch.from_numpy(aux0["refs"]),
        "teacher_corners": outputs["pred_corners"],
        "teacher_logits": outputs["pred_logits"],
    }]
    outputs["pre_outputs"] = {"pred_logits": torch.from_numpy(raw["pre"]["logits"]),
                              "pred_boxes": torch.from_numpy(raw["pre"]["boxes"])}
    outputs["enc_aux_outputs"] = [{"pred_logits": torch.from_numpy(raw["enc"]["logits"]),
                                   "pred_boxes": torch.from_numpy(raw["enc"]["boxes"])}]
    outputs["enc_meta"] = {"class_agnostic": False}
    targets = []
    for i, n in enumerate(raw["n_valid"]):
        targets.append({"labels": torch.from_numpy(raw["tgt_labels"][i, :n]),
                        "boxes": torch.from_numpy(raw["tgt_boxes"][i, :n])})
    total = sum(crit(outputs, targets).values())
    total.backward()
    ref_grads = {k: v.grad.numpy() for k, v in leaves.items()}

    # ---- ours
    from dfine_tpu.train.criterion import CriterionConfig, criterion_forward

    cfg = CriterionConfig(num_classes=C, reg_max=REG_MAX)
    valid = np.zeros((2, G), bool)
    for i, n in enumerate(raw["n_valid"]):
        valid[i, :n] = True
    tgt = {"labels": jnp.asarray(raw["tgt_labels"].astype(np.int32)),
           "boxes": jnp.asarray(raw["tgt_boxes"]), "valid": jnp.asarray(valid)}

    def total_fn(lv):
        out = {
            "pred_logits": lv["logits"], "pred_boxes": lv["boxes"],
            "pred_corners": lv["corners"], "ref_points": jnp.asarray(final["refs"]),
            "aux_outputs": [{
                "pred_logits": lv["aux_logits"], "pred_boxes": lv["aux_boxes"],
                "pred_corners": lv["aux_corners"],
                "ref_points": jnp.asarray(aux0["refs"]),
            }],
            "pre_outputs": {"pred_logits": jnp.asarray(raw["pre"]["logits"]),
                            "pred_boxes": jnp.asarray(raw["pre"]["boxes"])},
            "enc_aux_outputs": [{"pred_logits": jnp.asarray(raw["enc"]["logits"]),
                                 "pred_boxes": jnp.asarray(raw["enc"]["boxes"])}],
            "enc_meta": {"class_agnostic": False},
        }
        return criterion_forward(out, tgt, cfg)["total"]

    lv = {"logits": jnp.asarray(final["logits"]), "boxes": jnp.asarray(final["boxes"]),
          "corners": jnp.asarray(final["corners"]),
          "aux_logits": jnp.asarray(aux0["logits"]), "aux_boxes": jnp.asarray(aux0["boxes"]),
          "aux_corners": jnp.asarray(aux0["corners"])}
    our_grads = jax.grad(total_fn)(lv)

    for k in ref_grads:
        np.testing.assert_allclose(
            np.asarray(our_grads[k]), ref_grads[k], atol=2e-5, rtol=1e-3,
            err_msg=f"grad mismatch for {k}",
        )


@pytest.mark.slow
def test_train_forward_layer_scale_parity():
    """layer_scale=2 widened post-eval_idx tail (reference dfine_decoder.py:
    408-411, 475-480, 693): import a reference model built with
    layer_scale=2 / eval_idx=1 and assert train-mode forward parity of every
    layer INCLUDING the widened ones (final output comes from the wide
    layer).  num_denoising=0 removes CDN randomness."""
    import torch

    from dfine_tpu.models import build_model
    from dfine_tpu.utils.checkpoint import load_torch_checkpoint

    num_classes, img = 5, 320
    dec_over = {"layer_scale": 2, "eval_idx": 1, "num_denoising": 0}
    ref = build_reference_model("n", num_classes, decoder_overrides=dec_over)
    ref.train()

    model = build_model(
        "n", num_classes=num_classes,
        cfg_overrides=(
            ("decoder.layer_scale", 2),
            ("decoder.eval_idx", 1),
            ("decoder.num_denoising", 0),
        ),
    )
    g = 4
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    tgt = {
        "labels": jnp.zeros((1, g), jnp.int32),
        "boxes": jnp.full((1, g, 4), 0.5, jnp.float32),
        "valid": jnp.ones((1, g), bool),
    }
    template = model.init(
        {"params": jax.random.key(0), "dn": jax.random.key(1)}, x, tgt, train=True
    )
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    # strict: every reference param (incl. the wide-tail layers' weights and
    # the scaled_dim bbox/score heads) must land in our tree
    variables = jax.tree.map(
        jnp.asarray, load_torch_checkpoint(sd, template, verbose=False, strict=True)
    )

    rng = np.random.default_rng(5)
    xi = rng.uniform(size=(1, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(xi.transpose(0, 3, 1, 2)), targets=None)
    out, _ = model.apply(
        variables, jnp.asarray(xi), None, train=True,
        rngs={"dn": jax.random.key(2)}, mutable=["batch_stats"],
    )

    def pair(r, o):
        rb, ob = r["pred_boxes"].detach().numpy()[0], np.asarray(o["pred_boxes"])[0]
        cost = np.abs(rb[:, None] - ob[None]).sum(-1)
        m = cost.argmin(1)
        assert len(set(m.tolist())) == len(m)
        np.testing.assert_allclose(ob[m], rb, atol=1e-3, rtol=1e-2)
        rl, ol = r["pred_logits"].detach().numpy()[0], np.asarray(o["pred_logits"])[0]
        np.testing.assert_allclose(ol[m], rl, atol=5e-3, rtol=5e-2)

    # final output IS the widened layer (num_layers-1 > eval_idx)
    pair(ref_out, out)
    assert len(ref_out["aux_outputs"]) == len(out["aux_outputs"])
    for r_aux, o_aux in zip(ref_out["aux_outputs"], out["aux_outputs"]):
        pair(r_aux, o_aux)
