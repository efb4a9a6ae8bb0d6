"""Loss parity with the reference DFINECriterion.

Runs the actual reference criterion (torch, with stubbed torchvision) and
our static-shape JAX criterion on identical synthetic outputs/targets and
compares every loss component.  This pins the training signal to the
reference bit-for-bit (up to fp32 noise), covering matcher assignments,
go-union, FGL bin targets, DDF weighting and the DN branch."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_compat import _install_stubs

C = 6
Q = 20
G = 3
B = 2
REG_MAX = 32
L = 3  # decoder layers


def _make_raw(rng, masks=False, hm=16):
    def layer(q):
        return {
            "logits": rng.normal(size=(B, q, C)).astype(np.float32),
            "boxes": rng.uniform(0.25, 0.7, size=(B, q, 4)).astype(np.float32),
            "corners": (rng.normal(size=(B, q, 4 * (REG_MAX + 1))) * 0.2).astype(np.float32),
            "refs": rng.uniform(0.3, 0.6, size=(B, q, 4)).astype(np.float32),
            **({"masks": rng.normal(size=(B, q, hm, hm)).astype(np.float32)} if masks else {}),
        }

    n_group = 2
    D = 2 * n_group * G
    raw = {
        "layers": [layer(Q) for _ in range(L)],
        "pre": layer(Q),
        "enc": layer(Q),
        "dn_layers": [layer(D) for _ in range(L)],
        "dn_pre": layer(D),
        "n_group": n_group,
        "tgt_labels": rng.integers(0, C, size=(B, G)).astype(np.int64),
        "tgt_boxes": rng.uniform(0.3, 0.65, size=(B, G, 4)).astype(np.float32),
        "n_valid": [G, G - 1],
        **({"tgt_masks": (rng.uniform(size=(B, G, hm, hm)) > 0.6).astype(np.float32)}
           if masks else {}),
    }
    # shared ref points within a branch (the model emits ref_points_initial
    # for every layer)
    for lay in raw["layers"][1:]:
        lay["refs"] = raw["layers"][0]["refs"]
    for lay in raw["dn_layers"][1:]:
        lay["refs"] = raw["dn_layers"][0]["refs"]
    return raw


def _reference_losses(raw, masks=False):
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    from src.d_fine.dfine_criterion import DFINECriterion
    from src.d_fine.matcher import HungarianMatcher

    t = torch.from_numpy
    losses = ["vfl", "boxes", "local"] + (["masks"] if masks else [])
    crit = DFINECriterion(
        HungarianMatcher({"cost_class": 2, "cost_bbox": 5, "cost_giou": 2},
                         use_focal_loss=True, alpha=0.25, gamma=2.0),
        weight_dict={"loss_vfl": 1, "loss_bbox": 5, "loss_giou": 2,
                     "loss_fgl": 0.15, "loss_ddf": 1.5,
                     "loss_mask_bce": 10, "loss_mask_dice": 10},
        losses=losses,
        alpha=0.75, gamma=2.0, num_classes=C, reg_max=REG_MAX,
    )

    def lay(d, teach=None, with_masks=False):
        out = {"pred_logits": t(d["logits"]), "pred_boxes": t(d["boxes"]),
               "pred_corners": t(d["corners"]), "ref_points": t(d["refs"])}
        if teach is not None:
            out["teacher_corners"] = t(teach["corners"])
            out["teacher_logits"] = t(teach["logits"])
        if with_masks and "masks" in d:
            out["pred_masks"] = t(d["masks"])
        return out

    final = raw["layers"][-1]
    outputs = lay(final, with_masks=masks)
    outputs["up"] = torch.tensor([0.5])
    outputs["reg_scale"] = torch.tensor([4.0])
    outputs["aux_outputs"] = [lay(d, final, with_masks=masks) for d in raw["layers"][:-1]]
    outputs["pre_outputs"] = {"pred_logits": t(raw["pre"]["logits"]),
                              "pred_boxes": t(raw["pre"]["boxes"])}
    outputs["enc_aux_outputs"] = [{"pred_logits": t(raw["enc"]["logits"]),
                                   "pred_boxes": t(raw["enc"]["boxes"])}]
    outputs["enc_meta"] = {"class_agnostic": False}

    dn_final = raw["dn_layers"][-1]
    n_group = raw["n_group"]
    if masks:
        outputs["dn_outputs"] = [lay(d, dn_final, with_masks=True)
                                 for d in raw["dn_layers"][:-1]]
        outputs["dn_pred_masks"] = t(dn_final["masks"])
    else:
        outputs["dn_outputs"] = [lay(d, dn_final) for d in raw["dn_layers"]]
    outputs["dn_pre_outputs"] = {"pred_logits": t(raw["dn_pre"]["logits"]),
                                 "pred_boxes": t(raw["dn_pre"]["boxes"])}
    pos_idx = []
    for i, n in enumerate(raw["n_valid"]):
        idx = np.concatenate([g * 2 * G + np.arange(n) for g in range(n_group)])
        pos_idx.append(torch.from_numpy(idx).long())
    outputs["dn_meta"] = {"dn_positive_idx": pos_idx, "dn_num_group": n_group,
                          "dn_num_split": [2 * n_group * G, Q]}

    targets = []
    for i, n in enumerate(raw["n_valid"]):
        tt = {"labels": t(raw["tgt_labels"][i, :n]), "boxes": t(raw["tgt_boxes"][i, :n])}
        if masks:
            tt["masks"] = t(raw["tgt_masks"][i, :n])
        targets.append(tt)
    with torch.no_grad():
        out = crit(outputs, targets)
    return {k: float(v) for k, v in out.items()}


def _our_losses(raw, masks=False):
    from dfine_tpu.train.criterion import CriterionConfig, criterion_forward

    def lay(d, with_masks=False):
        out = {"pred_logits": jnp.asarray(d["logits"]), "pred_boxes": jnp.asarray(d["boxes"]),
               "pred_corners": jnp.asarray(d["corners"]), "ref_points": jnp.asarray(d["refs"])}
        if with_masks and "masks" in d:
            out["pred_masks"] = jnp.asarray(d["masks"])
        return out

    outputs = lay(raw["layers"][-1], with_masks=masks)
    outputs["aux_outputs"] = [lay(d, with_masks=masks) for d in raw["layers"][:-1]]
    outputs["pre_outputs"] = {"pred_logits": jnp.asarray(raw["pre"]["logits"]),
                              "pred_boxes": jnp.asarray(raw["pre"]["boxes"])}
    outputs["enc_aux_outputs"] = [{"pred_logits": jnp.asarray(raw["enc"]["logits"]),
                                   "pred_boxes": jnp.asarray(raw["enc"]["boxes"])}]
    outputs["enc_meta"] = {"class_agnostic": False}
    outputs["dn_outputs"] = [lay(d, with_masks=masks) for d in raw["dn_layers"]]
    outputs["dn_pre_outputs"] = {"pred_logits": jnp.asarray(raw["dn_pre"]["logits"]),
                                 "pred_boxes": jnp.asarray(raw["dn_pre"]["boxes"])}
    outputs["dn_meta"] = {"dn_num_group": raw["n_group"],
                          "dn_num_split": (2 * raw["n_group"] * G, Q), "max_gt": G}

    valid = np.zeros((B, G), bool)
    for i, n in enumerate(raw["n_valid"]):
        valid[i, :n] = True
    targets = {
        "labels": jnp.asarray(raw["tgt_labels"].astype(np.int32)),
        "boxes": jnp.asarray(raw["tgt_boxes"]),
        "valid": jnp.asarray(valid),
    }
    if masks:
        targets["masks"] = jnp.asarray(raw["tgt_masks"])
        targets["mask_valid"] = targets["valid"]
    losses = ("vfl", "boxes", "local") + (("masks",) if masks else ())
    cfg = CriterionConfig(num_classes=C, losses=losses, reg_max=REG_MAX)
    out = criterion_forward(outputs, targets, cfg)
    return {k: float(v) for k, v in out.items()}


@pytest.mark.slow
@pytest.mark.parametrize("masks", [False, True])
def test_criterion_matches_reference(masks):
    rng = np.random.default_rng(42)
    raw = _make_raw(rng, masks=masks)
    ref = _reference_losses(raw, masks=masks)
    ours = _our_losses(raw, masks=masks)

    # key naming matches by construction (same suffix scheme)
    compared = 0
    diffs = {}
    for k, v in ref.items():
        assert k in ours, f"missing loss {k} (ours has {sorted(ours)})"
        diffs[k] = abs(ours[k] - v)
        compared += 1
    bad = {k: (ref[k], ours[k]) for k, d in diffs.items() if d > 3e-4 * (1 + abs(ref[k]))}
    assert compared >= 20
    assert not bad, f"mismatched losses: {bad}"
