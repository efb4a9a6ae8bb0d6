"""Criterion tests: jit-ability, finiteness, padding invariance, and
hand-derived loss values on minimal cases."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dfine_tpu.train.criterion import (
    CriterionConfig,
    criterion_forward,
    loss_vfl,
    _bce_with_logits,
)


def make_outputs(rng, B, Q, C, G, L=3, reg_max=32, masks=False, dn_group=2, hm=16):
    def rand(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    def randbox(*s):
        return jnp.asarray(rng.uniform(0.3, 0.6, size=s).astype(np.float32))

    def layer(q):
        return {
            "pred_logits": rand(B, q, C),
            "pred_boxes": randbox(B, q, 4),
            "pred_corners": rand(B, q, 4 * (reg_max + 1)) * 0.1,
            "ref_points": randbox(B, q, 4),
            **({"pred_masks": rand(B, q, hm, hm)} if masks else {}),
        }

    D = 2 * dn_group * G
    out = layer(Q)
    out["aux_outputs"] = [layer(Q) for _ in range(L - 1)]
    out["pre_outputs"] = {"pred_logits": rand(B, Q, C), "pred_boxes": randbox(B, Q, 4)}
    out["enc_aux_outputs"] = [
        {"pred_logits": rand(B, Q, C), "pred_boxes": randbox(B, Q, 4)}
    ]
    out["enc_meta"] = {"class_agnostic": False}
    out["dn_outputs"] = [layer(D) for _ in range(L)]
    out["dn_pre_outputs"] = {"pred_logits": rand(B, D, C), "pred_boxes": randbox(B, D, 4)}
    out["dn_meta"] = {"dn_num_group": dn_group, "dn_num_split": (D, Q), "max_gt": G}
    return out


def make_targets(rng, B, G, C, n_valid, masks=False, hm=16):
    t = {
        "labels": jnp.asarray(rng.integers(0, C, size=(B, G)).astype(np.int32)),
        "boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(B, G, 4)).astype(np.float32)),
        "valid": jnp.asarray(np.arange(G)[None, :] < np.asarray(n_valid)[:, None]),
    }
    if masks:
        t["masks"] = jnp.asarray((rng.uniform(size=(B, G, hm, hm)) > 0.7).astype(np.float32))
        t["mask_valid"] = t["valid"]
    return t


@pytest.mark.parametrize("masks", [False, True])
def test_criterion_jits_and_is_finite(masks):
    rng = np.random.default_rng(0)
    B, Q, C, G = 2, 20, 5, 4
    losses = ("vfl", "boxes", "local") + (("masks",) if masks else ())
    cfg = CriterionConfig(num_classes=C, losses=losses)
    out = make_outputs(rng, B, Q, C, G, masks=masks)
    tgt = make_targets(rng, B, G, C, n_valid=[3, 2], masks=masks)
    # enc_meta/dn_meta are trace-time-static metadata (the model emits them
    # as Python scalars inside the same trace) — keep them out of jit args
    meta = {"enc_meta": out.pop("enc_meta"), "dn_meta": out.pop("dn_meta")}
    res = jax.jit(lambda o, t: criterion_forward({**o, **meta}, t, cfg))(out, tgt)
    assert "total" in res
    for k, v in res.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(res["total"]) > 0
    if masks:
        assert any(k.startswith("loss_mask_bce") for k in res)
        assert "loss_mask_bce_dn_final" in res


def test_criterion_no_valid_gt_is_finite():
    rng = np.random.default_rng(1)
    B, Q, C, G = 2, 20, 5, 4
    cfg = CriterionConfig(num_classes=C)
    out = make_outputs(rng, B, Q, C, G)
    tgt = make_targets(rng, B, G, C, n_valid=[0, 0])
    meta = {"enc_meta": out.pop("enc_meta"), "dn_meta": out.pop("dn_meta")}
    res = jax.jit(lambda o, t: criterion_forward({**o, **meta}, t, cfg))(out, tgt)
    for k, v in res.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_padding_invariance():
    """Growing the GT pad dimension must not change any loss value
    (the core static-shape correctness property)."""
    rng = np.random.default_rng(2)
    B, Q, C = 2, 24, 5
    cfg = CriterionConfig(num_classes=C)

    out = make_outputs(rng, B, Q, C, 4, dn_group=2)
    tgt4 = make_targets(rng, B, 4, C, n_valid=[3, 2])
    # same data padded to G=6 (extra slots invalid)
    tgt6 = {
        "labels": jnp.concatenate([tgt4["labels"], jnp.zeros((B, 2), jnp.int32)], 1),
        "boxes": jnp.concatenate([tgt4["boxes"], jnp.full((B, 2, 4), 0.5)], 1),
        "valid": jnp.concatenate([tgt4["valid"], jnp.zeros((B, 2), bool)], 1),
    }
    r4 = criterion_forward(out, tgt4, cfg)
    # dn geometry depends on G; compare only the non-dn losses
    out6 = {k: v for k, v in out.items() if not k.startswith("dn_")}
    r6 = criterion_forward(out6, tgt6, cfg)
    for k in r6:
        if k == "total" or k.startswith("loss_ddf"):
            continue  # ddf num_neg depends on pad count only via num_pos/neg... it must match too
        if k in r4:
            np.testing.assert_allclose(np.asarray(r4[k]), np.asarray(r6[k]), rtol=1e-5, atol=1e-6,
                                       err_msg=k)


def test_vfl_hand_case():
    """Single query, single GT, perfect box -> known closed-form VFL."""
    C = 3
    cfg = CriterionConfig(num_classes=C, alpha=0.75, gamma=2.0)
    logits = jnp.asarray([[[2.0, -1.0, 0.0]]])  # [1,1,C]
    box = jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]])
    out = {"pred_logits": logits, "pred_boxes": box}
    tgt = {
        "labels": jnp.asarray([[0]], jnp.int32),
        "boxes": box,
        "valid": jnp.asarray([[True]]),
    }
    match_q = jnp.asarray([[0]], jnp.int32)
    res = loss_vfl(out, tgt, match_q, tgt["valid"], 1.0, cfg)

    lg = np.asarray(logits)[0, 0]
    p = 1 / (1 + np.exp(-lg))
    iou = 1.0  # perfect box
    tscore = np.array([iou, 0, 0])
    onehot = np.array([1.0, 0, 0])
    w = 0.75 * p**2 * (1 - onehot) + tscore
    bce = np.maximum(lg, 0) - lg * tscore + np.log1p(np.exp(-np.abs(lg)))
    expected = (bce * w).sum()
    np.testing.assert_allclose(float(res["loss_vfl"]), expected, rtol=1e-5)


def test_bce_with_logits_matches_definition():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64,)).astype(np.float32)
    t = rng.uniform(size=(64,)).astype(np.float32)
    ours = np.asarray(_bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    p = 1 / (1 + np.exp(-x))
    ref = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_criterion_agnostic_enc_sets():
    """query_select_method='agnostic' emits enc logits with class dim 1
    (decoder.py:416,665).  The criterion must still trace (the stacked pass
    pads enc logits to C) and the enc vfl/cost must equal the explicit
    1-class computation the reference runs (dfine_criterion.py enc branch
    with num_classes=1 and zeroed labels)."""
    from dfine_tpu.matcher import matching_cost

    rng = np.random.default_rng(7)
    B, Q, C, G = 2, 20, 5, 4
    cfg = CriterionConfig(num_classes=C)
    out = make_outputs(rng, B, Q, C, G)
    enc1 = {
        "pred_logits": jnp.asarray(rng.normal(size=(B, Q, 1)).astype(np.float32)),
        "pred_boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(B, Q, 4)).astype(np.float32)),
    }
    out["enc_aux_outputs"] = [enc1]
    out["enc_meta"] = {"class_agnostic": True}
    tgt = make_targets(rng, B, G, C, n_valid=[3, 2])

    meta = {"enc_meta": out.pop("enc_meta"), "dn_meta": out.pop("dn_meta")}
    res = jax.jit(lambda o, t: criterion_forward({**o, **meta}, t, cfg))(out, tgt)
    for k, v in res.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert "loss_vfl_enc_0" in res

    # semantic check: padded-to-C enc vfl == native 1-class enc vfl
    zeros = jnp.zeros_like(tgt["labels"])
    cfg1 = CriterionConfig(num_classes=1)
    cost1 = matching_cost(enc1["pred_logits"], enc1["pred_boxes"], zeros,
                          tgt["boxes"], tgt["valid"], cfg1.matcher)
    from dfine_tpu.ops.hungarian import hungarian
    m1 = hungarian(cost1[None], row_valid=tgt["valid"])[0]
    ref = loss_vfl(enc1, {"labels": zeros, "boxes": tgt["boxes"]},
                   m1, tgt["valid"], max(float(tgt["valid"].sum()), 1.0), cfg1)
    np.testing.assert_allclose(
        float(res["loss_vfl_enc_0"]),
        float(ref["loss_vfl"]) * cfg.weight_dict["loss_vfl"],
        rtol=1e-5,
    )


def test_criterion_dn_teacher_without_corners():
    """If the final DN set lacks pred_corners while earlier ones have them,
    the DN-DDF teacher cache is None and the DDF branch must be skipped
    (not crash) — FGL on the earlier sets still runs."""
    rng = np.random.default_rng(8)
    B, Q, C, G = 2, 20, 5, 4
    cfg = CriterionConfig(num_classes=C)
    out = make_outputs(rng, B, Q, C, G)
    out["dn_outputs"][-1] = {
        k: v for k, v in out["dn_outputs"][-1].items() if k != "pred_corners"
    }
    tgt = make_targets(rng, B, G, C, n_valid=[3, 2])
    res = criterion_forward(out, tgt, cfg)
    assert "loss_fgl_dn_0" in res
    assert not any(k.startswith("loss_ddf_dn") for k in res)
    for k, v in res.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_lazy_mask_embed_matches_precomputed_pred_masks():
    """decoder.py train mode now ships mask_embed [B,Q,C] + mask_feat
    [B,Hm,Wm,C] instead of per-set [B,Q,Hm,Wm] logits; the criterion einsums
    only the matched rows.  gather(einsum) == einsum(gather) row-wise, so the
    losses must match the precomputed-pred_masks path to float tolerance."""
    from dfine_tpu.train.criterion import CriterionConfig, criterion_forward

    rng = np.random.default_rng(3)
    B, Q, C, G, hm, ch = 2, 12, 5, 4, 16, 8
    out = make_outputs(rng, B, Q, C, G, masks=False)
    tgt = make_targets(rng, B, G, C, n_valid=[3, 2], masks=True, hm=hm)

    feat = jnp.asarray(rng.normal(size=(B, hm, hm, ch)).astype(np.float32))
    def emb(q):
        return jnp.asarray(rng.normal(size=(B, q, ch)).astype(np.float32))

    D = out["dn_outputs"][0]["pred_logits"].shape[1]
    lazy = dict(out)
    lazy["mask_feat"] = feat
    lazy["mask_embed"] = emb(Q)
    lazy["aux_outputs"] = [dict(a, mask_embed=emb(Q)) for a in out["aux_outputs"]]
    lazy["dn_outputs"] = [dict(d, mask_embed=emb(D)) for d in out["dn_outputs"]]

    dense = dict(out)
    dense["pred_masks"] = jnp.einsum("bqc,bxyc->bqxy", lazy["mask_embed"], feat)
    dense["aux_outputs"] = [
        dict(a, pred_masks=jnp.einsum("bqc,bxyc->bqxy", la["mask_embed"], feat))
        for a, la in zip(out["aux_outputs"], lazy["aux_outputs"])
    ]
    dense["dn_outputs"] = [
        dict(d, pred_masks=jnp.einsum("bqc,bxyc->bqxy", ld["mask_embed"], feat))
        for d, ld in zip(out["dn_outputs"], lazy["dn_outputs"])
    ]

    cfg = CriterionConfig(num_classes=C, losses=("vfl", "boxes", "local", "masks"))
    l_lazy = criterion_forward(lazy, tgt, cfg)
    l_dense = criterion_forward(dense, tgt, cfg)
    assert set(l_lazy) == set(l_dense)
    mask_keys = [k for k in l_lazy if "mask" in k]
    assert mask_keys, l_lazy.keys()
    for k in l_lazy:
        np.testing.assert_allclose(
            np.asarray(l_lazy[k]), np.asarray(l_dense[k]), rtol=2e-5, atol=1e-6,
            err_msg=k)
