"""Optimizer param-grouping, schedule, EMA and freeze-mask tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dfine_tpu.train.optim import (
    OptimConfig,
    build_optimizer,
    ema_momentum,
    ema_update,
    freeze_mask,
    label_tree,
    onecycle,
    param_group_label,
)


def test_param_group_labels_match_reference_rules():
    # reference dfine.py:87-124: backbone +- norm, encdec norm/bias, rest
    assert param_group_label(("backbone", "stem", "conv", "kernel")) == "backbone"
    assert param_group_label(("backbone", "stem", "bn", "scale")) == "backbone_norm"
    assert param_group_label(("encoder", "fpn", "norm", "bias")) == "encdec_norm_bias"
    assert param_group_label(("encoder", "fpn", "conv", "bias")) == "encdec_norm_bias"
    assert param_group_label(("decoder", "head", "kernel")) == "rest"
    assert param_group_label(("decoder", "norm1", "scale")) == "encdec_norm_bias"


def test_onecycle_matches_torch_semantics():
    cfg = OptimConfig(base_lr=1e-3, epochs=10, steps_per_epoch=100, pct_start=0.1)
    s = onecycle(2e-3, cfg)
    # initial = peak/25, peak at pct_start, final ~ initial/1e4
    np.testing.assert_allclose(float(s(0)), 2e-3 / 25, rtol=1e-3)
    np.testing.assert_allclose(float(s(100)), 2e-3, rtol=1e-3)
    assert float(s(999)) < 1e-6


def test_optimizer_applies_group_weight_decay():
    params = {
        "backbone": {"conv": {"kernel": jnp.ones((4, 4))}, "bn": {"scale": jnp.ones((4,))}},
        "decoder": {"norm1": {"bias": jnp.ones((4,))}, "head": {"kernel": jnp.ones((4, 4))}},
    }
    labels = label_tree(params)
    assert labels["backbone"]["conv"]["kernel"] == "backbone"
    assert labels["backbone"]["bn"]["scale"] == "backbone_norm"
    assert labels["decoder"]["norm1"]["bias"] == "encdec_norm_bias"
    assert labels["decoder"]["head"]["kernel"] == "rest"
    tx = build_optimizer(params, OptimConfig(steps_per_epoch=10, epochs=1))
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # zero grads: only weight-decay groups move
    assert float(jnp.abs(updates["backbone"]["conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["backbone"]["bn"]["scale"]).sum()) == 0
    assert float(jnp.abs(updates["decoder"]["norm1"]["bias"]).sum()) == 0
    assert float(jnp.abs(updates["decoder"]["head"]["kernel"]).sum()) > 0


def test_ema_warmup_schedule():
    # reference train.py:59: m * (1 - exp(-i/2000))
    np.testing.assert_allclose(float(ema_momentum(jnp.asarray(0), 0.9998)), 0.0)
    np.testing.assert_allclose(
        float(ema_momentum(jnp.asarray(2000), 0.9998)), 0.9998 * (1 - np.exp(-1)), rtol=1e-5
    )
    ema = {"w": jnp.zeros((3,))}
    new = {"w": jnp.ones((3,))}
    out = ema_update(ema, new, jnp.asarray(1))  # m ~ 0 -> ema ~ student
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0, atol=1e-3)


def test_flat_adamw_matches_optax_chain():
    """The flattened optimizer (TPU-shaped, default) must be bit-equivalent
    to the stock clip+multi_transform AdamW chain."""
    import optax

    rng = np.random.default_rng(3)
    params = {
        "backbone": {"conv": {"kernel": jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))},
                     "bn": {"scale": jnp.asarray(rng.normal(size=(6,)).astype(np.float32))}},
        "decoder": {"norm1": {"bias": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))},
                    "head": {"kernel": jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))}},
    }
    cfg = OptimConfig(steps_per_epoch=10, epochs=5, per_group_max_lr=True)
    tx_ref = build_optimizer(params, cfg, flat=False)
    tx_new = build_optimizer(params, cfg, flat=True)
    s_ref, s_new = tx_ref.init(params), tx_new.init(params)
    p_ref = p_new = params
    for _ in range(6):
        grads = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), params
        )
        u, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        u, s_new = tx_new.update(grads, s_new, p_new)
        p_new = optax.apply_updates(p_new, u)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flat_adamw_respects_update_mask():
    params = {"backbone": {"bn": {"scale": jnp.ones((4,))}},
              "decoder": {"head": {"kernel": jnp.ones((4, 4))}}}
    mask = {"backbone": {"bn": {"scale": False}}, "decoder": {"head": {"kernel": True}}}
    tx = build_optimizer(params, OptimConfig(steps_per_epoch=10, epochs=1), update_mask=mask)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["bn"]["scale"]).sum()) == 0  # frozen: no wd either
    assert float(jnp.abs(updates["decoder"]["head"]["kernel"]).sum()) > 0


def test_ema_flat_matches_tree():
    from dfine_tpu.train.optim import ema_update, ema_update_flat

    rng = np.random.default_rng(4)
    ema = {"a": jnp.asarray(rng.normal(size=(7,)).astype(np.float32)),
           "b": {"c": jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))}}
    new = jax.tree.map(lambda x: x + 1.0, ema)
    it = jnp.asarray(500)
    r1 = ema_update(ema, new, it)
    r2 = ema_update_flat(ema, new, it)
    for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_freeze_mask():
    params = {
        "backbone": {"stem": {"conv": {"kernel": jnp.ones((2,))}},
                     "stages_0": {"bn": {"scale": jnp.ones((2,))}}},
        "decoder": {"head": {"kernel": jnp.ones((2,))}},
    }
    m = freeze_mask(params, freeze_backbone_norm=True, freeze_stem=True)
    assert m["backbone"]["stem"]["conv"]["kernel"] is False
    assert m["backbone"]["stages_0"]["bn"]["scale"] is False
    assert m["decoder"]["head"]["kernel"] is True


def test_ema_updates_once_per_optimizer_step_under_accumulation():
    """With b_accum_steps=2 (optax.MultiSteps) the EMA must change only on
    micro-steps that complete an optimizer step, with its warmup momentum
    driven by the OPTIMIZER-step count — matching the reference, which calls
    ModelEMA.update inside optimizer_step only (train.py:488-511)."""
    import flax.linen as nn

    from dfine_tpu.train.criterion import CriterionConfig
    from dfine_tpu.train.optim import OptimConfig, build_optimizer
    from dfine_tpu.train.train_step import TrainState, make_train_step

    Q, C = 6, 3

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, targets=None, train=False):
            h = nn.Dense(8)(x)
            h = nn.BatchNorm(use_running_average=not train)(h)
            logits = nn.Dense(Q * C)(h).reshape(-1, Q, C)
            boxes = nn.sigmoid(nn.Dense(Q * 4)(h).reshape(-1, Q, 4))
            out = {"pred_logits": logits, "pred_boxes": boxes}
            out["pre_outputs"] = {"pred_logits": logits, "pred_boxes": boxes}
            return out

    model = Tiny()
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 5)).astype(np.float32))
    targets = {
        "labels": jnp.zeros((2, 3), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]], jnp.float32), (2, 3, 1)),
        "valid": jnp.asarray([[True, True, False], [True, False, False]]),
    }
    variables = model.init({"params": jax.random.key(0)}, x, train=True)
    tx = build_optimizer(
        variables["params"],
        OptimConfig(steps_per_epoch=8, epochs=1, b_accum_steps=2),
    )
    state = TrainState.create(variables, tx, use_ema=True)
    step = jax.jit(
        make_train_step(
            model, tx, CriterionConfig(num_classes=C, losses=("vfl", "boxes")),
            b_accum_steps=2,
        )
    )
    batch = {"images": x, "targets": targets}

    def ema_vec(s):
        return np.concatenate([np.ravel(l) for l in jax.tree.leaves(s.ema_params)])

    def p_vec(s):
        return np.concatenate([np.ravel(l) for l in jax.tree.leaves(s.params)])

    s0 = state
    s1, _ = step(s0, batch, jax.random.key(1))  # micro 1: accumulate only
    assert np.allclose(p_vec(s1), p_vec(state)), "MultiSteps must not step yet"
    s2, _ = step(s1, batch, jax.random.key(2))  # micro 2: optimizer step 1
    assert not np.allclose(p_vec(s2), p_vec(s1))
    e2 = ema_vec(s2)
    s3, _ = step(s2, batch, jax.random.key(3))  # micro 3: accumulate only
    np.testing.assert_array_equal(ema_vec(s3), e2)  # EMA frozen mid-accumulation
    s4, _ = step(s3, batch, jax.random.key(4))  # micro 4: optimizer step 2
    assert not np.allclose(ema_vec(s4), e2)
