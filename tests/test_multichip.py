"""Data-parallel SPMD tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_and_shard_batch():
    from dfine_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh(8)
    batch = {"images": jnp.zeros((8, 16, 16, 3)), "targets": {"labels": jnp.zeros((8, 4))}}
    sharded = shard_batch(batch, mesh)
    assert sharded["images"].sharding.is_fully_replicated is False
    state = replicate({"w": jnp.ones((4,))}, mesh)
    assert state["w"].sharding.is_fully_replicated


@pytest.mark.slow
def test_dryrun_multichip_full_train_step():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dp8_matches_single_program_loss_and_grads():
    """True DDP-equivalence: an 8-device shard_map step must produce the SAME
    loss, gradient norm, and updated parameters as one single-program step
    over the identical global batch (reference dfine_criterion.py:440-453 +
    train.py:161-169 semantics).

    Controlled sources of divergence, eliminated:
    * CDN noise draws differ per replica -> num_denoising=0;
    * BN forward stats are per-replica by default -> SyncBN (bn axis 'dp'),
      which the trainer enables exactly when per-replica bs < 4 — here it is
      1 — matching the reference's conditional SyncBatchNorm;
    * DDF's pos/neg weighting is intentionally per-replica-batch-scaled
      (8/per_gpu_bs, reference :224-230) in BOTH frameworks, so 'local' is
      excluded from the exact-equality check.

    A wrong psum (the failure mode the old 1-device test could not catch)
    shifts loss, grads, and params — all asserted here at fp32 tolerance.
    """
    from dfine_tpu.models import build_model
    from dfine_tpu.models.layers import set_bn_axis
    from dfine_tpu.parallel import make_dp_train_step, make_mesh, replicate, shard_batch
    from dfine_tpu.train.criterion import CriterionConfig
    from dfine_tpu.train.optim import OptimConfig, build_optimizer
    from dfine_tpu.train.train_step import TrainState, make_train_step

    model = build_model(
        "n", num_classes=3, enable_mask_head=False,
        cfg_overrides=(("decoder.num_denoising", 0),),
    )
    b, img, g = 8, 320, 4
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(b, img, img, 3)).astype(np.float32))
    boxes = np.tile(np.asarray([[[0.45, 0.55, 0.2, 0.2]]], np.float32), (b, g, 1))
    boxes[:, 1] = [0.7, 0.3, 0.15, 0.25]
    targets = {
        "labels": jnp.asarray(rng.integers(0, 3, size=(b, g)), jnp.int32),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(np.tile(np.arange(g)[None] < 2, (b, 1))),
    }
    set_bn_axis(None)
    variables = model.init(
        {"params": jax.random.key(0), "dn": jax.random.key(1)},
        images[:1], jax.tree.map(lambda x: x[:1], targets), train=True,
    )
    tx = build_optimizer(variables["params"], OptimConfig(steps_per_epoch=2, epochs=1))
    crit = CriterionConfig(num_classes=3, losses=("vfl", "boxes"))
    batch = {"images": images, "targets": targets}

    # single-program step over the full global batch (BN stats = global batch)
    step1 = jax.jit(make_train_step(model, tx, crit))
    s1 = TrainState.create(variables, tx, use_ema=False)
    ns1, m1 = step1(s1, batch, jax.random.key(5))
    ns1_params = jax.tree.map(np.asarray, ns1.params)

    # 8-way shard_map step with SyncBN
    set_bn_axis("dp")
    try:
        mesh = make_mesh(8)
        step_dp = make_train_step(model, tx, crit, axis_name="dp")
        dp = make_dp_train_step(step_dp, mesh)
        s2 = replicate(TrainState.create(variables, tx, use_ema=False), mesh)
        ns2, m2 = dp(s2, shard_batch(batch, mesh), jax.random.key(5))
    finally:
        set_bn_axis(None)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4, atol=1e-6
    )
    flat1 = jax.tree_util.tree_leaves(ns1_params)
    flat2 = jax.tree_util.tree_leaves(jax.tree.map(np.asarray, ns2.params))
    for a, c in zip(flat1, flat2):
        np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-5)
