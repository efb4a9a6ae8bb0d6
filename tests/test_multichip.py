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
def test_dp_matches_single_device_loss():
    """The psum'ed data-parallel loss must equal the single-program loss on
    the same global batch (DDP-equivalence of the SPMD step)."""
    from dfine_tpu.models import build_model
    from dfine_tpu.parallel import make_dp_train_step, make_mesh, replicate, shard_batch
    from dfine_tpu.train.criterion import CriterionConfig
    from dfine_tpu.train.optim import OptimConfig, build_optimizer
    from dfine_tpu.train.train_step import TrainState, make_train_step

    model = build_model("n", num_classes=3, enable_mask_head=False)
    b, img, g = 4, 320, 4
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(b, img, img, 3)).astype(np.float32))
    targets = {
        "labels": jnp.zeros((b, g), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]], jnp.float32), (b, g, 1)),
        "valid": jnp.asarray(np.tile(np.arange(g)[None] < 2, (b, 1))),
    }
    variables = model.init(
        {"params": jax.random.key(0), "dn": jax.random.key(1)},
        images[:1], jax.tree.map(lambda x: x[:1], targets), train=True,
    )
    tx = build_optimizer(variables["params"], OptimConfig(steps_per_epoch=2, epochs=1))

    # single-device step over the full batch
    step1 = jax.jit(make_train_step(model, tx, CriterionConfig(num_classes=3)))
    s1 = TrainState.create(variables, tx, use_ema=False)
    # make the DN noise identical across paths: disable it via num_denoising=0?
    # CDN rng differs per replica by construction; compare with a fixed key on
    # a 1-device mesh vs plain jit instead.
    mesh1 = make_mesh(1)
    step_dp = make_train_step(model, tx, CriterionConfig(num_classes=3), axis_name="dp")
    dp = make_dp_train_step(step_dp, mesh1)
    s2 = replicate(TrainState.create(variables, tx, use_ema=False), mesh1)
    batch = {"images": images, "targets": targets}
    _, m1 = step1(s1, batch, jax.random.fold_in(jax.random.key(5), 0))
    _, m2 = dp(s2, shard_batch(batch, mesh1), jax.random.key(5))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
