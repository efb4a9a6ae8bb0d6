"""Functional training step: (state, batch, rng) -> (state, metrics).

The reference's imperative loop (src/dl/train.py:481-634: autocast forward,
GradScaler, clip, step, EMA update) becomes one pure jitted function.  Mixed
precision is bf16 compute with fp32 params/loss — no loss scaling needed on
TPU.  Data parallelism: run this step under ``shard_map`` over a 1-axis mesh
with ``axis_name='dp'``; gradients and loss normalizers are psum'ed inside
(see dfine_tpu/parallel/dp.py), replacing DDP's bucket all-reduce.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .criterion import CriterionConfig, criterion_forward
# NOTE: the flat EMA variant ravels donated state buffers, which the axon
# TPU runtime rejects — the tree form is donation-safe (NOTES.md)
from .optim import ema_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation, use_ema=True):
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=bs,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
            ema_batch_stats=jax.tree.map(jnp.copy, bs) if use_ema else None,
        )

    def eval_variables(self, use_ema: bool = True) -> Dict[str, Any]:
        if use_ema and self.ema_params is not None:
            return {"params": self.ema_params, "batch_stats": self.ema_batch_stats}
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    crit_cfg: CriterionConfig,
    axis_name: Optional[str] = None,
    ema_base: float = 0.9999,
    update_mask: Any = None,
    b_accum_steps: int = 1,
):
    """Builds the pure step function.

    model: flax module with __call__(x, targets, train).  ``update_mask``
    (pytree of bool) implements freeze_at / freeze_norm by zeroing updates.
    With ``b_accum_steps > 1`` (tx wrapped in optax.MultiSteps) the EMA
    updates once per completed OPTIMIZER step with the optimizer-step count
    driving its warmup momentum — matching the reference, which calls
    ModelEMA.update only inside optimizer_step (train.py:488-511), not per
    micro-batch.
    """

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            batch["targets"],
            train=True,
            rngs={"dn": rng},
            mutable=["batch_stats"],
        )
        losses = criterion_forward(out, batch["targets"], crit_cfg, axis_name=axis_name)
        return losses["total"], (losses, mutated["batch_stats"])

    def step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        (total, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)  # SyncBN-style stat sharing
        if update_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, update_mask
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        it = state.step + 1
        ema_p, ema_b = state.ema_params, state.ema_batch_stats
        if ema_p is not None:
            if b_accum_steps > 1:
                # MultiSteps applied a real update iff mini_step wrapped to 0;
                # momentum warmup follows the optimizer-step count.
                did_step = (opt_state.mini_step == 0).astype(jnp.float32)
                opt_it = opt_state.gradient_step
                cand_p = ema_update(ema_p, params, opt_it, ema_base)
                cand_b = ema_update(ema_b, new_bs, opt_it, ema_base)
                blend = lambda old, new: jax.tree.map(
                    lambda o, n: o + did_step.astype(o.dtype) * (n - o)
                    if jnp.issubdtype(o.dtype, jnp.floating)
                    else jnp.where(did_step > 0, n, o),
                    old, new,
                )
                ema_p = blend(ema_p, cand_p)
                ema_b = blend(ema_b, cand_b)
            else:
                ema_p = ema_update(ema_p, params, it, ema_base)
                ema_b = ema_update(ema_b, new_bs, it, ema_base)
        new_state = state.replace(
            step=it,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            ema_params=ema_p,
            ema_batch_stats=ema_b,
        )
        metrics = {"loss": total, "grad_norm": optax.global_norm(grads)}
        metrics.update({k: v for k, v in losses.items() if "_" not in k or k in (
            "loss_vfl", "loss_bbox", "loss_giou", "loss_fgl", "loss_ddf",
            "loss_mask_bce", "loss_mask_dice")})
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics

    return step


def make_eval_step(model, use_ema: bool = True):
    def step(state: TrainState, images: jnp.ndarray):
        return model.apply(state.eval_variables(use_ema), images, train=False)

    return step
