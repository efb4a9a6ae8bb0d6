"""Flattened multi-group AdamW — the optimizer tail, TPU-shaped.

Measured (NOTES.md): stock optax (clip + multi_transform AdamW) + EMA costs
56 ms/step for D-FINE-m — not because of FLOPs (19M params ~ 1 ms of HBM
traffic) but because ~900 tiny leaves x ~12 elementwise ops each become
~10k individually tile-padded TPU ops.

This transform ravels gradients/params into ONE fused vector (a single
concatenate HLO), runs clip -> Adam -> per-element lr/weight-decay as ~10
big vector ops, and unravels the update.  Per-group behavior (reference
dfine.py:87-124: backbone lr, norm/bias wd=0, per-group OneCycle peaks) is
encoded as precomputed [P] selector/mask vectors, so group logic costs one
gather instead of a tree of transforms.  Freeze masks fold in the same way.

Drop-in: returns an optax.GradientTransformation, same TrainState/step API.

STATUS: measured 22 ms vs 56 ms for the stock chain on TPU v5e, updates
bit-identical — but the axon TPU runtime reproducibly fails
(INVALID_ARGUMENT at the first step) when the surrounding train step uses
donate_argnums, with either params-ravel or the p_flat-mirror design, while
the stock chain donates fine.  Since donation is worth more than
flattening, build_optimizer defaults to the stock chain; enable
``flat=True`` on runtimes without this restriction.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax.flatten_util import ravel_pytree

from .optim import OptimConfig, onecycle, param_group_label

_GROUPS = ("backbone", "backbone_norm", "encdec_norm_bias", "rest")


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray
    # flat mirror of the params, updated in lockstep: weight decay reads
    # THIS instead of raveling the (possibly donated) param tree — raveling
    # donated buffers crashes the axon TPU runtime (NOTES.md)
    p_flat: jnp.ndarray


def _flat_group_vectors(params: Any, cfg: OptimConfig, update_mask: Optional[Any]):
    """Precompute per-element group-id / weight-decay / trainable vectors."""
    flat = traverse_util.flatten_dict(params)
    gid_tree = traverse_util.unflatten_dict(
        {k: np.full(np.shape(v), _GROUPS.index(param_group_label(k)), np.int8)
         for k, v in flat.items()}
    )
    gid, _ = ravel_pytree(gid_tree)
    wd_by_group = np.asarray(
        [cfg.weight_decay, 0.0, 0.0, cfg.weight_decay], np.float32
    )
    wd_vec = jnp.asarray(wd_by_group)[gid.astype(jnp.int32)]
    if update_mask is not None:
        mask_tree = jax.tree.map(
            lambda v, m: np.full(np.shape(v), bool(m)), params, update_mask
        )
        trainable, _ = ravel_pytree(mask_tree)
        trainable = trainable.astype(jnp.float32)
    else:
        trainable = jnp.ones_like(wd_vec)
    return gid.astype(jnp.int32), wd_vec, trainable


def flat_adamw(
    params: Any,
    cfg: OptimConfig,
    update_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    p0, unravel = ravel_pytree(params)
    n = p0.shape[0]
    gid, wd_vec, trainable = _flat_group_vectors(params, cfg, update_mask)

    if cfg.per_group_max_lr:  # l/x
        sched_bb = onecycle(2 * cfg.backbone_lr, cfg)
    else:
        sched_bb = onecycle(2 * cfg.base_lr, cfg)
    sched_base = onecycle(2 * cfg.base_lr, cfg)
    b1, b2 = cfg.betas
    eps = 1e-8

    def init(params):
        z = jnp.zeros((n,), jnp.float32)
        pf, _ = ravel_pytree(params)
        return FlatAdamWState(jnp.zeros((), jnp.int32), z, z, pf.astype(jnp.float32))

    def update(grads, state, params=None):
        g, _ = ravel_pytree(grads)  # grads are fresh outputs, never donated
        g = g.astype(jnp.float32)
        # global-norm clip (reference train.py:488-503)
        gn = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, cfg.clip_max_norm / jnp.maximum(gn, 1e-12))

        count = state.count + 1
        m = b1 * state.m + (1 - b1) * g
        v = b2 * state.v + (1 - b2) * g * g
        c = count.astype(jnp.float32)
        mhat = m / (1 - b1**c)
        vhat = v / (1 - b2**c)

        step_i = (count - 1).astype(jnp.float32)
        lrs = jnp.stack([
            sched_bb(step_i), sched_bb(step_i), sched_base(step_i), sched_base(step_i)
        ])
        lr_vec = lrs[gid]

        upd = -lr_vec * (mhat / (jnp.sqrt(vhat) + eps) + wd_vec * state.p_flat)
        upd = upd * trainable
        return unravel(upd), FlatAdamWState(count, m, v, state.p_flat + upd)

    return optax.GradientTransformation(init, update)
