"""Optimizer / LR schedule / EMA — optax re-design of the reference setup.

Reference semantics being mirrored:
* 4 param groups (src/d_fine/dfine.py:87-124): backbone (backbone_lr),
  backbone norm (backbone_lr, wd=0), encoder/decoder norm+bias (base_lr,
  wd=0), rest (base_lr).
* OneCycleLR with cosine anneal, ``max_lr = 2*base_lr`` for n/s/m and
  per-group ``2*backbone_lr`` for l/x backbone groups (src/dl/train.py:193-208).
  torch defaults div_factor=25, final_div_factor=1e4 map 1:1 onto
  ``optax.cosine_onecycle_schedule``.
* global-norm grad clip 0.1 before the step (src/dl/train.py:488-503).
* EMA with warmup momentum ``m*(1-exp(-it/2000))`` over params AND
  batch stats (src/dl/train.py:51-72 state_dict covers buffers).

On TPU there is no GradScaler: compute runs in bf16, loss/params in fp32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


@dataclass(frozen=True)
class OptimConfig:
    base_lr: float = 2.5e-4
    backbone_lr: float = 1.25e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 1.25e-4
    clip_max_norm: float = 0.1
    epochs: int = 100
    steps_per_epoch: int = 100
    pct_start: float = 0.1
    per_group_max_lr: bool = False  # True for model sizes l/x
    b_accum_steps: int = 1


def param_group_label(path: Tuple[str, ...]) -> str:
    """Classify a flattened param path into the reference's 4 groups."""
    joined = "/".join(str(p) for p in path).lower()
    is_norm = any(t in joined for t in ("bn", "norm", "batchnorm", "layernorm"))
    if joined.startswith("backbone"):
        return "backbone_norm" if is_norm else "backbone"
    if joined.startswith(("encoder", "decoder")) and (is_norm or path[-1] == "bias"):
        return "encdec_norm_bias"
    return "rest"


def label_tree(params: Any) -> Any:
    flat = traverse_util.flatten_dict(params)
    labels = {k: param_group_label(k) for k in flat}
    return traverse_util.unflatten_dict(labels)


def onecycle(peak: float, cfg: OptimConfig) -> optax.Schedule:
    total = max(2, cfg.epochs * max(1, cfg.steps_per_epoch) // max(1, cfg.b_accum_steps))
    # optax's piecewise interpolation divides by the warmup interval length;
    # total*pct_start < 1 collapses it to zero and the whole schedule goes
    # NaN (bites any short run).  Guarantee >= 1 warmup step.
    pct = min(max(cfg.pct_start, 1.0 / total), 1.0 - 1.0 / total)
    return optax.cosine_onecycle_schedule(
        transition_steps=total,
        peak_value=peak,
        pct_start=pct,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def build_optimizer(
    params: Any,
    cfg: OptimConfig,
    update_mask: Any = None,
    flat: bool = False,
) -> optax.GradientTransformation:
    """Two implementations, bit-identical updates (tests/test_optim.py):

    * stock optax chain (default): clip + multi_transform AdamW. Costs
      56 ms/step for D-FINE-m on TPU (~10k tile-padded tiny leaf ops) but
      is donation-safe.
    * flat=True (train/flat_optim.py): one fused-vector implementation,
      22 ms/step — but the axon TPU runtime rejects it when the train step
      donates its state (reproducible INVALID_ARGUMENT; see NOTES.md), and
      donation saves more than flattening does. Default OFF until the
      runtime issue is resolved; use on standard Cloud TPU runtimes.
    """
    if flat:
        from .flat_optim import flat_adamw

        tx = flat_adamw(params, cfg, update_mask)
        if cfg.b_accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.b_accum_steps)
        return tx

    if cfg.per_group_max_lr:  # l/x: backbone groups cycle around backbone_lr
        sched_backbone = onecycle(2 * cfg.backbone_lr, cfg)
    else:  # n/s/m: scalar max_lr overrides every group (torch OneCycleLR)
        sched_backbone = onecycle(2 * cfg.base_lr, cfg)
    sched_base = onecycle(2 * cfg.base_lr, cfg)

    def adamw(sched, wd):
        return optax.adamw(sched, b1=cfg.betas[0], b2=cfg.betas[1], weight_decay=wd)

    parts = [
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.multi_transform(
            {
                "backbone": adamw(sched_backbone, cfg.weight_decay),
                "backbone_norm": adamw(sched_backbone, 0.0),
                "encdec_norm_bias": adamw(sched_base, 0.0),
                "rest": adamw(sched_base, cfg.weight_decay),
            },
            label_tree(params),
        ),
    ]
    if update_mask is not None:
        # zero UPDATES for frozen params (not just grads) so weight decay
        # cannot leak into them — the FrozenBN/freeze_at contract
        parts.append(
            optax.stateless(
                lambda updates, params=None: jax.tree.map(
                    lambda u, m: u * jnp.asarray(m, u.dtype), updates, update_mask
                )
            )
        )
    tx = optax.chain(*parts)
    if cfg.b_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.b_accum_steps)
    return tx


def freeze_mask(params: Any, freeze_backbone_norm: bool = False, freeze_stem: bool = False) -> Any:
    """Zero-update mask for FrozenBatchNorm / freeze_at semantics
    (reference hgnetv2.py:481-488): instead of separate frozen modules, the
    optimizer masks updates — the module graph stays static for XLA."""
    flat = traverse_util.flatten_dict(params)

    def frozen(k) -> bool:
        j = "/".join(str(p) for p in k).lower()
        if freeze_backbone_norm and j.startswith("backbone") and ("bn" in j or "norm" in j):
            return True
        if freeze_stem and j.startswith("backbone/stem"):
            return True
        return False

    return traverse_util.unflatten_dict({k: not frozen(k) for k in flat})


def ema_momentum(iteration: jnp.ndarray, base: float = 0.9999) -> jnp.ndarray:
    """Warmup-scheduled EMA momentum (reference src/dl/train.py:59)."""
    return base * (1.0 - jnp.exp(-iteration.astype(jnp.float32) / 2000.0))


def ema_update(ema_tree: Any, new_tree: Any, iteration: jnp.ndarray, base: float = 0.9999) -> Any:
    m = ema_momentum(iteration, base)
    return jax.tree.map(
        lambda e, p: (e * m + (1.0 - m) * p).astype(e.dtype)
        if jnp.issubdtype(e.dtype, jnp.floating)
        else p,
        ema_tree,
        new_tree,
    )


def ema_update_flat(ema_tree: Any, new_tree: Any, iteration: jnp.ndarray,
                    base: float = 0.9999) -> Any:
    """EMA as ONE fused vector lerp (ravel -> lerp -> unravel) instead of a
    per-leaf tree_map — ~900 tiny tile-padded ops become one (see the
    optimizer-tail measurements in NOTES.md)."""
    from jax.flatten_util import ravel_pytree

    e, unravel = ravel_pytree(ema_tree)
    p, _ = ravel_pytree(new_tree)
    m = ema_momentum(iteration, base)
    return unravel(e * m + (1.0 - m) * p.astype(e.dtype))


def count_params(params: Any) -> int:
    return sum(int(math.prod(x.shape)) for x in jax.tree.leaves(params))
