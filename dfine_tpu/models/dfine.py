"""DFINE model assembly: backbone -> encoder -> decoder.

Mirror of reference src/d_fine/dfine.py:19-70 as one flax module + a builder.
Input contract: NHWC images — either float in [0, 1] or raw uint8 (the
module normalizes integer inputs to [0, 1] in-graph, so hosts can ship
uint8 frames: 4x less H2D traffic and no per-batch fp32 conversion on the
CPU).  Output dict matches the reference I/O contract (SURVEY.md L1):
``pred_logits [B,Q,C]``, ``pred_boxes [B,Q,4]`` cxcywh normalized,
optional ``pred_masks``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..configs import model_config
from .decoder import DFINETransformer
from .hgnetv2 import HGNetv2
from .hybrid_encoder import HybridEncoder


class DFINE(nn.Module):
    size: str = "m"
    num_classes: int = 80
    enable_mask_head: bool = False
    dtype: jnp.dtype = jnp.float32
    # ("section.key", value) pairs patched over model_config(size) — hashable
    # so the module stays a valid static jit argument.  e.g.
    # (("decoder.num_denoising", 0), ("decoder.layer_scale", 2))
    cfg_overrides: tuple = ()

    @nn.compact
    def __call__(self, x, targets: Optional[Dict[str, Any]] = None, train: bool = False):
        if jnp.issubdtype(x.dtype, jnp.integer):  # uint8 host frames
            x = x.astype(jnp.float32) / 255.0
        cfg = model_config(self.size)
        cfg = {k: dict(v) for k, v in cfg.items()}  # shallow-copy sections
        for path, value in self.cfg_overrides:
            section, key = path.split(".")
            cfg[section][key] = value
        bcfg, ecfg, dcfg = cfg["backbone"], cfg["encoder"], cfg["decoder"]
        feats = HGNetv2(
            name_=bcfg["name"],
            use_lab=bcfg["use_lab"],
            return_idx=tuple(bcfg["return_idx"]),
            dtype=self.dtype,
            name="backbone",
        )(x, train)
        outs, inner_outs = HybridEncoder(
            in_channels=tuple(ecfg["in_channels"]),
            feat_strides=tuple(ecfg["feat_strides"]),
            hidden_dim=ecfg["hidden_dim"],
            nhead=ecfg["nhead"],
            dim_feedforward=ecfg["dim_feedforward"],
            enc_act=ecfg["enc_act"],
            use_encoder_idx=tuple(ecfg["use_encoder_idx"]),
            num_encoder_layers=ecfg["num_encoder_layers"],
            expansion=ecfg["expansion"],
            depth_mult=ecfg["depth_mult"],
            act=ecfg["act"],
            dtype=self.dtype,
            name="encoder",
        )(feats, train)
        return DFINETransformer(
            num_classes=self.num_classes,
            hidden_dim=dcfg["hidden_dim"],
            num_queries=dcfg["num_queries"],
            feat_channels=tuple(dcfg["feat_channels"]),
            feat_strides=tuple(dcfg["feat_strides"]),
            num_levels=dcfg["num_levels"],
            num_points=tuple(dcfg["num_points"]),
            num_layers=dcfg["num_layers"],
            dim_feedforward=dcfg["dim_feedforward"],
            num_denoising=dcfg["num_denoising"],
            label_noise_ratio=dcfg["label_noise_ratio"],
            box_noise_scale=dcfg["box_noise_scale"],
            eval_idx=dcfg["eval_idx"],
            layer_scale=dcfg.get("layer_scale", 1),
            query_select_method=dcfg["query_select_method"],
            reg_max=dcfg["reg_max"],
            reg_scale=dcfg["reg_scale"],
            enable_mask_head=self.enable_mask_head,
            mask_dim=dcfg["mask_dim"],
            dtype=self.dtype,
            name="decoder",
        )((outs, inner_outs), targets, train)


def build_model(
    model_name: str,
    num_classes: int,
    enable_mask_head: bool = False,
    dtype: jnp.dtype = jnp.float32,
    cfg_overrides: tuple = (),
) -> DFINE:
    """Factory mirroring reference dfine.py:51-70 (weight loading is handled
    separately by dfine_tpu.utils.checkpoint / torch_import).

    cfg_overrides: (("section.key", value), ...) patches over the size
    config, e.g. (("decoder.num_denoising", 0),)."""
    return DFINE(
        size=model_name,
        num_classes=num_classes,
        enable_mask_head=enable_mask_head,
        dtype=dtype,
        cfg_overrides=tuple(cfg_overrides),
    )
