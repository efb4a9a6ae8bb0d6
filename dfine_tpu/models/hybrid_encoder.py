"""HybridEncoder (RT-DETR-style neck with AIFI) in flax, NHWC.

Capability mirror of reference src/d_fine/arch/hybrid_encoder.py:311-487:
1x1 input projections, single-layer transformer (AIFI) over the stride-32
map with 2D sincos position embedding, top-down FPN + bottom-up PAN with
CSP-ELAN blocks.  Returns ``(outs, inner_outs)`` — the FPN intermediates
feed the segmentation pixel decoder.

TPU notes: position embeddings are numpy compile-time constants (no
train/eval precompute split needed — shapes are static under jit); nearest
upsample is an exact ``jnp.repeat``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .layers import (ConvBNA, MultiHeadSelfAttention, RepNCSPELAN4, SCDown,
                     get_activation, torch_bias_init, torch_kernel_init)


def sincos_pos_embed_2d(w: int, h: int, embed_dim: int, temperature: float = 10000.0) -> np.ndarray:
    """2D sincos embedding, [1, w*h, C].

    Replicates the reference's construction verbatim, including its w-major
    flatten quirk (hybrid_encoder.py:425-441: meshgrid(indexing='ij') over
    (w, h) then flatten) — required for checkpoint parity.
    """
    assert embed_dim % 4 == 0
    grid_w, grid_h = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij"
    )
    pos_dim = embed_dim // 4
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None].astype(np.float32)


class AIFILayer(nn.Module):
    """Post-norm transformer encoder layer (reference hybrid_encoder.py:243-290)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos_embed):
        q = src + pos_embed.astype(src.dtype)
        attn = MultiHeadSelfAttention(self.d_model, self.nhead, dtype=self.dtype, name="self_attn")(
            q, q, src
        )
        src = src + attn
        src = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(src).astype(self.dtype)
        # torch Linear defaults: the reference encoder layer has no explicit
        # init (hybrid_encoder.py defines no _reset_parameters for the FFN)
        ff = nn.Dense(
            self.dim_feedforward, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(src.shape[-1]), dtype=self.dtype, name="linear1",
        )(src)
        ff = get_activation(self.act)(ff)
        ff = nn.Dense(
            self.d_model, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(ff.shape[-1]), dtype=self.dtype, name="linear2",
        )(ff)
        src = src + ff
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(src).astype(self.dtype)


class HybridEncoder(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    feat_strides: Sequence[int] = (8, 16, 32)
    hidden_dim: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    enc_act: str = "gelu"
    use_encoder_idx: Sequence[int] = (2,)
    num_encoder_layers: int = 1
    pe_temperature: float = 10000.0
    expansion: float = 1.0
    depth_mult: float = 1.0
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        assert len(feats) == len(self.in_channels)
        nlev = len(self.in_channels)
        hd = self.hidden_dim
        c4 = round(self.expansion * hd // 2)
        n_csp = round(3 * self.depth_mult)

        proj = []
        for i, f in enumerate(feats):
            proj.append(
                ConvBNA(hd, 1, 1, act=None, dtype=self.dtype, name=f"input_proj_{i}")(f, train)
            )

        # AIFI self-attention over selected levels
        for ei, enc_idx in enumerate(self.use_encoder_idx):
            b, h, w, _ = proj[enc_idx].shape
            src = proj[enc_idx].reshape(b, h * w, hd)
            pos = jnp.asarray(sincos_pos_embed_2d(w, h, hd, self.pe_temperature))
            for li in range(self.num_encoder_layers):
                src = AIFILayer(
                    hd,
                    self.nhead,
                    self.dim_feedforward,
                    self.enc_act,
                    dtype=self.dtype,
                    name=f"encoder_{ei}_layers_{li}",
                )(src, pos)
            proj[enc_idx] = src.reshape(b, h, w, hd)

        # top-down FPN (reference hybrid_encoder.py:465-476)
        inner_outs = [proj[-1]]
        for idx in range(nlev - 1, 0, -1):
            k = nlev - 1 - idx
            feat_high = ConvBNA(hd, 1, 1, dtype=self.dtype, name=f"lateral_convs_{k}")(
                inner_outs[0], train
            )
            inner_outs[0] = feat_high
            up = jnp.repeat(jnp.repeat(feat_high, 2, axis=1), 2, axis=2)
            fused = RepNCSPELAN4(
                hd, 2 * hd, c4, n_csp, self.act, dtype=self.dtype, name=f"fpn_blocks_{k}"
            )(jnp.concatenate([up, proj[idx - 1]], axis=-1), train)
            inner_outs.insert(0, fused)

        # bottom-up PAN (reference hybrid_encoder.py:478-484)
        outs = [inner_outs[0]]
        for idx in range(nlev - 1):
            down = SCDown(hd, 3, 2, dtype=self.dtype, name=f"downsample_convs_{idx}")(
                outs[-1], train
            )
            out = RepNCSPELAN4(
                hd, 2 * hd, c4, n_csp, self.act, dtype=self.dtype, name=f"pan_blocks_{idx}"
            )(jnp.concatenate([down, inner_outs[idx + 1]], axis=-1), train)
            outs.append(out)

        return outs, inner_outs
