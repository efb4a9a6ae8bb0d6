"""HGNetv2 (PP-HGNetV2) backbone in flax, NHWC.

Capability mirror of the reference backbone (reference:
src/d_fine/arch/hgnetv2.py), re-designed for TPU: NHWC convs, fp32 BN with
bf16 compute, and freeze semantics expressed as optimizer masks instead of
module surgery (``freeze_at``/``freeze_norm`` are consumed by
``dfine_tpu/train/optim.py``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import (ConvBN, LearnableAffine, get_activation,
                     max_pool_2x2_s1, pad_rb, torch_bias_init, torch_kernel_init)

# arch table: stem_channels, per-stage (mid, out, num_blocks, downsample,
# light_block, kernel, layer_num).  Values match the reference registry
# (hgnetv2.py:344-422) — they define the published B0..B6 architectures.
ARCH_CONFIGS = {
    "B0": {
        "stem": (16, 16),
        "stages": [
            (16, 64, 1, False, False, 3, 3),
            (32, 256, 1, True, False, 3, 3),
            (64, 512, 2, True, True, 5, 3),
            (128, 1024, 1, True, True, 5, 3),
        ],
    },
    "B1": {
        "stem": (24, 32),
        "stages": [
            (32, 64, 1, False, False, 3, 3),
            (48, 256, 1, True, False, 3, 3),
            (96, 512, 2, True, True, 5, 3),
            (192, 1024, 1, True, True, 5, 3),
        ],
    },
    "B2": {
        "stem": (24, 32),
        "stages": [
            (32, 96, 1, False, False, 3, 4),
            (64, 384, 1, True, False, 3, 4),
            (128, 768, 3, True, True, 5, 4),
            (256, 1536, 1, True, True, 5, 4),
        ],
    },
    "B3": {
        "stem": (24, 32),
        "stages": [
            (32, 128, 1, False, False, 3, 5),
            (64, 512, 1, True, False, 3, 5),
            (128, 1024, 3, True, True, 5, 5),
            (256, 2048, 1, True, True, 5, 5),
        ],
    },
    "B4": {
        "stem": (32, 48),
        "stages": [
            (48, 128, 1, False, False, 3, 6),
            (96, 512, 1, True, False, 3, 6),
            (192, 1024, 3, True, True, 5, 6),
            (384, 2048, 1, True, True, 5, 6),
        ],
    },
    "B5": {
        "stem": (32, 64),
        "stages": [
            (64, 128, 1, False, False, 3, 6),
            (128, 512, 2, True, False, 3, 6),
            (256, 1024, 5, True, True, 5, 6),
            (512, 2048, 2, True, True, 5, 6),
        ],
    },
    "B6": {
        "stem": (48, 96),
        "stages": [
            (96, 192, 2, False, False, 3, 6),
            (192, 512, 3, True, False, 3, 6),
            (384, 1024, 6, True, True, 5, 6),
            (768, 2048, 3, True, True, 5, 6),
        ],
    },
}


class LightConvBN(nn.Module):
    """1x1 (no act) + depthwise kxk (act) — reference hgnetv2.py:83-112."""

    out_ch: int
    kernel: int
    use_lab: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.out_ch, 1, act=None, use_lab=self.use_lab, dtype=self.dtype, name="conv1")(
            x, train
        )
        return ConvBN(
            self.out_ch,
            self.kernel,
            groups=self.out_ch,
            act="relu",
            use_lab=self.use_lab,
            dtype=self.dtype,
            name="conv2",
        )(x, train)


class StemBlock(nn.Module):
    """Asymmetric stem: 3x3/2 -> (2x2 conv pair || maxpool) concat -> 3x3/2 -> 1x1
    (reference hgnetv2.py:115-166)."""

    mid_ch: int
    out_ch: int
    use_lab: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.mid_ch, 3, 2, use_lab=self.use_lab, dtype=self.dtype, name="stem1")(
            x, train
        )
        x = pad_rb(x)
        x2 = ConvBN(
            self.mid_ch // 2,
            2,
            1,
            padding=((0, 0), (0, 0)),
            use_lab=self.use_lab,
            dtype=self.dtype,
            name="stem2a",
        )(x, train)
        x2 = pad_rb(x2)
        x2 = ConvBN(
            self.mid_ch,
            2,
            1,
            padding=((0, 0), (0, 0)),
            use_lab=self.use_lab,
            dtype=self.dtype,
            name="stem2b",
        )(x2, train)
        x1 = max_pool_2x2_s1(x)
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN(self.mid_ch, 3, 2, use_lab=self.use_lab, dtype=self.dtype, name="stem3")(
            x, train
        )
        return ConvBN(self.out_ch, 1, 1, use_lab=self.use_lab, dtype=self.dtype, name="stem4")(
            x, train
        )


class EseModule(nn.Module):
    """Effective-SE channel attention (reference hgnetv2.py:169-186)."""

    chs: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.chs, (1, 1), use_bias=True,
            kernel_init=torch_kernel_init, bias_init=torch_bias_init(x.shape[-1]),
            dtype=self.dtype, name="conv",
        )(s)
        return x * nn.sigmoid(s)


class HGBlock(nn.Module):
    """Dense-concat HG block (reference hgnetv2.py:189-275).

    Aggregation: the reference's HG_Stage always uses the "se" variant
    (squeeze 1x1 -> excitation 1x1, hgnetv2.py:230-248, 290) for every
    published B* config; "ese" (1x1 + EseModule) is kept for completeness."""

    mid_ch: int
    out_ch: int
    layer_num: int
    kernel: int = 3
    residual: bool = False
    light_block: bool = False
    use_lab: bool = False
    agg: str = "se"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        outs = [x]
        for i in range(self.layer_num):
            if self.light_block:
                x = LightConvBN(
                    self.mid_ch, self.kernel, self.use_lab, self.dtype, name=f"layers_{i}"
                )(x, train)
            else:
                x = ConvBN(
                    self.mid_ch,
                    self.kernel,
                    1,
                    use_lab=self.use_lab,
                    dtype=self.dtype,
                    name=f"layers_{i}",
                )(x, train)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        if self.agg == "se":
            x = ConvBN(
                self.out_ch // 2, 1, 1, use_lab=self.use_lab, dtype=self.dtype,
                name="aggregation_0",
            )(x, train)
            x = ConvBN(
                self.out_ch, 1, 1, use_lab=self.use_lab, dtype=self.dtype,
                name="aggregation_1",
            )(x, train)
        else:
            x = ConvBN(
                self.out_ch, 1, 1, use_lab=self.use_lab, dtype=self.dtype,
                name="aggregation_0",
            )(x, train)
            x = EseModule(self.out_ch, dtype=self.dtype, name="aggregation_1")(x)
        if self.residual:
            x = x + identity
        return x


class HGStage(nn.Module):
    """Optional depthwise downsample + HGBlock chain (reference hgnetv2.py:278-329)."""

    mid_ch: int
    out_ch: int
    block_num: int
    layer_num: int
    downsample: bool = True
    light_block: bool = False
    kernel: int = 3
    use_lab: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsample:
            x = ConvBN(
                x.shape[-1],
                3,
                2,
                groups=x.shape[-1],
                act=None,
                use_lab=self.use_lab,
                dtype=self.dtype,
                name="downsample",
            )(x, train)
        for i in range(self.block_num):
            x = HGBlock(
                self.mid_ch,
                self.out_ch,
                self.layer_num,
                kernel=self.kernel,
                residual=i > 0,
                light_block=self.light_block,
                use_lab=self.use_lab,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, train)
        return x


class HGNetv2(nn.Module):
    """Backbone: returns features at the requested stage indices.

    Input  [B, H, W, 3] float; output list of NHWC maps at strides 4/8/16/32
    filtered by ``return_idx`` (reference hgnetv2.py:424-568).
    """

    name_: str = "B0"
    use_lab: bool = False
    return_idx: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = ARCH_CONFIGS[self.name_]
        mid, out = cfg["stem"]
        x = StemBlock(mid, out, self.use_lab, self.dtype, name="stem")(x, train)
        outs = []
        for i, (mid_ch, out_ch, nb, down, light, k, ln) in enumerate(cfg["stages"]):
            x = HGStage(
                mid_ch,
                out_ch,
                nb,
                ln,
                downsample=down,
                light_block=light,
                kernel=k,
                use_lab=self.use_lab,
                dtype=self.dtype,
                name=f"stages_{i}",
            )(x, train)
            if i in tuple(self.return_idx):
                outs.append(x)
        return outs

    @staticmethod
    def out_channels(name: str, return_idx: Sequence[int]):
        return [ARCH_CONFIGS[name]["stages"][i][1] for i in return_idx]
