"""Shared flax building blocks (NHWC, bf16-ready).

These provide the capability surface of the reference's conv blocks
(reference: src/d_fine/arch/common.py, hgnetv2.py:25-112, hybrid_encoder.py:21-239)
re-expressed as idiomatic flax modules.  Design notes:

* NHWC everywhere — XLA:TPU's native convolution layout.
* BatchNorm runs in fp32 (``dtype=float32``) regardless of compute dtype;
  stats live in the ``batch_stats`` collection.  "Frozen" norm (reference
  common.py:29-71) is expressed at the *optimizer* level (zero lr mask) plus
  ``use_running_average=True`` — no separate module class needed.
* Deploy-time conv+BN fusion (reference hybrid_encoder.py:47-79) is a pure
  param-tree transform in ``dfine_tpu/infer/fuse.py`` rather than module
  surgery; the module graph stays static for XLA.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

# ---------------------------------------------------------------- SyncBN --
# Cross-replica BatchNorm (the reference enables torch SyncBatchNorm only
# when per-rank batch < 4, src/dl/train.py:159-160).  The axis name is a
# process-level static read at TRACE time by every BatchNorm below; the
# trainer sets it before its first train-step invocation when the per-replica
# batch is small, so forward statistics are psum'ed over the dp mesh axis.
# Eval traces (use_running_average=True) never compute stats and are
# unaffected.  A static rather than a threaded module field: BN appears at
# 40 instantiation sites and the value is necessarily uniform per program.

_BN_AXIS: Optional[str] = None


def set_bn_axis(axis: Optional[str]) -> None:
    """Enable (axis='dp') / disable (None) cross-replica SyncBN for all
    subsequently TRACED train-mode programs."""
    global _BN_AXIS
    _BN_AXIS = axis


def bn_axis(train: bool) -> Optional[str]:
    return _BN_AXIS if train else None


# ------------------------------------------------------ torch-default init --
# The reference leaves most layers at torch's defaults, which differ from
# flax's: torch nn.Conv2d/nn.Linear reset_parameters draws kernels from
# kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform)
# (~1.73x SMALLER std than flax's lecun_normal) and biases from
# uniform(+-1/sqrt(fan_in)) (flax: zeros).  With matched hyperparameters the
# init distribution is the remaining degree of freedom in training dynamics
# (tests/test_train_equivalence.py shows identical-weights trajectories
# track), and the r5 8-epoch parity runs measured a large early-convergence
# deficit against the torch reference before this matching.

torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Linear/Conv bias: uniform(+-1/sqrt(fan_in))."""
    import jax

    bound = 1.0 / float(fan_in) ** 0.5 if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name is None or name == "identity":
        return lambda x: x
    name = name.lower()
    table = {
        "relu": nn.relu,
        "silu": nn.silu,
        "swish": nn.silu,
        "gelu": nn.gelu,
        "leaky_relu": nn.leaky_relu,
        "hardsigmoid": nn.hard_sigmoid,
        "sigmoid": nn.sigmoid,
    }
    if name not in table:
        raise ValueError(f"unknown activation {name}")
    return table[name]


class LearnableAffine(nn.Module):
    """y = scale * x + bias with scalar params (reference hgnetv2.py:25-32)."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", lambda _: jnp.ones((1,), jnp.float32))
        bias = self.param("bias", lambda _: jnp.zeros((1,), jnp.float32))
        return scale.astype(x.dtype) * x + bias.astype(x.dtype)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional act + optional LAB.

    ``padding`` follows torch semantics: None -> symmetric (k-1)//2;
    an explicit ((t,b),(l,r)) tuple is passed through.
    """

    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    padding: Optional[object] = None  # None => (k-1)//2 symmetric
    act: Optional[str] = "relu"
    use_lab: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.padding is None:
            p = (self.kernel - 1) // 2
            padding = ((p, p), (p, p))
        else:
            padding = self.padding
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=padding,
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            axis_name=bn_axis(train),
            name="bn",
        )(x)
        x = x.astype(self.dtype)
        if self.act is not None:
            x = get_activation(self.act)(x)
            if self.use_lab:
                x = LearnableAffine(name="lab")(x)
        return x


class ConvBNA(nn.Module):
    """Conv (optional bias) + BN + act — the encoder-side ConvNormLayer(_fuse)
    (reference hybrid_encoder.py:21-93).  Same math as ConvBN but keeps the
    reference's bias option and no-LAB contract."""

    out_ch: int
    kernel: int
    stride: int
    groups: int = 1
    padding: Optional[object] = None
    use_bias: bool = False
    act: Optional[str] = None
    kernel_init: Callable = torch_kernel_init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.padding is None:
            p = (self.kernel - 1) // 2
            padding = ((p, p), (p, p))
        else:
            padding = self.padding
        fan_in = self.kernel * self.kernel * (x.shape[-1] // self.groups)
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=padding,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            axis_name=bn_axis(train),
            name="norm",
        )(x)
        x = x.astype(self.dtype)
        if self.act is not None:
            x = get_activation(self.act)(x)
        return x


class VGGBlock(nn.Module):
    """RepVGG-style block: 3x3 + 1x1 branches summed then act
    (reference hybrid_encoder.py:106-156).  Deploy fusion = param transform."""

    out_ch: int
    act: Optional[str] = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = ConvBNA(self.out_ch, 3, 1, act=None, dtype=self.dtype, name="conv1")(x, train)
        y2 = ConvBNA(self.out_ch, 1, 1, act=None, dtype=self.dtype, name="conv2")(x, train)
        y = y1 + y2
        return get_activation(self.act)(y)


class CSPLayer(nn.Module):
    """Cross-stage partial layer with VGGBlock bottlenecks
    (reference hybrid_encoder.py:209-239)."""

    out_ch: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        x1 = ConvBNA(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.num_blocks):
            x1 = VGGBlock(hidden, act=self.act, dtype=self.dtype, name=f"bottlenecks_{i}")(
                x1, train
            )
        x2 = ConvBNA(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        y = x1 + x2
        if hidden != self.out_ch:
            y = ConvBNA(self.out_ch, 1, 1, act=self.act, dtype=self.dtype, name="conv3")(y, train)
        return y


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN fusion block (reference hybrid_encoder.py:182-206)."""

    c2: int  # out channels
    c3: int  # split channels
    c4: int  # branch channels
    n: int = 3
    act: str = "silu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3 // 2
        y = ConvBNA(self.c3, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y0, y1 = y[..., :c], y[..., c:]
        b2 = CSPLayer(self.c4, self.n, 1.0, self.act, dtype=self.dtype, name="cv2_csp")(y1, train)
        b2 = ConvBNA(self.c4, 3, 1, act=self.act, dtype=self.dtype, name="cv2_conv")(b2, train)
        b3 = CSPLayer(self.c4, self.n, 1.0, self.act, dtype=self.dtype, name="cv3_csp")(b2, train)
        b3 = ConvBNA(self.c4, 3, 1, act=self.act, dtype=self.dtype, name="cv3_conv")(b3, train)
        out = jnp.concatenate([y0, y1, b2, b3], axis=-1)
        return ConvBNA(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv4")(out, train)


class SCDown(nn.Module):
    """Separable downsample: 1x1 then depthwise kxk stride s
    (reference hybrid_encoder.py:96-103)."""

    out_ch: int
    kernel: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNA(self.out_ch, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return ConvBNA(
            self.out_ch,
            self.kernel,
            self.stride,
            groups=self.out_ch,
            dtype=self.dtype,
            name="cv2",
        )(x, train)


class MultiHeadSelfAttention(nn.Module):
    """Packed-QKV multi-head attention matching torch ``nn.MultiheadAttention``
    parameterization (single in-proj, single out-proj) so checkpoints map 1:1.
    Runs the core product via ``jax.nn.dot_product_attention`` (XLA fused)."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None):
        """q/k/v: [B, L, C]; mask: bool [.., L, L] with True = KEEP."""
        c, h = self.embed_dim, self.num_heads
        d = c // h
        # torch nn.MultiheadAttention._reset_parameters: xavier_uniform
        # in_proj weight, ZERO in_proj/out_proj biases, torch-default
        # out_proj weight
        qkv = nn.DenseGeneral(
            3 * c, use_bias=True,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="in_proj",
        )
        # torch packs weights row-wise [3C, C]: q rows, k rows, v rows
        wq = qkv(q)[..., :c]
        wk = qkv(k)[..., c : 2 * c]
        wv = qkv(v)[..., 2 * c :]

        def split(x):
            return x.reshape(x.shape[:-1] + (h, d))

        wq, wk, wv = split(wq), split(wk), split(wv)
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
        logits = jnp.einsum("bqhd,bkhd->bhqk", wq, wk).astype(jnp.float32) * scale
        if mask is not None:
            neg = jnp.finfo(jnp.float32).min
            logits = jnp.where(mask, logits, neg)
        attn = nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, wv).reshape(q.shape[:-1] + (c,))
        return nn.Dense(
            c, use_bias=True, kernel_init=torch_kernel_init,
            dtype=self.dtype, name="out_proj",
        )(out)


class MLP(nn.Module):
    """num_layers-deep MLP with act between layers (reference dfine_decoder.py:33-46).

    ``zero_last`` zero-initializes the final layer (the reference's common
    head-init pattern, dfine_decoder.py:724-734)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    act: str = "relu"
    zero_last: bool = False
    xavier_kernels: bool = False  # reference query_pos_head (:739-740)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = get_activation(self.act)
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dim = self.out_dim if last else self.hidden_dim
            if last and self.zero_last:
                kws = dict(
                    kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros
                )
            else:  # torch Linear defaults (or explicit xavier kernels)
                kws = dict(
                    kernel_init=(nn.initializers.xavier_uniform()
                                 if self.xavier_kernels else torch_kernel_init),
                    bias_init=torch_bias_init(x.shape[-1]),
                )
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}", **kws)(x)
            if not last:
                x = a(x)
        return x


def max_pool_2x2_s1(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-1 VALID max pool (stem pooling path, hgnetv2.py:154-162 —
    the (0,1,0,1) pre-pad makes ceil_mode exact)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(1, 1), padding="VALID")


def pad_rb(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad right/bottom by one pixel (torch F.pad(x, (0,1,0,1)))."""
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
