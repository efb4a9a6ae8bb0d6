"""True INT8 serving — actual int8 ``lax.dot_general`` execution on the MXU.

The reference ships OpenVINO-NNCF int8 engines that really execute int8
kernels (src/dl/ov_int8.py:130-139).  The TPU-native equivalent here:

* **weights** of every 2-D Dense/DenseGeneral kernel (decoder + encoder
  attention/FFN/heads — where the serving FLOPs and HBM weight traffic live)
  are stored as ``int8`` with per-output-channel symmetric absmax scales
  (the same scales ``apps/quant.py`` computes);
* **activations** are dynamically quantized per row (token) at runtime;
* the matmul runs ``lax.dot_general(int8, int8) -> int32`` — the MXU's
  double-rate int8 path — then rescales to bf16 and adds the fp bias.

Convolutions (the backbone) stay bf16, mirroring the reference's MIXED
preset (nncf MIXED keeps sensitive layers in fp).  Accuracy is enforced by
the same F1 gate (``apps/quant.py``).

Mechanism: params are converted so Dense kernels hold int8 arrays and a
parallel ``quant`` collection holds their scales; a flax method interceptor
replaces the ``__call__`` of affected Dense modules at trace time with the
int8 compute.  Model code is untouched and the param tree structure (minus
dtypes) is checkpoint-compatible.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import traverse_util


def convert_params_int8(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every 2-D ``kernel`` leaf to int8 (per-output-channel
    symmetric absmax) and emit a parallel ``quant`` collection with fp32
    scales.  Non-kernel / conv (4-D) leaves pass through unchanged."""
    if "quant" in variables:  # already converted (e.g. export_int8.npz)
        return variables
    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    out, scales = {}, {}
    for k, v in flat.items():
        a = np.asarray(v)
        if (k == "kernel" or k.endswith("/kernel")) and a.ndim == 2:
            s = np.abs(a).max(axis=0, keepdims=True) / 127.0  # [1, out]
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            q = np.clip(np.round(a / s), -127, 127).astype(np.int8)
            out[k] = q
            scales["scale" if k == "kernel" else k[: -len("/kernel")] + "/scale"] = s[0]
        else:
            out[k] = a
    res = dict(variables)
    res["params"] = traverse_util.unflatten_dict(out, sep="/")
    res["quant"] = traverse_util.unflatten_dict(scales, sep="/")
    return res


# Compute mode, read at TRACE time:
# * "w8a8"  — dynamic per-row activation quant, int8 x int8 -> int32 MXU dot.
#   The numerically-quantized path; int8 microbenchmarks run 1.35x faster
#   than bf16 on v5e, BUT on the axon dev runtime a large program whose
#   PARAMETERS include int8 buffers flips the session into a degraded
#   sync-dispatch mode (~35 ms per call, measured tools/bisect_int8.py).
#   Default on standard Cloud TPU runtimes.
# * "w8a16" — weights stay int8 in HBM (half the weight traffic), dequantized
#   to bf16 in-register before a bf16 dot.  Same int8 information content
#   (the F1 gate sees identical weights) — but the params are still
#   int8-TYPED, so the axon quirk fires for this mode too (NOTES.md #5).
# * "w8a16_packed" — int8 weights PACKED 4-per-uint32 param
#   (pack_int8_params), unpacked to bf16 in-graph by bitwise ops the
#   compiler fuses into the matmul read.  Same HBM weight bytes as int8,
#   identical math to w8a16, and NO int8-typed buffers anywhere.  Measured
#   e2e (bench.py fresh-subprocess protocol, 2026-08-19): it does NOT
#   dodge the axon degraded mode after all — det p50 83.0 ms vs the bf16
#   control's 1.47 ms through the identical protocol, and a bf16 program
#   run AFTER it in the same session degrades to ~97 ms, so the session
#   flip triggers on more than int8-typed params (uint32 params or the
#   bitwise unpack itself).  All three int8 modes are therefore a loss on
#   this dev runtime (bf16 is its serving dtype); the mode is kept for its
#   HBM footprint and for standard Cloud TPU runtimes.
_INT8_MODE = "w8a16"


def set_int8_mode(mode: str) -> None:
    global _INT8_MODE
    assert mode in ("w8a8", "w8a16", "w8a16_packed"), mode
    _INT8_MODE = mode


def pack_int8_params(variables_int8: Dict[str, Any]) -> Dict[str, Any]:
    """Repack every int8 kernel as uint32 words (4 weights along the input
    dim, little-endian) so NO parameter buffer is int8-typed, keeping int8's
    HBM footprint.  (Measured: this does NOT avoid the axon runtime's
    degraded mode — see the mode table above.)  The original input dim
    rides the quant collection (``in_dim``)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables_int8["params"], sep="/")
    quant = dict(traverse_util.flatten_dict(variables_int8["quant"], sep="/"))
    out = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == np.int8 and a.ndim == 2:
            in_, cols = a.shape
            pad = (-in_) % 4
            b = np.pad(a, ((0, pad), (0, 0))).astype(np.uint8).astype(np.uint32)
            b = b.reshape((in_ + pad) // 4, 4, cols)
            packed = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
            out[k] = packed
            dkey = "in_dim" if k == "kernel" else k[: -len("/kernel")] + "/in_dim"
            quant[dkey] = np.asarray(in_, np.int32)
        else:
            out[k] = a
    res = dict(variables_int8)
    res["params"] = traverse_util.unflatten_dict(out, sep="/")
    res["quant"] = traverse_util.unflatten_dict(quant, sep="/")
    return res


def _unpack_uint32_kernel(packed: jnp.ndarray, in_dim: int) -> jnp.ndarray:
    """uint32 [in/4, out] -> int8-valued int32 [in, out] (sign-extended)."""
    n4, cols = packed.shape
    bytes_ = jnp.stack(
        [(packed >> (8 * i)) & jnp.uint32(0xFF) for i in range(4)], axis=1
    )  # [in/4, 4, out]
    v = bytes_.reshape(n4 * 4, cols).astype(jnp.int32)
    v = v - 256 * (v >= 128).astype(jnp.int32)  # sign extend
    return v[:in_dim]


def _int8_matmul(x: jnp.ndarray, kq: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(kq), executed per _INT8_MODE."""
    if _INT8_MODE == "w8a8":
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, kq,
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * sx * w_scale.astype(jnp.float32)
    # w8a16: int8 weights dequantized to bf16 right before the dot — XLA
    # fuses the convert+scale into the matmul read
    k_bf = kq.astype(jnp.bfloat16) * w_scale.astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), k_bf,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y


def int8_interceptor(next_fun, args, kwargs, context):
    """flax method interceptor: reroute Dense/DenseGeneral calls whose kernel
    was converted to int8 through the int8 matmul."""
    m = context.module
    if (
        context.method_name == "__call__"
        and isinstance(m, (nn.Dense, nn.DenseGeneral))
        and m.scope is not None
        and m.scope.has_variable("params", "kernel")
    ):
        k = m.scope.get_variable("params", "kernel")
        quantized = k is not None and k.ndim == 2 and k.dtype in (jnp.int8, jnp.uint32)
        if quantized:
            scale = m.scope.get_variable("quant", "scale")
            x = args[0]
            if k.dtype == jnp.uint32:  # w8a16_packed storage
                kq = _unpack_uint32_kernel(k, args[0].shape[-1])
                k_bf = kq.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    x.astype(jnp.bfloat16), k_bf,
                    (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                y = _int8_matmul(x, k, scale)
            if m.use_bias:
                bias = m.scope.get_variable("params", "bias")
                y = y + bias.astype(jnp.float32)
            out_dtype = m.dtype or x.dtype
            return y.astype(out_dtype)
    return next_fun(*args, **kwargs)


def apply_int8(model, variables_int8, *args, **kwargs):
    """model.apply with the int8 interceptor active (variables must come from
    convert_params_int8)."""
    with nn.intercept_methods(int8_interceptor):
        return model.apply(variables_int8, *args, **kwargs)


def int8_mode() -> str:
    return _INT8_MODE


def count_int8(variables_int8) -> Tuple[int, int]:
    """(quantized kernels, total kernel leaves) — for reporting."""
    flat = traverse_util.flatten_dict(variables_int8["params"], sep="/")
    kern = [k for k in flat if k.endswith("/kernel") or k == "kernel"]
    q = [
        k for k in kern
        if np.asarray(flat[k]).dtype in (np.int8, np.uint32)
    ]
    return len(q), len(kern)
