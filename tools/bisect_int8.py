"""Bisect which quantized submodule degrades the int8 model program (r2 debug)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from flax import traverse_util
from dfine_tpu.models import build_model
from dfine_tpu.infer.int8 import apply_int8


def convert_filtered(variables, pred):
    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    out, scales = {}, {}
    nq = 0
    for k, v in flat.items():
        a = np.asarray(v)
        if k.endswith("/kernel") and a.ndim == 2 and pred(k):
            s = np.abs(a).max(axis=0, keepdims=True) / 127.0
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            out[k] = np.clip(np.round(a / s), -127, 127).astype(np.int8)
            scales[k[: -len("/kernel")] + "/scale"] = s[0]
            nq += 1
        else:
            out[k] = a
    res = dict(variables)
    res["params"] = traverse_util.unflatten_dict(out, sep="/")
    res["quant"] = traverse_util.unflatten_dict(scales, sep="/")
    return res, nq


def bench(f, *args, iters=20):
    out = f(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = f(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort(); return np.mean(ts[:10]) * 1000


def main():
    which = sys.argv[1]
    preds = {
        "decoder": lambda k: k.startswith("decoder/"),
        "encoder": lambda k: k.startswith("encoder/"),
        "dec_attn": lambda k: k.startswith("decoder/") and ("self_attn" in k or "cross_attn" in k),
        "dec_ffn": lambda k: k.startswith("decoder/") and ("linear" in k or "gateway" in k),
        "dec_heads": lambda k: k.startswith("decoder/") and ("head" in k or "lqe" in k or "enc_" in k),
        "all": lambda k: True,
        "none": lambda k: False,
    }
    model = build_model("n", num_classes=3, enable_mask_head=False, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 320, 320, 3)).astype(np.float32))
    from dfine_tpu.models import jit_init

    v = jit_init(model, {"params": jax.random.key(0)}, x, train=False)
    f_bf = jax.jit(lambda v, x: model.apply(v, x, train=False))
    print("bf16 before:", round(bench(f_bf, v, x), 3), flush=True)
    v8, nq = convert_filtered(jax.tree.map(np.asarray, v), preds[which])
    v8 = jax.tree.map(jnp.asarray, v8)
    f_i8 = jax.jit(lambda v, x: apply_int8(model, v, x, train=False))
    print(f"int8[{which}] ({nq} kernels):", round(bench(f_i8, v8, x), 3), flush=True)
    print("bf16 after:", round(bench(f_bf, v, x), 3), flush=True)


if __name__ == "__main__":
    main()
