"""`make quant` — the OpenVINO-INT8 analog (reference src/dl/ov_int8.py).

On TPU the low-precision serving variant is int8 weight quantization of the
matmul/conv weights with bf16 activations (per-channel symmetric absmax),
validated against an accuracy gate: quantize, run the val split, accept only
if F1 drop <= max_drop (reference quantize_with_accuracy_control semantics,
ov_int8.py:130-139).  Falls back to bf16 weights for layers whose
quantization breaks the gate is out of scope this round — the gate is
all-or-nothing like the reference's MIXED preset default."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def quantize_weights_int8(variables):
    """Per-output-channel symmetric int8 fake-quant of conv/dense kernels.

    Returns variables with kernels replaced by dequantized int8 values —
    serving still runs bf16 math but weights carry int8 information content
    (the XLA path to true int8 matmuls can reuse these scales)."""
    import jax.numpy as jnp
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables["params"], sep="/")
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if k.endswith("/kernel") and v.ndim >= 2:
            axes = tuple(range(v.ndim - 1))
            scale = np.abs(v).max(axis=axes, keepdims=True) / 127.0
            scale = np.where(scale == 0, 1.0, scale)
            q = np.clip(np.round(v / scale), -127, 127)
            out[k] = (q * scale).astype(v.dtype)
        else:
            out[k] = v
    res = dict(variables)
    res["params"] = traverse_util.unflatten_dict(out, sep="/")
    return res


def main(argv=None):
    from dfine_tpu.config import cli_config, get_latest_experiment_dir
    from dfine_tpu.train.trainer import Trainer

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    max_drop = float(cfg.export.get("int8_max_drop", 0.01))
    exp_dir = Path(cfg.train.path_to_save)
    if not exp_dir.exists():
        exp_dir = get_latest_experiment_dir(Path(cfg.train.path_to_save).parent, cfg.exp_name)

    tr = Trainer(cfg)
    tr.path_to_save = exp_dir
    tr.load_checkpoint("best")
    base = tr.evaluate("val")["f1"]

    import jax
    import jax.numpy as jnp

    variables = tr._current_eval_variables()
    quant = quantize_weights_int8(jax.tree.map(lambda x: x, variables))
    qp = jax.tree.map(jnp.asarray, quant["params"])
    tr.state = tr.state.replace(
        params=qp,
        ema_params=qp if tr.use_ema else None,
        ema_batch_stats=tr.state.batch_stats if tr.use_ema else None,
    )
    f1_q = tr.evaluate("val")["f1"]
    drop = base - f1_q
    ok = drop <= max_drop
    print(f"fp F1={base:.4f}  int8 F1={f1_q:.4f}  drop={drop:.4f}  "
          f"{'ACCEPTED' if ok else 'REJECTED'} (max_drop={max_drop})")
    if ok:
        from dfine_tpu.utils.checkpoint import save_params_npz

        save_params_npz(exp_dir / "export_int8.npz", quant)
        print(f"saved {exp_dir / 'export_int8.npz'}")


if __name__ == "__main__":
    main()
