"""`make quant` — the OpenVINO-INT8 analog (reference src/dl/ov_int8.py).

Quantizes every Dense kernel to int8 (per-output-channel symmetric absmax)
and evaluates the model with REAL int8 ``dot_general`` execution
(dfine_tpu/infer/int8.py) — not fake-quant — against the same accuracy gate
as the reference's ``quantize_with_accuracy_control`` (ov_int8.py:130-139):
accept only if the val F1 drop is <= ``export.int8_max_drop``.  Convolutions
stay bf16 like nncf's MIXED preset keeps sensitive layers in fp.

On accept, saves ``export_int8.npz`` holding the int8 kernels + scales;
serve it with ``dfine_tpu.infer.Int8Model``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def quantize_weights_int8(variables):
    """Back-compat alias: per-channel int8 conversion (real int8 storage).
    See dfine_tpu.infer.int8.convert_params_int8."""
    from ..infer.int8 import convert_params_int8

    return convert_params_int8(variables)


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

    from dfine_tpu.infer.int8 import apply_int8, convert_params_int8, count_int8
    from dfine_tpu.postprocess import topk_decode

    variables = tr._current_eval_variables()
    v8 = jax.tree.map(
        jnp.asarray, convert_params_int8(jax.tree.map(np.asarray, variables))
    )
    nq, nk = count_int8(v8)

    # reroute the trainer's eval through the int8 interceptor
    model = tr.model

    @jax.jit
    def int8_eval(variables, images):
        out = apply_int8(model, variables, images, train=False)
        return topk_decode(
            out["pred_logits"], out["pred_boxes"], 300, masks=out.get("pred_masks")
        )

    tr._eval_fn = int8_eval
    tr._current_eval_variables = lambda: v8
    f1_q = tr.evaluate("val")["f1"]
    drop = base - f1_q
    ok = drop <= max_drop
    print(f"int8 kernels: {nq}/{nk}")
    print(f"fp F1={base:.4f}  int8 F1={f1_q:.4f}  drop={drop:.4f}  "
          f"{'ACCEPTED' if ok else 'REJECTED'} (max_drop={max_drop})")
    if ok:
        from dfine_tpu.utils.checkpoint import save_params_npz

        save_params_npz(exp_dir / "export_int8.npz", v8)
        print(f"saved {exp_dir / 'export_int8.npz'}")


if __name__ == "__main__":
    main()
