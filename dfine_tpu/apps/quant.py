"""`make quant` — the OpenVINO-INT8 analog (reference src/dl/ov_int8.py).

Quantizes every Dense kernel to int8 (per-output-channel symmetric absmax)
and evaluates the model with REAL int8 ``dot_general`` execution
(dfine_tpu/infer/int8.py) — not fake-quant — against the same accuracy gate
as the reference's ``quantize_with_accuracy_control`` (ov_int8.py:130-139):
accept only if the val F1 drop is <= ``export.int8_max_drop``.  Convolutions
stay bf16 like nncf's MIXED preset keeps sensitive layers in fp.

ACCURACY-CONTROLLED FALLBACK (the nncf behavior, not just a whole-model
gate): if the fully-quantized model fails the gate, kernels are reverted to
fp in greedy rounds — worst quantization error first, exponentially growing
batches — re-running the F1 gate each round until the drop fits max_drop or
every kernel is reverted.  This is the difference between "int8 ships with
a few fp layers" and "int8 gate fails, nothing ships".

On accept, saves ``export_int8.npz`` holding the (possibly mixed) int8
kernels + scales; serve it with ``dfine_tpu.infer.Int8Model``.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np


def quantize_weights_int8(variables):
    """Back-compat alias: per-channel int8 conversion (real int8 storage).
    See dfine_tpu.infer.int8.convert_params_int8."""
    from ..infer.int8 import convert_params_int8

    return convert_params_int8(variables)


def rank_by_quant_error(variables_fp, v8) -> List[Tuple[str, float]]:
    """Quantized kernels ranked by relative dequantization error (L2), worst
    first — the cheap proxy for nncf's per-quantizer ranking step."""
    from flax import traverse_util

    fp = traverse_util.flatten_dict(variables_fp["params"], sep="/")
    q = traverse_util.flatten_dict(v8["params"], sep="/")
    s = traverse_util.flatten_dict(v8["quant"], sep="/")
    errs = []
    for k, qv in q.items():
        qv = np.asarray(qv)
        if qv.dtype != np.int8:
            continue
        skey = "scale" if k == "kernel" else k[: -len("/kernel")] + "/scale"
        deq = qv.astype(np.float32) * np.asarray(s[skey])[None, :]
        w = np.asarray(fp[k], np.float32)
        errs.append((k, float(np.linalg.norm(deq - w) / (np.linalg.norm(w) + 1e-12))))
    return sorted(errs, key=lambda kv: -kv[1])


def revert_kernels(v8, variables_fp, names: List[str]):
    """Return a copy of v8 with the named kernels restored to fp (their
    scales dropped) — the int8 interceptor skips non-int8 kernels."""
    from flax import traverse_util

    fp = traverse_util.flatten_dict(variables_fp["params"], sep="/")
    q = dict(traverse_util.flatten_dict(v8["params"], sep="/"))
    s = dict(traverse_util.flatten_dict(v8["quant"], sep="/"))
    for k in names:
        q[k] = np.asarray(fp[k])
        s.pop("scale" if k == "kernel" else k[: -len("/kernel")] + "/scale", None)
    out = dict(v8)
    out["params"] = traverse_util.unflatten_dict(q, sep="/")
    out["quant"] = traverse_util.unflatten_dict(s, sep="/")
    return out


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

    def eval_f1(v):
        tr._current_eval_variables = lambda: v
        return tr.evaluate("val")["f1"]

    f1_q = eval_f1(v8)
    drop = base - f1_q
    print(f"int8 kernels: {nq}/{nk}")
    print(f"fp F1={base:.4f}  int8 F1={f1_q:.4f}  drop={drop:.4f} (max_drop={max_drop})")

    # nncf-style accuracy control: revert worst-quant-error kernels to fp in
    # exponentially growing greedy rounds until the gate passes
    reverted: List[str] = []
    if drop > max_drop:
        ranking = [k for k, _ in rank_by_quant_error(variables, v8)]
        batch = 1
        while drop > max_drop and len(reverted) < len(ranking):
            take = ranking[len(reverted) : len(reverted) + batch]
            reverted += take
            v8 = jax.tree.map(
                jnp.asarray, revert_kernels(jax.tree.map(np.asarray, v8),
                                            jax.tree.map(np.asarray, variables), take)
            )
            f1_q = eval_f1(v8)
            drop = base - f1_q
            print(f"  reverted {len(reverted)}/{len(ranking)} kernels -> "
                  f"F1={f1_q:.4f} drop={drop:.4f}")
            batch *= 2

    ok = drop <= max_drop
    nq, nk = count_int8(v8)
    print(f"final: {nq}/{nk} int8 kernels ({len(reverted)} reverted)  "
          f"F1={f1_q:.4f}  drop={drop:.4f}  {'ACCEPTED' if ok else 'REJECTED'}")
    if ok:
        from dfine_tpu.utils.checkpoint import save_params_npz

        save_params_npz(exp_dir / "export_int8.npz", v8)
        print(f"saved {exp_dir / 'export_int8.npz'}")


if __name__ == "__main__":
    main()
