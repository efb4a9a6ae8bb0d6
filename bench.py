"""Round benchmark: D-FINE-m 640x640 END-TO-END single-image latency on one
TPU chip — the north-star measurement (BASELINE.md: det+seg e2e <= 5.5 ms,
the reference's TensorRT-FP16 row, which includes preprocess + inference +
postprocess).

"End-to-end" the TPU-native way: ONE XLA program containing preprocessing
(uint8 -> bilinear resize -> normalize), the full model INCLUDING the
instance-segmentation head, and the NMS-free top-k decode.  The timed region
starts from a HOST numpy 720p uint8 frame (so the host->device copy is paid
inside the loop, like the reference's cv2+H2D preprocess) and ends with the
decoded scores/labels/boxes (+ bf16 mask logits for the top queries) synced
back to host.

Weights: random-init by default (latency is weight-independent); set
DFINE_BENCH_CKPT=/path/to/{.pth,.npz,ckpt} to load real weights through the
parity-verified importer (dfine_tpu/utils/checkpoint.py).

Prints ONE JSON line.  Primary metric = det+seg e2e p50; ``det_p50_ms`` is
the detection-only config for comparison with BENCH_r01.  ``vs_baseline`` is
the speedup factor (baseline_ms / ours_ms; > 1 beats the reference).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# masks fetched for this many top queries (bf16): 100x160x160x2B = 5 MB D2H,
# covering every plausible above-threshold detection (reference keeps the
# conf-filtered subset of 300)
TOP_MASKS = 100


def load_variables(model, img_hw):
    path = os.environ.get("DFINE_BENCH_CKPT", "")
    x = jnp.zeros((1, *img_hw, 3), jnp.float32)
    template = model.init({"params": jax.random.key(0)}, x, train=False)
    if not path:
        return template
    from pathlib import Path

    from dfine_tpu.utils.checkpoint import load_params_npz, load_torch_checkpoint

    p = Path(path)
    if p.suffix == ".npz":
        return jax.tree.map(jnp.asarray, load_params_npz(p))
    return jax.tree.map(jnp.asarray, load_torch_checkpoint(p, template))


def build(enable_masks: bool, int8: bool = False):
    from dfine_tpu.models import build_model
    from dfine_tpu.ops.preprocess import preprocess_plain
    from dfine_tpu.postprocess import topk_decode

    model = build_model(
        "m", num_classes=80, enable_mask_head=enable_masks, dtype=jnp.bfloat16
    )
    variables = load_variables(model, (640, 640))
    if int8:
        from dfine_tpu.infer.int8 import apply_int8, convert_params_int8

        variables = jax.tree.map(
            jnp.asarray, convert_params_int8(jax.tree.map(np.asarray, variables))
        )
        run = lambda v, x: apply_int8(model, v, x, train=False)
    else:
        run = lambda v, x: model.apply(v, x, train=False)

    @jax.jit
    def infer(variables, raw_uint8):
        x = preprocess_plain(raw_uint8, (640, 640))
        out = run(variables, x)
        dec = topk_decode(
            out["pred_logits"], out["pred_boxes"], 300,
            masks=out.get("pred_masks"),
        )
        if "masks" in dec:
            # ship only the strongest TOP_MASKS queries' masks, in bf16
            dec["masks"] = dec["masks"][:, :TOP_MASKS].astype(jnp.bfloat16)
        return dec

    return infer, variables


def measure(infer, variables, raw_np, iters=50):
    out = infer(variables, raw_np)  # compile + warmup
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = infer(variables, raw_np)  # H2D of the host frame included
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)


def _measure_int8_subprocess() -> float:
    """Measure the int8 config in a FRESH process: on this dev runtime a
    program with int8-typed parameters flips the whole session into a
    degraded sync-dispatch mode (~35 ms/call for every subsequent program
    too — see NOTES.md / tools/bisect_int8.py), so it must never share a
    process with the det/seg measurements."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--int8-only"],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("INT8_MS="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"int8 subprocess failed: {proc.stderr[-1500:]}")


def main():
    import sys

    raw_np = np.random.default_rng(0).integers(
        0, 255, size=(1, 720, 1280, 3), dtype=np.uint8
    )

    if "--int8-only" in sys.argv:
        infer_i8, var_i8 = build(enable_masks=False, int8=True)
        print(f"INT8_MS={measure(infer_i8, var_i8, raw_np):.3f}")
        return

    infer_det, var_det = build(enable_masks=False)
    det_p50 = measure(infer_det, var_det, raw_np)
    del infer_det, var_det

    infer_seg, var_seg = build(enable_masks=True)
    seg_p50 = measure(infer_seg, var_seg, raw_np)

    int8_p50 = None
    if os.environ.get("DFINE_BENCH_INT8", "1") != "0":
        try:
            int8_p50 = _measure_int8_subprocess()
        except Exception:
            int8_p50 = None

    baseline_ms = 5.5  # TensorRT FP16 / RTX 5070 Ti, det+seg e2e (BASELINE.md)
    row = {
        "metric": "dfine_m_640_detseg_e2e_latency_p50",
        "value": round(seg_p50, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / seg_p50, 3),
        "det_p50_ms": round(det_p50, 3),
    }
    if int8_p50 is not None:
        row["det_int8_p50_ms"] = round(int8_p50, 3)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
