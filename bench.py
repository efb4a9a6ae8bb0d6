"""Round benchmark: D-FINE-m 640x640 end-to-end single-image latency on one
TPU chip.  "End-to-end" the TPU-native way: ONE XLA program containing
preprocessing (uint8 -> bilinear resize -> normalize), the full model, and
the NMS-free top-k decode — the raw 720p uint8 frame goes in, final
(scores, labels, boxes) come out (bench then syncs them to host).

Prints ONE JSON line.  Baseline: the reference's best single-image number —
TensorRT FP16 on RTX 5070 Ti, 5.5 ms (reference README.md:108, BASELINE.md),
which likewise includes pre/postprocess.  ``vs_baseline`` is the speedup
factor (baseline_ms / ours_ms; >1 beats it).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from dfine_tpu.models import build_model
    from dfine_tpu.ops.preprocess import preprocess_plain
    from dfine_tpu.postprocess import topk_decode

    model = build_model("m", num_classes=80, enable_mask_head=False, dtype=jnp.bfloat16)
    init_x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, init_x, train=False)

    @jax.jit
    def infer(variables, raw_uint8):
        x = preprocess_plain(raw_uint8, (640, 640))
        out = model.apply(variables, x, train=False)
        return topk_decode(out["pred_logits"], out["pred_boxes"], 300)

    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, size=(1, 720, 1280, 3), dtype=np.uint8)
    )
    # warmup / compile
    out = infer(variables, raw)
    jax.block_until_ready(out)

    iters = 50
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = infer(variables, raw)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times) * 1000.0)

    baseline_ms = 5.5  # TensorRT FP16 / RTX 5070 Ti (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "dfine_m_640_e2e_infer_latency_p50",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / p50, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
