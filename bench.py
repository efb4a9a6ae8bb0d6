"""Round benchmark: D-FINE-m 640x640 end-to-end single-image latency on one
TPU chip (model forward + fused NMS-free top-k decode, bf16 compute).

Prints ONE JSON line.  Baseline: the reference's best single-image number —
TensorRT FP16 on RTX 5070 Ti, 5.5 ms (reference README.md:108, BASELINE.md).
``vs_baseline`` is the speedup factor (baseline_ms / ours_ms; >1 beats it).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from dfine_tpu.models import build_model
    from dfine_tpu.postprocess import topk_decode

    model = build_model("m", num_classes=80, enable_mask_head=False, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 640, 640, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    @jax.jit
    def infer(variables, images):
        out = model.apply(variables, images, train=False)
        return topk_decode(out["pred_logits"], out["pred_boxes"], 300)

    # warmup / compile
    out = infer(variables, x)
    jax.block_until_ready(out)

    iters = 50
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = infer(variables, x)
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
