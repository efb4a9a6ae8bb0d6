"""`make test_batching`: sweep batch sizes, report throughput / latency
(capability mirror of reference src/dl/test_batching.py:1-64)."""

from __future__ import annotations

import csv
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from dfine_tpu.config import cli_config
    from dfine_tpu.models import build_model
    from dfine_tpu.postprocess import topk_decode

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    t = cfg.train
    n_out = 1 if t.use_one_class else len(t.label_to_name)
    model = build_model(cfg.model_name, n_out, cfg.task == "segment", dtype=jnp.bfloat16)
    h, w = t.img_size
    x1 = jnp.zeros((1, h, w, 3), jnp.float32)
    from ..models import jit_init

    variables = jit_init(model, {"params": jax.random.key(0)}, x1, train=False)

    def infer(v, imgs):
        out = model.apply(v, imgs, train=False)
        return topk_decode(out["pred_logits"], out["pred_boxes"], 300)

    n_images = 512
    rows = []
    for bs in (1, 2, 4, 8, 16, 32):
        f = jax.jit(infer)
        batch = jnp.asarray(np.random.uniform(size=(bs, h, w, 3)).astype(np.float32))
        jax.block_until_ready(f(variables, batch))  # compile
        iters = max(1, n_images // bs)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(variables, batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        img_s = iters * bs / dt
        rows.append({"batch_size": bs, "throughput_img_s": round(img_s, 1),
                     "latency_per_img_ms": round(1000 * dt / (iters * bs), 2)})
        print(rows[-1])
    out_csv = Path(t.get("path_to_save", ".")) / "batching.csv"
    out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(out_csv, "w", newline="") as fcsv:
        wtr = csv.DictWriter(fcsv, fieldnames=list(rows[0].keys()))
        wtr.writeheader()
        wtr.writerows(rows)
    best = max(rows, key=lambda r: r["throughput_img_s"])
    print(f"optimum: bs={best['batch_size']} ({best['throughput_img_s']} img/s)")


if __name__ == "__main__":
    main()
