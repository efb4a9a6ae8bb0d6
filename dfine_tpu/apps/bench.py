"""`make bench`: run every serving backend over the val split, measure
end-to-end per-image latency (preprocess -> inference -> postprocess) and
F1/precision/recall/IoU side by side.

Capability mirror of reference src/dl/bench.py:29-258 — mAP is dropped there
too because bench preds are conf-thresholded; the first sample is excluded
from latency (compile)."""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Dict, List

import cv2
import numpy as np


def test_model(model, ds, label_to_name, iou_thresh, viz_dir: Path = None) -> Dict:
    from dfine_tpu.eval.validator import Validator
    from dfine_tpu.utils.viz import draw_detections

    preds, gts, times = [], [], []
    for i in range(len(ds)):
        img_path, _ = ds._paths(i)
        img = cv2.imread(str(img_path))
        t0 = time.perf_counter()
        (res,) = model(img)
        times.append(time.perf_counter() - t0)
        res["all_boxes"], res["all_scores"], res["all_labels"] = (
            res["boxes"], res["scores"], res["labels"],
        )
        preds.append(res)
        raw = ds.load_raw(i)
        gts.append({"labels": raw["labels"],
                    "boxes": raw["boxes"]})
        if viz_dir is not None and i < 10:
            viz_dir.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(viz_dir / img_path.name),
                        draw_detections(img, res["boxes"], res["labels"],
                                        res["scores"], res.get("masks"), label_to_name))
    v = Validator(gts, preds, label_to_name, iou_thresh=iou_thresh)
    m = v.compute_metrics()
    lat = float(np.mean(times[1:]) * 1000) if len(times) > 1 else float(times[0] * 1000)
    return {"f1": m["f1"], "precision": m["precision"], "recall": m["recall"],
            "iou": m["iou"], "latency_ms": round(lat, 2)}


def main(argv=None):
    from dfine_tpu.config import cli_config, get_latest_experiment_dir
    from dfine_tpu.data.loader import Loader
    from dfine_tpu.infer import AOTModel, ExportedModel, JAXModel

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    t = cfg.train
    exp_dir = Path(t.path_to_save)
    if not exp_dir.exists():
        exp_dir = get_latest_experiment_dir(Path(t.path_to_save).parent, cfg.exp_name)
    weights = exp_dir / "best.ckpt"
    label_to_name = {int(k): v for k, v in t.label_to_name.items()}
    n_out = 1 if t.use_one_class else len(label_to_name)
    loader = Loader(Path(t.data_path), t, task=cfg.task)
    ds = loader.dataset("val", mode="bench")

    kw = dict(
        n_outputs=n_out, input_height=t.img_size[0], input_width=t.img_size[1],
        conf_thresh=t.conf_thresh, keep_ratio=t.keep_ratio,
        enable_mask_head=cfg.task == "segment",
    )
    backends = {
        "jax-jit": lambda: JAXModel(cfg.model_name, str(weights), **kw),
        "jax-aot": lambda: AOTModel(cfg.model_name, str(weights), **kw),
        "stablehlo": lambda: ExportedModel(cfg.model_name, str(weights), **kw),
    }
    rows: List[Dict] = []
    for name, ctor in backends.items():
        try:
            model = ctor()
        except Exception as e:  # backend unavailable: report and continue
            print(f"{name}: SKIPPED ({type(e).__name__}: {e})")
            continue
        r = test_model(model, ds, label_to_name, t.iou_thresh,
                       viz_dir=Path(t.bench_img_path) / name)
        rows.append({"backend": name, **r})
        print(f"{name}: {r}")
    if rows:
        hdr = list(rows[0].keys())
        print("\n| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in rows:
            print("| " + " | ".join(str(r[h]) for h in hdr) + " |")


if __name__ == "__main__":
    main()
