"""Demo UI: upload an image, see detections (reference demo/demo.py:46-65).

gradio is not baked into this image, so the app degrades gracefully:
- with gradio installed: the same upload->overlay interface
- without: a CLI fallback that renders one image to disk."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import cv2
import numpy as np


def build_model_from_cfg(cfg):
    from dfine_tpu.config import get_latest_experiment_dir
    from dfine_tpu.infer import JAXModel

    t = cfg.train
    exp_dir = Path(t.path_to_save)
    if not exp_dir.exists():
        exp_dir = get_latest_experiment_dir(Path(t.path_to_save).parent, cfg.exp_name)
    label_to_name = {int(k): v for k, v in t.label_to_name.items()}
    model = JAXModel(
        cfg.model_name, str(exp_dir / "best.ckpt"),
        n_outputs=1 if t.use_one_class else len(label_to_name),
        input_height=t.img_size[0], input_width=t.img_size[1],
        conf_thresh=t.conf_thresh, keep_ratio=t.keep_ratio,
        enable_mask_head=cfg.task == "segment",
    )
    return model, label_to_name


def predict_and_draw(model, label_to_name, image_rgb: np.ndarray):
    from dfine_tpu.utils.viz import draw_detections

    bgr = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)
    t0 = time.perf_counter()
    (res,) = model(bgr)
    dt = (time.perf_counter() - t0) * 1000
    out = draw_detections(bgr, res["boxes"], res["labels"], res["scores"],
                          res.get("masks"), label_to_name)
    return cv2.cvtColor(out, cv2.COLOR_BGR2RGB), f"{len(res['labels'])} detections, {dt:.1f} ms"


def main(argv=None):
    from dfine_tpu.config import cli_config

    args = argv if argv is not None else sys.argv[1:]
    image_args = [a for a in args if a.lower().endswith(tuple(".jpg .jpeg .png".split()))]
    cfg = cli_config([a for a in args if a not in image_args])
    model, label_to_name = build_model_from_cfg(cfg)

    try:
        import gradio as gr
    except ImportError:
        gr = None

    if gr is not None and not image_args:
        def fn(img):
            out, txt = predict_and_draw(model, label_to_name, img)
            return out, txt

        gr.Interface(
            fn=fn, inputs=gr.Image(type="numpy"),
            outputs=[gr.Image(type="numpy"), gr.Text()],
            title="D-FINE-seg TPU demo",
        ).launch()
    else:
        if not image_args:
            print("gradio not installed; pass an image path for CLI mode")
            return
        for p in image_args:
            rgb = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            out, txt = predict_and_draw(model, label_to_name, rgb)
            dst = Path(p).with_suffix(".pred.jpg")
            cv2.imwrite(str(dst), cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
            print(f"{p}: {txt} -> {dst}")


if __name__ == "__main__":
    main()
