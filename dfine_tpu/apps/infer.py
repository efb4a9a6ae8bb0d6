"""`make infer`: run a model over a folder of images / videos.

Capability mirror of reference src/infer-driven app (src/dl/infer.py:1-241):
visualized predictions, YOLO-format txt annotations (polygons when
task=segment), optional per-detection crops with configurable paddings, and
a label inventory file."""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np

IMG_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
VID_EXT = {".mp4", ".avi", ".mov", ".mkv"}


def _pad_box(box, pad_w, pad_h, w, h):
    x1, y1, x2, y2 = box
    if isinstance(pad_w, float):
        pw, ph = (x2 - x1) * pad_w, (y2 - y1) * pad_h
    else:
        pw, ph = pad_w, pad_h
    return (
        int(max(0, x1 - pw)),
        int(max(0, y1 - ph)),
        int(min(w, x2 + pw)),
        int(min(h, y2 + ph)),
    )


def run_images(model, paths, out_dir: Path, label_to_name, segment: bool,
               to_crop: bool, paddings):
    from dfine_tpu.data.labels import save_yolo_label_file
    from dfine_tpu.utils.viz import draw_detections

    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    (out_dir / "annotations").mkdir(exist_ok=True)
    if to_crop:
        (out_dir / "crops").mkdir(exist_ok=True)
    seen = set()
    for p in paths:
        img = cv2.imread(str(p))
        if img is None:
            continue
        (res,) = model(img)
        h, w = img.shape[:2]
        vis = draw_detections(img, res["boxes"], res["labels"], res["scores"],
                              res.get("masks"), label_to_name)
        cv2.imwrite(str(out_dir / "images" / p.name), vis)
        # YOLO annotations (normalized)
        if segment and "masks" in res:
            # every contour of a multi-part instance becomes a YOLO-seg line
            # (reference infer.py writes all polygons, not just the first)
            polys = []
            keep = []
            for i, m in enumerate(res["masks"]):
                for poly in model.mask2poly(m):
                    polys.append(poly / np.asarray([w, h], np.float32))
                    keep.append(i)
            save_yolo_label_file(out_dir / "annotations" / f"{p.stem}.txt",
                                 res["labels"][keep], polygons=polys)
        else:
            b = np.asarray(res["boxes"], np.float32)
            if len(b):
                boxes_n = np.stack(
                    [(b[:, 0] + b[:, 2]) / 2 / w, (b[:, 1] + b[:, 3]) / 2 / h,
                     (b[:, 2] - b[:, 0]) / w, (b[:, 3] - b[:, 1]) / h], -1)
            else:
                boxes_n = np.zeros((0, 4), np.float32)
            save_yolo_label_file(out_dir / "annotations" / f"{p.stem}.txt",
                                 res["labels"], boxes=boxes_n)
        for cls in res["labels"]:
            seen.add(int(cls))
        if to_crop:
            for i, box in enumerate(res["boxes"]):
                x1, y1, x2, y2 = _pad_box(box, paddings["w"], paddings["h"], w, h)
                crop = img[y1:y2, x1:x2]
                if crop.size:
                    name = label_to_name.get(int(res["labels"][i]), str(int(res["labels"][i])))
                    cv2.imwrite(str(out_dir / "crops" / f"{p.stem}_{i}_{name}.jpg"), crop)
    inv = out_dir / "labels.txt"
    inv.write_text("\n".join(label_to_name.get(c, str(c)) for c in sorted(seen)) + "\n")


def run_videos(model, paths, out_dir: Path, label_to_name):
    from dfine_tpu.utils.viz import draw_detections

    (out_dir / "videos").mkdir(parents=True, exist_ok=True)
    for p in paths:
        cap = cv2.VideoCapture(str(p))
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(
            str(out_dir / "videos" / f"{p.stem}_pred.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h),
        )
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            (res,) = model(frame)
            writer.write(draw_detections(frame, res["boxes"], res["labels"],
                                         res["scores"], res.get("masks"), label_to_name))
        cap.release()
        writer.release()


def main(argv=None):
    from dfine_tpu.config import cli_config, get_latest_experiment_dir
    from dfine_tpu.infer import JAXModel

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    t = cfg.train
    exp_dir = Path(t.path_to_save)
    if not exp_dir.exists():
        exp_dir = get_latest_experiment_dir(Path(t.path_to_save).parent, cfg.exp_name)
    label_to_name = {int(k): v for k, v in t.label_to_name.items()}
    model = JAXModel(
        cfg.model_name,
        str(exp_dir / "best.ckpt"),
        n_outputs=1 if t.use_one_class else len(label_to_name),
        input_height=t.img_size[0],
        input_width=t.img_size[1],
        conf_thresh=t.conf_thresh,
        keep_ratio=t.keep_ratio,
        enable_mask_head=cfg.task == "segment",
    )
    src = Path(t.path_to_test_data)
    files = sorted(src.iterdir()) if src.is_dir() else [src]
    images = [p for p in files if p.suffix.lower() in IMG_EXT]
    videos = [p for p in files if p.suffix.lower() in VID_EXT]
    out_dir = Path(t.infer_path)
    run_images(model, images, out_dir, label_to_name, cfg.task == "segment",
               bool(cfg.infer.to_crop), dict(cfg.infer.paddings))
    if videos:
        run_videos(model, videos, out_dir, label_to_name)
    print(f"infer done: {len(images)} images, {len(videos)} videos -> {out_dir}")


if __name__ == "__main__":
    main()
