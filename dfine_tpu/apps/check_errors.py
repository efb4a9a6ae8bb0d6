"""`make check_errors`: run the model (NMS on) over train+val, greedily
match predictions to GT per class, save FP and FN crops for label auditing
(capability mirror of reference src/dl/check_errors.py:1-261)."""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np


def save_case(img, box, out_dir: Path, name: str, pad: int = 20):
    h, w = img.shape[:2]
    x1, y1, x2, y2 = [int(v) for v in box]
    crop = img[max(0, y1 - pad) : min(h, y2 + pad), max(0, x1 - pad) : min(w, x2 + pad)]
    if crop.size:
        out_dir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out_dir / name), crop)


def check_results(model, ds, label_to_name, iou_thresh: float, out_root: Path, split: str):
    from dfine_tpu.eval.coco_map import box_iou_matrix

    n_fp = n_fn = 0
    for i in range(len(ds)):
        img_path, _ = ds._paths(i)
        img = cv2.imread(str(img_path))
        if img is None:
            continue
        (res,) = model(img)
        raw = ds.load_raw(i)
        gt_boxes, gt_labels = raw["boxes"], raw["labels"]
        iou = box_iou_matrix(np.asarray(res["boxes"], np.float32).reshape(-1, 4),
                             gt_boxes.reshape(-1, 4))
        matched_p, matched_g = set(), set()
        if iou.size:
            pi, gi = np.nonzero(iou >= iou_thresh)
            order = np.argsort(-iou[pi, gi])
            for p_idx, g_idx in zip(pi[order], gi[order]):
                if p_idx in matched_p or g_idx in matched_g:
                    continue
                if res["labels"][p_idx] == gt_labels[g_idx]:  # class-aware match
                    matched_p.add(int(p_idx))
                    matched_g.add(int(g_idx))
        for p_idx in set(range(len(res["labels"]))) - matched_p:
            cls = label_to_name.get(int(res["labels"][p_idx]), "?")
            save_case(img, res["boxes"][p_idx], out_root / split / "FP" / cls,
                      f"{img_path.stem}_{p_idx}.jpg")
            n_fp += 1
        for g_idx in set(range(len(gt_labels))) - matched_g:
            cls = label_to_name.get(int(gt_labels[g_idx]), "?")
            save_case(img, gt_boxes[g_idx], out_root / split / "FN" / cls,
                      f"{img_path.stem}_{g_idx}.jpg")
            n_fn += 1
    print(f"{split}: {n_fp} FP crops, {n_fn} FN crops -> {out_root / split}")


def main(argv=None):
    from dfine_tpu.config import cli_config, get_latest_experiment_dir
    from dfine_tpu.data.loader import Loader
    from dfine_tpu.infer import JAXModel

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    t = cfg.train
    exp_dir = Path(t.path_to_save)
    if not exp_dir.exists():
        exp_dir = get_latest_experiment_dir(Path(t.path_to_save).parent, cfg.exp_name)
    label_to_name = {int(k): v for k, v in t.label_to_name.items()}
    model = JAXModel(
        cfg.model_name, str(exp_dir / "best.ckpt"),
        n_outputs=1 if t.use_one_class else len(label_to_name),
        input_height=t.img_size[0], input_width=t.img_size[1],
        conf_thresh=t.conf_thresh, keep_ratio=t.keep_ratio, use_nms=True,
        enable_mask_head=cfg.task == "segment",
    )
    loader = Loader(Path(t.data_path), t, task=cfg.task)
    out_root = Path(t.root) / "output" / "check_errors"
    for split in ("train", "val"):
        check_results(model, loader.dataset(split, mode="bench"), label_to_name,
                      t.iou_thresh, out_root, split)


if __name__ == "__main__":
    main()
