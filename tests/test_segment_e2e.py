"""Segmentation end-to-end smoke: polygons -> mask losses -> mask metrics."""

import csv

import cv2
import numpy as np
import pytest

from dfine_tpu.config import load_config


@pytest.fixture(scope="module")
def seg_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("segproj")
    ds = root / "data" / "dataset"
    (ds / "images").mkdir(parents=True)
    (ds / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(6):
        img = np.full((256, 256, 3), 30, np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 3))):
            cx, cy = rng.uniform(0.35, 0.65, 2)
            r = rng.uniform(0.08, 0.15)
            # octagon polygon
            ang = np.linspace(0, 2 * np.pi, 9)[:-1]
            px = cx + r * np.cos(ang)
            py = cy + r * np.sin(ang)
            pts = np.stack([px, py], -1)
            cv2.fillPoly(img, [np.round(pts * 256).astype(np.int32)], (200, 120, 60))
            lines.append("0 " + " ".join(f"{v:.4f}" for v in pts.reshape(-1)))
        name = f"s{i}.jpg"
        cv2.imwrite(str(ds / "images" / name), img)
        (ds / "labels" / f"s{i}.txt").write_text("\n".join(lines))
        names.append(name)
    with open(ds / "train.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[:4]])
    with open(ds / "val.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[4:]])
    return root


def test_segment_dataset_masks(seg_project):
    from dfine_tpu.data.dataset import DatasetConfig, DetectionDataset

    cfg = DatasetConfig(img_size=(256, 256), task="segment", max_gt=6)
    ds = DetectionDataset(seg_project / "data" / "dataset",
                          [f"s{i}.jpg" for i in range(4)], cfg, mode="train")
    s = ds[0]
    assert s["masks"].shape == (6, 64, 64)  # stride-4 mask targets
    n_valid = s["valid"].sum()
    assert s["masks"][:n_valid].sum() > 0  # polygons rasterized
    assert s["masks"][n_valid:].sum() == 0


@pytest.mark.slow
def test_segment_training_one_epoch(seg_project):
    cfg = load_config("config.yaml", overrides=[
        f"train.root={seg_project}",
        "task=segment",
        "model_name=n",
        "train.img_size=[256, 256]",
        "train.batch_size=2",
        "train.epochs=1",
        "train.max_gt=6",
        "train.num_workers=2",
        "train.use_wandb=False",
        "train.label_to_name={0: blob}",
        "train.dtype=float32",
        "exp_name=segsmoke",
        "train.mosaic_augs.mosaic_prob=0.0",
        "train.conf_thresh=0.05",
    ])
    from dfine_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    assert tr.segment
    final = tr.train()
    assert np.isfinite(final["val"]["f1"])
    # mask metrics MUST be produced — the synthetic set always has GT masks
    assert "mAP_50_mask" in final["val"]
    assert np.isfinite(final["val"]["mAP_50_mask"])
