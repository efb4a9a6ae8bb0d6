"""Trainer with data-parallel SPMD enabled, on the 8-virtual-device mesh."""

import csv

import cv2
import numpy as np
import pytest

from dfine_tpu.config import load_config


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("dpproj")
    ds = root / "data" / "dataset"
    (ds / "images").mkdir(parents=True)
    (ds / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(12):
        img = np.full((256, 256, 3), 40, np.uint8)
        cx, cy, s = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7), rng.uniform(0.2, 0.3)
        x0, y0 = int((cx - s / 2) * 256), int((cy - s / 2) * 256)
        x1, y1 = int((cx + s / 2) * 256), int((cy + s / 2) * 256)
        img[y0:y1, x0:x1] = (255, 90, 90)
        name = f"d{i}.jpg"
        cv2.imwrite(str(ds / "images" / name), img)
        (ds / "labels" / f"d{i}.txt").write_text(f"0 {cx:.4f} {cy:.4f} {s:.4f} {s:.4f}\n")
        names.append(name)
    with open(ds / "train.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[:8]])
    with open(ds / "val.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[8:]])
    return root


@pytest.mark.slow
def test_trainer_dp_one_epoch(project):
    import jax

    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    cfg = load_config("config.yaml", overrides=[
        f"train.root={project}",
        "model_name=n",
        "train.img_size=[256, 256]",
        "train.batch_size=8",  # 1 per device
        "train.epochs=1",
        "train.max_gt=4",
        "train.num_workers=2",
        "train.use_wandb=False",
        "train.label_to_name={0: box}",
        "train.dtype=float32",
        "exp_name=dpsmoke",
        "train.dp.enabled=true",
        "train.dp.n_devices=8",
        "train.mosaic_augs.mosaic_prob=0.0",
    ])
    from dfine_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    assert tr.dp_enabled
    final = tr.train()
    assert np.isfinite(final["val"]["f1"])
    assert (tr.path_to_save / "best.ckpt").exists()
