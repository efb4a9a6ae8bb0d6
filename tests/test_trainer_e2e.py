"""End-to-end trainer smoke: tiny synthetic dataset, 2 epochs on CPU.

Covers the full pipeline: loader -> augs -> padded batches -> jitted train
step (model + CDN + criterion + on-device Hungarian + AdamW/EMA) -> eval ->
Validator -> checkpoints -> final extended eval + plots.
"""

import csv

import cv2
import numpy as np
import pytest

from dfine_tpu.config import ConfigNode, load_config


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    ds = root / "data" / "dataset"
    (ds / "images").mkdir(parents=True)
    (ds / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        img = np.full((256, 256, 3), 40, np.uint8)
        # draw 1-2 bright squares as objects
        lines = []
        for _ in range(int(rng.integers(1, 3))):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            s = rng.uniform(0.15, 0.3)
            x0, y0 = int((cx - s / 2) * 256), int((cy - s / 2) * 256)
            x1, y1 = int((cx + s / 2) * 256), int((cy + s / 2) * 256)
            cls = int(rng.integers(0, 2))
            img[y0:y1, x0:x1] = (255, 80, 80) if cls == 0 else (80, 80, 255)
            lines.append(f"{cls} {cx:.4f} {cy:.4f} {s:.4f} {s:.4f}")
        name = f"im{i}.jpg"
        cv2.imwrite(str(ds / "images" / name), img)
        (ds / "labels" / f"im{i}.txt").write_text("\n".join(lines))
        names.append(name)
    with open(ds / "train.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[:6]])
    with open(ds / "val.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[6:]])
    return root


@pytest.mark.slow
def test_trainer_two_epochs(project):
    cfg = load_config("config.yaml", overrides=[
        f"train.root={project}",
        "model_name=n",
        "train.img_size=[256, 256]",
        "train.batch_size=2",
        "train.epochs=2",
        "train.max_gt=8",
        "train.num_workers=2",
        "train.use_wandb=False",
        "train.to_visualize_eval=False",
        "train.label_to_name={0: red, 1: blue}",
        "train.dtype=float32",
        "exp_name=smoke",
        "train.mosaic_augs.mosaic_prob=0.5",
        "train.mosaic_augs.no_mosaic_epochs=1",
    ])
    assert isinstance(cfg, ConfigNode)
    assert cfg.train.base_lr == 0.0008  # n-size LR interpolated

    from dfine_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    final = tr.train()
    assert "val" in final
    assert np.isfinite(final["val"]["f1"])
    save_dir = tr.path_to_save
    assert (save_dir / "last.ckpt").exists()
    assert (save_dir / "best.ckpt").exists()
    assert (save_dir / "metrics.csv").exists()
    assert (save_dir / "extended_metrics.csv").exists()
    assert (save_dir / "plots" / "confusion_matrix.png").exists()
    assert (save_dir / "config.yaml").exists()

    # resume path: reload best checkpoint into a fresh trainer
    tr2 = Trainer(cfg)
    tr2.path_to_save = save_dir
    tr2.load_checkpoint("best")
    m = tr2.evaluate("val")
    assert np.isfinite(m["f1"])


@pytest.mark.slow
def test_quant_app_gate_and_artifact(project):
    """make-quant analog e2e: trained experiment -> int8 conversion -> gated
    val eval through the REAL int8 interceptor path -> export_int8.npz
    (reference ov_int8.py:130-139 accuracy-controlled quantization)."""
    cfg = load_config("config.yaml", overrides=[
        f"train.root={project}",
        "model_name=n",
        "train.img_size=[256, 256]",
        "train.batch_size=2",
        "train.epochs=1",
        "train.max_gt=8",
        "train.num_workers=2",
        "train.use_wandb=False",
        "train.to_visualize_eval=False",
        "train.label_to_name={0: red, 1: blue}",
        "train.dtype=float32",
        "exp_name=quantsmoke",
        "train.mosaic_augs.mosaic_prob=0.0",
        # random-ish net: accept any drop so the app reaches the save step
        "export.int8_max_drop=1.0",
    ])
    from dfine_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    tr.train()

    from dfine_tpu.apps import quant

    quant.main([
        f"train.root={project}",
        "model_name=n",
        "train.img_size=[256, 256]",
        "train.batch_size=2",
        "train.max_gt=8",
        "train.num_workers=2",
        "train.use_wandb=False",
        "train.to_visualize_eval=False",
        "train.label_to_name={0: red, 1: blue}",
        "train.dtype=float32",
        "exp_name=quantsmoke",
        "export.int8_max_drop=1.0",
    ])
    npz = tr.path_to_save / "export_int8.npz"
    assert npz.exists()
    # round-trip: Int8Model must serve the artifact (already-int8 guard)
    from dfine_tpu.infer import Int8Model

    m = Int8Model("n", str(npz), n_outputs=2, input_width=256,
                  input_height=256, conf_thresh=0.05, half=False)
    (res,) = m(np.random.randint(0, 255, (256, 256, 3), np.uint8))
    assert set(res) >= {"labels", "boxes", "scores"}
