"""Data pipeline tests on a synthetic on-disk dataset."""

import csv
from pathlib import Path

import cv2
import numpy as np
import pytest

from dfine_tpu.data.augment import aug_hflip, aug_rot90, letterbox
from dfine_tpu.data.dataset import DatasetConfig, DetectionDataset
from dfine_tpu.data.labels import clip_polygon, parse_yolo_label_file, polygons_to_masks
from dfine_tpu.data.loader import Loader


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(root / "images" / name), img)
        names.append(name)
        lines = []
        for _ in range(int(rng.integers(0, 5))):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.1, 0.25, 2)
            cls = int(rng.integers(0, 3))
            lines.append(f"{cls} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        (root / "labels" / f"img_{i}.txt").write_text("\n".join(lines))
    with open(root / "train.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[:6]])
    with open(root / "val.csv", "w", newline="") as f:
        csv.writer(f).writerows([[n] for n in names[6:]])
    return root


def test_yolo_label_roundtrip(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("1 0.5 0.5 0.2 0.1\n0 0.1 0.2 0.05 0.05\n")
    labels, boxes, _ = parse_yolo_label_file(p)
    assert labels.tolist() == [1, 0]
    np.testing.assert_allclose(boxes[0], [0.5, 0.5, 0.2, 0.1])

    seg = tmp_path / "s.txt"
    seg.write_text("2 0.1 0.1 0.5 0.1 0.5 0.5 0.1 0.5\n")
    labels, boxes, polys = parse_yolo_label_file(seg, segment=True)
    assert len(polys) == 1 and polys[0].shape == (4, 2)
    np.testing.assert_allclose(boxes[0], [0.3, 0.3, 0.4, 0.4], atol=1e-6)


def test_dataset_static_shapes(dataset_dir):
    cfg = DatasetConfig(img_size=(320, 320), max_gt=10, augs={"left_right_flip": 1.0},
                        mosaic_augs={"mosaic_prob": 0.5}, epochs=10)
    ds = DetectionDataset(dataset_dir, [f"img_{i}.jpg" for i in range(6)], cfg, mode="train")
    for idx in range(len(ds)):
        s = ds[idx]
        assert s["image"].shape == (320, 320, 3)
        # uint8 contract: the model normalizes integer inputs in-graph
        assert s["image"].dtype == np.uint8
        assert s["labels"].shape == (10,)
        assert s["boxes"].shape == (10, 4)
        assert s["valid"].shape == (10,)
        b = s["boxes"][s["valid"]]
        assert (b >= 0).all() and (b <= 1).all()


def test_dataset_determinism(dataset_dir):
    cfg = DatasetConfig(img_size=(320, 320), max_gt=10, mosaic_augs={"mosaic_prob": 0.8},
                        epochs=10)
    ds = DetectionDataset(dataset_dir, [f"img_{i}.jpg" for i in range(6)], cfg, mode="train")
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["image"], b["image"])
    ds.set_epoch(1)
    c = ds[0]
    assert not np.array_equal(a["image"], c["image"])  # reseeded per epoch


def test_image_cache_transparent(dataset_dir):
    """cache_images_mb must not change any sample: cached (incl. warm-cache
    second epoch, where every load_raw is a hit) == uncached, with mosaic
    exercising concurrent multi-index reads."""
    names = [f"img_{i}.jpg" for i in range(6)]
    kw = dict(img_size=(320, 320), max_gt=10, epochs=10,
              augs={"left_right_flip": 0.5, "brightness": 0.5},
              mosaic_augs={"mosaic_prob": 0.7})
    plain = DetectionDataset(dataset_dir, names, DatasetConfig(**kw), mode="train")
    cached = DetectionDataset(
        dataset_dir, names, DatasetConfig(cache_images_mb=256, **kw), mode="train"
    )
    for epoch in (0, 1):  # epoch 1 = warm cache
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        for idx in range(len(names)):
            a, b = plain[idx], cached[idx]
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{epoch}/{idx}/{k}")
    assert cached._cache_bytes > 0  # the cache actually engaged


def test_loader_batches(dataset_dir):
    loader = Loader(dataset_dir, {"img_size": (320, 320), "max_gt": 10, "batch_size": 2,
                                  "label_to_name": {0: "a", 1: "b", 2: "c"}})
    train, val, test = loader.build_dataloaders(batch_size=2, num_workers=2)
    batches = list(iter(train))
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (2, 320, 320, 3)
    assert b["targets"]["boxes"].shape == (2, 10, 4)
    assert test is None
    stats = loader.label_stats()
    assert sum(stats.values()) > 0


def test_hflip_box_consistency():
    img = np.zeros((100, 200, 3), np.uint8)
    img[:, :50] = 255  # bright left strip
    s = {"image": img, "boxes": np.asarray([[0.0, 0.0, 50.0, 100.0]], np.float32),
         "labels": np.asarray([0], np.int32)}
    out = aug_hflip(s)
    np.testing.assert_allclose(out["boxes"][0], [150, 0, 200, 100])
    assert out["image"][:, 150:].mean() > 200


def test_rot90_box_consistency():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 200, 3), np.uint8)
    s = {"image": img, "boxes": np.asarray([[10.0, 20.0, 30.0, 40.0]], np.float32),
         "labels": np.asarray([0], np.int32)}
    out = aug_rot90(dict(s), np.random.default_rng(3))  # some k
    h2, w2 = out["image"].shape[:2]
    b = out["boxes"][0]
    assert 0 <= b[0] <= b[2] <= w2 + 1e-3
    assert 0 <= b[1] <= b[3] <= h2 + 1e-3
    # area preserved under rot90
    np.testing.assert_allclose((b[2] - b[0]) * (b[3] - b[1]), 20 * 20, rtol=1e-5)


def test_letterbox_geometry():
    img = np.full((100, 200, 3), 255, np.uint8)
    out, scale, (top, left) = letterbox(img, (64, 64))
    assert out.shape == (64, 64, 3)
    assert scale == 64 / 200
    assert top == (64 - 32) // 2 and left == 0
    assert (out[:top] == 114).all() and (out[top + 32 :] == 114).all()


def test_clip_polygon_and_rasterize():
    sq = np.asarray([[-10, -10], [50, -10], [50, 50], [-10, 50]], np.float32)
    clipped = clip_polygon(sq, 40, 40)
    assert clipped.min() >= -1e-6 and clipped.max() <= 40 + 1e-6
    m = polygons_to_masks([np.asarray([[0, 0], [40, 0], [40, 40], [0, 40]], np.float32)], 40, 40)
    assert m.shape == (1, 40, 40)
    assert m.mean() > 0.9
