"""ETL: create train/val/test CSV splits (reference src/etl/split.py:10-76)."""

from __future__ import annotations

import csv
import sys
from pathlib import Path

import numpy as np

IMG_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def split_dataset(
    data_path: Path,
    train_split: float = 0.85,
    val_split: float = 0.15,
    shuffle: bool = True,
    ignore_negatives: bool = False,
    seed: int = 42,
):
    data_path = Path(data_path)
    images = sorted(
        p.name for p in (data_path / "images").iterdir() if p.suffix.lower() in IMG_EXT
    )
    if ignore_negatives:
        images = [
            n for n in images
            if (data_path / "labels" / (Path(n).stem + ".txt")).exists()
            and (data_path / "labels" / (Path(n).stem + ".txt")).stat().st_size > 1
        ]
    if shuffle:
        np.random.default_rng(seed).shuffle(images)
    n = len(images)
    n_train = int(n * train_split)
    n_val = int(n * val_split)
    splits = {
        "train": images[:n_train],
        "val": images[n_train : n_train + n_val],
        "test": images[n_train + n_val :],
    }
    for name, rows in splits.items():
        if not rows and name == "test":
            continue
        with open(data_path / f"{name}.csv", "w", newline="") as f:
            csv.writer(f).writerows([[r] for r in rows])
        print(f"{name}: {len(rows)}")
    return splits


def main(argv=None):
    from dfine_tpu.config import cli_config

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    split_dataset(
        Path(cfg.train.data_path),
        cfg.split.train_split,
        cfg.split.val_split,
        cfg.split.shuffle,
        cfg.split.ignore_negatives,
        cfg.train.seed,
    )


if __name__ == "__main__":
    main()
