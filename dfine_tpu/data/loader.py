"""Loader: CSV splits -> batched, prefetched numpy batches.

Mirrors the reference Loader (src/dl/dataset.py:449-615): ``train.csv /
val.csv / test.csv`` (headerless, column 0 = image filename) under the
dataset root with ``images/`` and ``labels/``; label statistics and
background counting; per-epoch reshuffle; multiscale collate (batch-level
size jitter ±{32,64}px, reference dataset.py:645-670).

torch's DataLoader is replaced by a thread-pool prefetcher: cv2/numpy
release the GIL, the per-sample work is C-bound, and the arrays feed
``jax.device_put`` directly — no worker processes or pinned-memory machinery
needed for a TPU host.
"""

from __future__ import annotations

import concurrent.futures as cf
import csv
import threading
from pathlib import Path
from queue import Empty, Full, Queue
from typing import Dict, Iterator, List, Optional

import numpy as np

from .dataset import DatasetConfig, DetectionDataset


def read_split_csv(path: Path) -> List[str]:
    names = []
    with open(path) as f:
        for row in csv.reader(f):
            if row:
                names.append(row[0].strip())
    return names


def _stack(batch: List[Dict]) -> Dict:
    out: Dict = {}
    t = {}
    for k in batch[0]:
        arrs = [b[k] for b in batch]
        stacked = np.stack(arrs, 0)
        if k == "image":
            out["images"] = stacked
        else:
            t[k] = stacked
    out["targets"] = t
    return out


class BatchIterator:
    """Iterates fixed-size batches with background prefetch."""

    def __init__(
        self,
        dataset: DetectionDataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 8,
        drop_last: bool = True,
        seed: int = 42,
        multiscale_prob: float = 0.0,
        prefetch: int = 4,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.multiscale_prob = multiscale_prob
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.ds.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict]:
        order = self._order()
        nb = len(self)
        rng = np.random.default_rng(self.seed * 7919 + self.epoch)
        base_hw = self.ds.cfg.img_size

        def batch_ids(i):
            return order[i * self.bs : (i + 1) * self.bs]

        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(item) -> bool:
            # Bounded put that re-checks stop so an early-exiting consumer
            # can never leave the producer blocked on a full queue forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except Full:
                    continue
            return False

        def producer():
            with cf.ThreadPoolExecutor(self.workers) as pool:
                for i in range(nb):
                    if stop.is_set():
                        break
                    ids = batch_ids(i)
                    if len(ids) < self.bs and self.drop_last:
                        break
                    # multiscale: jitter the whole batch's target size
                    # (reference dataset.py:645-670). Sizes are quantized to
                    # ±{32,64} so XLA sees at most 5 shapes.  The size is
                    # passed per __getitem__ call — never written to shared
                    # dataset state from this thread.
                    if self.ds.mode == "train" and rng.uniform() < self.multiscale_prob:
                        d = int(rng.choice([-64, -32, 0, 32, 64]))
                        hw = (base_hw[0] + d, base_hw[1] + d)
                    else:
                        hw = tuple(base_hw)
                    samples = list(
                        pool.map(lambda j: self.ds.__getitem__(j, img_size=hw), ids)
                    )
                    if not put_checked(_stack(samples)):
                        return
            put_checked(None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # Drain so a producer mid-put can observe stop and exit.
            while not q.empty():
                try:
                    q.get_nowait()
                except Empty:
                    break
            try:
                th.join(timeout=5.0)
            except Exception:
                pass  # interpreter teardown: threading internals may be gone


class Loader:
    """Split discovery + dataloaders + dataset statistics."""

    def __init__(self, data_path: Path, cfg_train: Dict, task: str = "detect"):
        self.root = Path(data_path)
        self.cfg_train = cfg_train
        label_to_name = cfg_train.get("label_to_name", {0: "object"})
        self.class_names = (
            ["target"] if cfg_train.get("use_one_class") else list(label_to_name.values())
        )
        self.task = task
        self.splits: Dict[str, List[str]] = {}
        for split in ("train", "val", "test"):
            p = self.root / f"{split}.csv"
            self.splits[split] = read_split_csv(p) if p.exists() else []
        if not self.splits["train"] or not self.splits["val"]:
            raise FileNotFoundError(f"train.csv and val.csv must exist in {self.root}")

        self.ds_cfg = DatasetConfig(
            img_size=tuple(cfg_train.get("img_size", (640, 640))),
            task=task,
            keep_ratio=cfg_train.get("keep_ratio", False),
            max_gt=cfg_train.get("max_gt", 100),
            use_one_class=cfg_train.get("use_one_class", False),
            seed=cfg_train.get("seed", 42),
            augs=dict(cfg_train.get("augs", {})),
            mosaic_augs=dict(cfg_train.get("mosaic_augs", {})),
            ignore_background_epochs=cfg_train.get("ignore_background_epochs", 0),
            epochs=cfg_train.get("epochs", 100),
            debug_img_path=str(cfg_train.get("debug_img_path", ""))
            if cfg_train.get("debug_img_processing")
            else "",
            cache_images_mb=int(cfg_train.get("cache_images_mb", 0)),
        )

    def dataset(self, split: str, mode: Optional[str] = None) -> DetectionDataset:
        import copy

        cfg = copy.deepcopy(self.ds_cfg)
        return DetectionDataset(self.root, self.splits[split], cfg, mode=mode or split)

    def build_dataloaders(self, batch_size: int, num_workers: int = 8):
        train = BatchIterator(
            self.dataset("train"),
            batch_size,
            shuffle=True,
            num_workers=num_workers,
            drop_last=True,
            seed=self.ds_cfg.seed,
            multiscale_prob=self.ds_cfg.augs.get("multiscale_prob", 0.0),
        )
        val = BatchIterator(
            self.dataset("val"), batch_size, shuffle=False, num_workers=num_workers,
            drop_last=False, seed=self.ds_cfg.seed,
        )
        test = (
            BatchIterator(
                self.dataset("test"), batch_size, shuffle=False, num_workers=num_workers,
                drop_last=False, seed=self.ds_cfg.seed,
            )
            if self.splits["test"]
            else None
        )
        return train, val, test

    # ----------------------------------------------------------- statistics

    def label_stats(self) -> Dict[str, int]:
        """Per-class instance counts over all splits (reference
        dataset.py:484-505)."""
        from .labels import parse_yolo_label_file

        counts = {c: 0 for c in self.class_names}
        for names in self.splits.values():
            for n in names:
                p = self.root / "labels" / (Path(n).stem + ".txt")
                labels, _, _ = parse_yolo_label_file(p, segment=self.task == "segment")
                for c in labels:
                    key = "target" if self.cfg_train.get("use_one_class") else (
                        self.class_names[int(c)] if int(c) < len(self.class_names) else str(c)
                    )
                    counts[key] = counts.get(key, 0) + 1
        return counts

    def background_count(self) -> int:
        """Images in splits without a (non-empty) label file
        (reference dataset.py:508-537)."""
        n = 0
        for names in self.splits.values():
            for name in names:
                p = self.root / "labels" / (Path(name).stem + ".txt")
                if not p.exists() or p.stat().st_size <= 1:
                    n += 1
        return n
