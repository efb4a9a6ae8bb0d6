"""ETL: normalize a raw image dump into the dataset layout.

Capability mirror of reference src/etl/preprocess.py:12-84: convert any
image format to .jpg (EXIF-transposed), drop unreadable files, remove empty
label files; parallel over a process pool."""

from __future__ import annotations

import sys
from multiprocessing import Pool
from pathlib import Path

from PIL import Image, ImageOps

IMG_EXT = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff", ".heic", ".heif"}


def convert_one(args):
    src, dst_dir = args
    try:
        img = Image.open(src)
        img = ImageOps.exif_transpose(img)
        img = img.convert("RGB")
        out = dst_dir / (src.stem + ".jpg")
        img.save(out, quality=95)
        if src.suffix.lower() != ".jpg" or src.parent != dst_dir:
            pass
        return None
    except Exception as e:
        return f"{src}: {e}"


def preprocess(images_dir: Path, labels_dir: Path = None, workers: int = 8):
    images_dir = Path(images_dir)
    srcs = [p for p in images_dir.iterdir() if p.suffix.lower() in IMG_EXT]
    with Pool(workers) as pool:
        errors = [e for e in pool.map(convert_one, [(p, images_dir) for p in srcs]) if e]
    # remove originals that were converted to .jpg
    for p in srcs:
        if p.suffix.lower() != ".jpg":
            p.unlink(missing_ok=True)
    if labels_dir and Path(labels_dir).exists():
        for lp in Path(labels_dir).glob("*.txt"):
            if lp.stat().st_size <= 1:
                lp.unlink()
    for e in errors:
        print("ERROR", e)
    print(f"converted {len(srcs) - len(errors)} images, {len(errors)} errors")


def main(argv=None):
    from dfine_tpu.config import cli_config

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    root = Path(cfg.train.data_path)
    preprocess(root / "images", root / "labels", workers=cfg.train.num_workers)


if __name__ == "__main__":
    main()
