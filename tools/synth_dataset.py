"""Deterministic synthetic det+seg dataset generator (shapes on noise).

Produces the reference data layout (README.md:57-69): ``root/images/*.jpg``,
``root/labels/*.txt`` (YOLO-seg polygon rows ``cls x1 y1 x2 y2 ...``
normalized), ``train.csv`` / ``val.csv`` (headerless, col 0 = filename).

3 classes with class-correlated but jittered colors:
  0 = ellipse, 1 = rectangle (rotated), 2 = triangle.
Used by tools/convergence_parity.py to train BOTH frameworks on identical
data (VERDICT round-2 item #1).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

BASE_COLORS = {
    0: (60, 80, 200),   # reddish (BGR)
    1: (70, 190, 90),   # green
    2: (200, 120, 60),  # blue
}


def _poly_for_shape(rng, cls, cx, cy, r, img):
    if cls == 0:  # ellipse -> 16-gon outline
        a, b = r, r * rng.uniform(0.5, 1.0)
        ang = rng.uniform(0, np.pi)
        t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        x = a * np.cos(t)
        y = b * np.sin(t)
        xr = cx + x * np.cos(ang) - y * np.sin(ang)
        yr = cy + x * np.sin(ang) + y * np.cos(ang)
        return np.stack([xr, yr], 1)
    if cls == 1:  # rotated rectangle
        w, h = r, r * rng.uniform(0.4, 1.0)
        ang = rng.uniform(0, np.pi)
        base = np.asarray([[-w, -h], [w, -h], [w, h], [-w, h]], np.float64)
        rot = np.asarray(
            [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        )
        return base @ rot.T + [cx, cy]
    # triangle
    t = np.sort(rng.uniform(0, 2 * np.pi, 3))
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], 1)


def _poly_many(rng, cls, cx, cy, r, n_classes):
    """>3-class mode: class = (shape family, hue) pair.  7 polygon families
    keep instances geometrically distinct; hue separates families' reuse."""
    fam = cls % 7
    if fam < 3:
        return _poly_for_shape(rng, fam, cx, cy, r, None)
    ang0 = rng.uniform(0, 2 * np.pi)
    if fam == 3:  # 5-point star
        t = ang0 + np.arange(10) * np.pi / 5
        rad = np.where(np.arange(10) % 2 == 0, r, 0.45 * r)
        return np.stack([cx + rad * np.cos(t), cy + rad * np.sin(t)], 1)
    if fam == 4:  # regular pentagon
        t = ang0 + np.arange(5) * 2 * np.pi / 5
        return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], 1)
    if fam == 5:  # plus-sign cross
        a = r * rng.uniform(0.3, 0.45)
        pts = np.asarray([
            [-a, -r], [a, -r], [a, -a], [r, -a], [r, a], [a, a],
            [a, r], [-a, r], [-a, a], [-r, a], [-r, -a], [-a, -a],
        ], np.float64)
        c, s_ = np.cos(ang0), np.sin(ang0)
        return pts @ np.asarray([[c, -s_], [s_, c]]).T + [cx, cy]
    # fam 6: diamond (tall rhombus)
    w = r * rng.uniform(0.4, 0.7)
    pts = np.asarray([[0, -r], [w, 0], [0, r], [-w, 0]], np.float64)
    c, s_ = np.cos(ang0), np.sin(ang0)
    return pts @ np.asarray([[c, -s_], [s_, c]]).T + [cx, cy]


def _class_color(cls: int, n_classes: int) -> np.ndarray:
    """Distinct BGR per class: hue spread over the wheel (HSV, OpenCV)."""
    if n_classes <= 3:
        return np.asarray(BASE_COLORS[cls], np.float64)
    hue = int(round(cls * 180.0 / n_classes))
    hsv = np.asarray([[[hue, 200, 200]]], np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0].astype(np.float64)


def make_image(rng, img_size: int, max_shapes: int = 5, n_classes: int = 3,
               min_r: float = 0.06, max_r: float = 0.18):
    """Returns (bgr uint8 [S,S,3], list of (cls, poly_norm [P,2])).

    n_classes<=3 reproduces the r3 generator byte-identically (same rng
    draw sequence); larger values use 7 polygon families x hue palette with
    variable instance density (VERDICT r3 item #2: ~20 classes)."""
    s = img_size
    if n_classes <= 3:
        # legacy path: keep the exact rng draw sequence + float64 math so
        # r3/r4 parity datasets stay byte-reproducible
        img = rng.integers(90, 150, size=(s, s, 3)).astype(np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 3)
        noise = rng.normal(0, 12, size=(s, s, 3))
        img = np.clip(img.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    else:
        # fast path (new datasets only): float32 noise + uint8 draws are
        # ~2x faster per image on the 1-core host; same visual statistics
        img = rng.integers(90, 150, size=(s, s, 3), dtype=np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 3)
        noise = rng.standard_normal((s, s, 3), dtype=np.float32) * 12
        img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)

    n = int(rng.integers(1, max_shapes + 1))
    anns = []
    occupied = np.zeros((s, s), bool)
    for _ in range(n):
        cls = int(rng.integers(0, n_classes))
        r = rng.uniform(min_r, max_r) * s
        cx = rng.uniform(r + 2, s - r - 2)
        cy = rng.uniform(r + 2, s - r - 2)
        if n_classes <= 3:
            poly = _poly_for_shape(rng, cls, cx, cy, r, s)
        else:
            poly = _poly_many(rng, cls, cx, cy, r, n_classes)
        poly = np.clip(poly, 1, s - 2)
        mask = np.zeros((s, s), np.uint8)
        cv2.fillPoly(mask, [poly.astype(np.int32)], 1)
        if (mask & occupied).sum() > 0.3 * max(mask.sum(), 1):
            continue  # too much overlap: skip (keeps instances separable)
        occupied |= mask.astype(bool)
        color = _class_color(cls, n_classes)
        color = np.clip(color + rng.normal(0, 18, 3), 0, 255)
        img[mask.astype(bool)] = color.astype(np.uint8)
        anns.append((cls, poly / s))
    # mild global photometric jitter
    gain = rng.uniform(0.9, 1.1)
    img = np.clip(img.astype(np.float64) * gain, 0, 255).astype(np.uint8)
    return img, anns


def generate(root: Path, n_train: int, n_val: int, img_size: int = 320, seed: int = 0,
             n_classes: int = 3, max_shapes: int = 5,
             min_r: float = 0.06, max_r: float = 0.18,
             per_image_seed: bool = False, resume: bool = False,
             log_every: int = 0):
    """Write the dataset; returns {"train": names, "val": names}.

    ``per_image_seed=True`` derives an independent rng per image from
    (seed, split, index), which makes generation order-free and therefore
    RESUMABLE: with ``resume=True`` images whose jpg+txt already exist are
    skipped at zero cost (VERDICT r4 weak #6: the r4 north-star gen died at
    3046/6000 and a restart wasted all of it).  The default (False) keeps
    the original single-sequential-rng draw order so existing r3/r4 parity
    datasets stay byte-reproducible.  CSVs are written LAST in both modes,
    so a train.csv/val.csv pair on disk certifies a complete dataset.
    """
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)
    if resume and not per_image_seed:
        raise ValueError("resume requires per_image_seed (sequential-rng "
                         "draws cannot skip images without replaying them)")
    rng = np.random.default_rng(seed)
    names = {"train": [], "val": []}
    for si, (split, count) in enumerate((("train", n_train), ("val", n_val))):
        for i in range(count):
            name = f"{split}_{i:05d}.jpg"
            img_p = root / "images" / name
            lbl_p = root / "labels" / (Path(name).stem + ".txt")
            names[split].append(name)
            if per_image_seed:
                if resume and img_p.exists() and lbl_p.exists():
                    continue
                rng_i = np.random.default_rng([seed, si, i])
            else:
                rng_i = rng
            img, anns = make_image(rng_i, img_size, max_shapes, n_classes,
                                   min_r, max_r)
            cv2.imwrite(str(img_p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
            lines = []
            for cls, poly in anns:
                coords = " ".join(f"{v:.6f}" for v in poly.reshape(-1))
                lines.append(f"{cls} {coords}")
            lbl_p.write_text("\n".join(lines))
            if log_every and (i + 1) % log_every == 0:
                print(f"{split}: {i + 1}/{count}", flush=True)
    for split in names:
        (root / f"{split}.csv").write_text("\n".join(names[split]) + "\n")
    return names


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=320)
    ap.add_argument("--n-val", type=int, default=80)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-classes", type=int, default=3)
    ap.add_argument("--max-shapes", type=int, default=5)
    ap.add_argument("--min-r", type=float, default=0.06)
    ap.add_argument("--max-r", type=float, default=0.18)
    ap.add_argument("--per-image-seed", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log-every", type=int, default=0)
    a = ap.parse_args()
    names = generate(Path(a.root), a.n_train, a.n_val, a.img_size, a.seed,
                     a.n_classes, a.max_shapes, a.min_r, a.max_r,
                     per_image_seed=a.per_image_seed, resume=a.resume,
                     log_every=a.log_every)
    print(f"wrote {len(names['train'])} train / {len(names['val'])} val to {a.root}")
