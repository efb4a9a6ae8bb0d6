"""Image/geometry augmentations in numpy+cv2 — albumentations replacement.

The reference composes an albumentations pipeline (src/dl/dataset.py:110-177
with knobs in config.yaml:91-103).  albumentations is not in this image, so
each op is implemented directly; geometric ops transform boxes (xyxy abs)
and polygons together so detection and segmentation share one path.

All functions take/return a ``Sample``-like dict:
  image:    HxWx3 uint8 (RGB)
  boxes:    [N,4] float32 xyxy absolute
  labels:   [N] int32
  polygons: list of [Pi,2] float32 absolute (segmentation only) or None
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import cv2
import numpy as np

from .labels import clip_polygon


# ------------------------------------------------------------- photometric


def aug_brightness_contrast(img, rng, limit=0.2):
    alpha = 1.0 + rng.uniform(-limit, limit)
    beta = rng.uniform(-limit, limit) * 255 * 0.5
    return np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)


def aug_gamma(img, rng, limit=(80, 120)):
    g = rng.uniform(*limit) / 100.0
    lut = (np.linspace(0, 1, 256) ** g * 255).astype(np.uint8)
    return lut[img]


def aug_blur(img, rng, max_k=7):
    k = int(rng.integers(1, max_k // 2 + 1)) * 2 + 1
    return cv2.GaussianBlur(img, (k, k), 0)


def aug_gauss_noise(img, rng, var_limit=(10.0, 50.0)):
    sigma = math.sqrt(rng.uniform(*var_limit))
    noise = rng.normal(0.0, sigma, img.shape).astype(np.float32)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def aug_to_gray(img, rng=None):
    g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return np.stack([g, g, g], -1)


def aug_coarse_dropout(img, rng, max_holes=8, max_frac=0.1):
    img = img.copy()
    h, w = img.shape[:2]
    for _ in range(int(rng.integers(1, max_holes + 1))):
        hh = int(rng.uniform(0.02, max_frac) * h)
        ww = int(rng.uniform(0.02, max_frac) * w)
        y = int(rng.integers(0, max(1, h - hh)))
        x = int(rng.integers(0, max(1, w - ww)))
        img[y : y + hh, x : x + ww] = 114
    return img


# --------------------------------------------------------------- geometric


def _apply_affine_to_geoms(sample, M, out_w, out_h, clip=True, min_size=2.0):
    """Transform boxes/polygons by a 2x3 affine M, clip, filter degenerates."""
    boxes = sample["boxes"]
    polys = sample.get("polygons")
    n = len(boxes)
    if n == 0:
        return sample

    if polys is not None:
        new_polys, new_boxes, keep = [], [], []
        for i, poly in enumerate(polys):
            pts = np.concatenate([poly, np.ones((len(poly), 1), np.float32)], 1) @ M.T
            if clip:
                pts = clip_polygon(pts, out_w, out_h)
            if len(pts) < 3:
                keep.append(False)
                new_polys.append(np.zeros((0, 2), np.float32))
                new_boxes.append([0, 0, 0, 0])
                continue
            x0, y0 = pts.min(0)
            x1, y1 = pts.max(0)
            keep.append((x1 - x0) >= min_size and (y1 - y0) >= min_size)
            new_polys.append(pts)
            new_boxes.append([x0, y0, x1, y1])
        keep = np.asarray(keep, bool)
        sample["boxes"] = np.asarray(new_boxes, np.float32).reshape(-1, 4)[keep]
        sample["labels"] = sample["labels"][keep]
        sample["polygons"] = [p for p, k in zip(new_polys, keep) if k]
        return sample

    corners = np.stack(
        [
            boxes[:, [0, 1]],
            boxes[:, [2, 1]],
            boxes[:, [2, 3]],
            boxes[:, [0, 3]],
        ],
        axis=1,
    )  # [N,4,2]
    ones = np.ones((n, 4, 1), np.float32)
    pts = np.concatenate([corners, ones], -1) @ M.T  # [N,4,2]
    x0 = pts[..., 0].min(1)
    y0 = pts[..., 1].min(1)
    x1 = pts[..., 0].max(1)
    y1 = pts[..., 1].max(1)
    if clip:
        x0, x1 = np.clip(x0, 0, out_w), np.clip(x1, 0, out_w)
        y0, y1 = np.clip(y0, 0, out_h), np.clip(y1, 0, out_h)
    new = np.stack([x0, y0, x1, y1], -1).astype(np.float32)
    keep = ((x1 - x0) >= min_size) & ((y1 - y0) >= min_size)
    sample["boxes"] = new[keep]
    sample["labels"] = sample["labels"][keep]
    return sample


def aug_hflip(sample, rng=None):
    h, w = sample["image"].shape[:2]
    sample["image"] = sample["image"][:, ::-1].copy()
    M = np.asarray([[-1, 0, w], [0, 1, 0]], np.float32)
    return _apply_affine_to_geoms(sample, M, w, h, clip=False)


def aug_vflip(sample, rng=None):
    h, w = sample["image"].shape[:2]
    sample["image"] = sample["image"][::-1].copy()
    M = np.asarray([[1, 0, 0], [0, -1, h]], np.float32)
    return _apply_affine_to_geoms(sample, M, w, h, clip=False)


def aug_rot90(sample, rng):
    k = int(rng.integers(1, 4))
    h, w = sample["image"].shape[:2]
    sample["image"] = np.ascontiguousarray(np.rot90(sample["image"], k))
    mats = {
        1: np.asarray([[0, 1, 0], [-1, 0, w]], np.float32),  # 90 ccw: (x,y)->(y, w-x)
        2: np.asarray([[-1, 0, w], [0, -1, h]], np.float32),
        3: np.asarray([[0, -1, h], [1, 0, 0]], np.float32),
    }
    ow, oh = (h, w) if k % 2 == 1 else (w, h)
    return _apply_affine_to_geoms(sample, mats[k], ow, oh, clip=False)


def aug_rotate(sample, rng, max_degrees: float):
    h, w = sample["image"].shape[:2]
    deg = rng.uniform(-max_degrees, max_degrees)
    M = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0).astype(np.float32)
    sample["image"] = cv2.warpAffine(
        sample["image"], M, (w, h), flags=cv2.INTER_LINEAR, borderValue=(114, 114, 114)
    )
    return _apply_affine_to_geoms(sample, M, w, h, clip=True)


def letterbox(
    image: np.ndarray, target_hw: Tuple[int, int], pad_value: int = 114, stride_align=None
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Aspect-preserving resize + pad (reference LetterboxRect,
    src/dl/utils.py:809-996).  Returns (image, scale, (pad_top, pad_left))."""
    th, tw = target_hw
    h, w = image.shape[:2]
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    if stride_align:
        th = math.ceil(nh / stride_align) * stride_align
        tw = math.ceil(nw / stride_align) * stride_align
    top = (th - nh) // 2
    left = (tw - nw) // 2
    out = np.full((th, tw, 3), pad_value, np.uint8)
    out[top : top + nh, left : left + nw] = resized
    return out, scale, (top, left)


def apply_letterbox_to_geoms(sample, scale: float, pad: Tuple[int, int]):
    M = np.asarray([[scale, 0, pad[1]], [0, scale, pad[0]]], np.float32)
    h, w = sample["image"].shape[:2]
    return _apply_affine_to_geoms(sample, M, w, h, clip=False)


def plain_resize(sample, target_hw: Tuple[int, int]):
    th, tw = target_hw
    h, w = sample["image"].shape[:2]
    sample["image"] = cv2.resize(sample["image"], (tw, th), interpolation=cv2.INTER_LINEAR)
    M = np.asarray([[tw / w, 0, 0], [0, th / h, 0]], np.float32)
    return _apply_affine_to_geoms(sample, M, tw, th, clip=False)


# ---------------------------------------------------------------- pipeline


def photometric_pipeline(sample: Dict, rng: np.random.Generator, augs) -> Dict:
    """Probability-gated photometric chain (knobs mirror config.yaml:91-103)."""
    img = sample["image"]
    if rng.uniform() < augs.get("brightness", 0):
        img = aug_brightness_contrast(img, rng)
    if rng.uniform() < augs.get("gamma", 0):
        img = aug_gamma(img, rng)
    if rng.uniform() < augs.get("blur", 0):
        img = aug_blur(img, rng)
    if rng.uniform() < augs.get("noise", 0):
        img = aug_gauss_noise(img, rng)
    if rng.uniform() < augs.get("to_gray", 0):
        img = aug_to_gray(img)
    if rng.uniform() < augs.get("coarse_dropout", 0):
        img = aug_coarse_dropout(img, rng)
    sample["image"] = img
    return sample


def geometric_pipeline(sample: Dict, rng: np.random.Generator, augs) -> Dict:
    if rng.uniform() < augs.get("left_right_flip", 0):
        sample = aug_hflip(sample)
    if rng.uniform() < augs.get("up_down_flip", 0):
        sample = aug_vflip(sample)
    if rng.uniform() < augs.get("rotate_90", 0):
        sample = aug_rot90(sample, rng)
    if rng.uniform() < augs.get("rotation_p", 0):
        sample = aug_rotate(sample, rng, augs.get("rotation_degree", 10))
    return sample
