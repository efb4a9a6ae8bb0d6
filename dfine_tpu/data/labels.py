"""YOLO-format label IO and polygon helpers.

Data contract (reference README.md:57-69, src/dl/dataset.py:31-73):
detection rows are ``cls xc yc w h`` (normalized cxcywh); segmentation rows
are ``cls x1 y1 x2 y2 ...`` normalized polygon vertices, and boxes are
derived from the polygon extent.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np


def parse_yolo_label_file(
    path: str | Path, segment: bool = False
) -> Tuple[np.ndarray, np.ndarray, Optional[List[np.ndarray]]]:
    """Returns (labels [N] int32, boxes [N,4] cxcywh normalized,
    polygons list of [Pi,2] normalized or None)."""
    labels, boxes, polys = [], [], []
    p = Path(path)
    if not p.exists():
        return np.zeros((0,), np.int32), np.zeros((0, 4), np.float32), ([] if segment else None)
    for line in p.read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        cls = int(float(parts[0]))
        vals = np.asarray([float(v) for v in parts[1:]], np.float32)
        if len(vals) >= 6:
            # polygon row: box from extent, in BOTH tasks — the reference
            # parses YOLO-Seg rows regardless of task (dataset.py:31-73;
            # task only controls return_masks, :95).  Odd coordinate count
            # drops the trailing value (reference :54-58).
            if len(vals) % 2 == 1:
                vals = vals[:-1]
            poly = vals.reshape(-1, 2)
            x0, y0 = poly.min(0)
            x1, y1 = poly.max(0)
            boxes.append([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0])
            if segment:
                polys.append(poly)
        elif len(vals) == 4:
            boxes.append(vals.tolist())
            if segment:
                # box-only row in a segmentation dataset: rectangle polygon
                xc, yc, w, h = vals
                polys.append(
                    np.asarray(
                        [
                            [xc - w / 2, yc - h / 2],
                            [xc + w / 2, yc - h / 2],
                            [xc + w / 2, yc + h / 2],
                            [xc - w / 2, yc + h / 2],
                        ],
                        np.float32,
                    )
                )
        else:
            continue
        labels.append(cls)
    return (
        np.asarray(labels, np.int32),
        np.asarray(boxes, np.float32).reshape(-1, 4),
        polys if segment else None,
    )


def save_yolo_label_file(path: str | Path, labels, boxes=None, polygons=None) -> None:
    """Inverse of parse (used by infer's annotation dump, reference infer.py)."""
    lines = []
    for i, cls in enumerate(labels):
        if polygons is not None:
            pts = " ".join(f"{v:.6f}" for v in np.asarray(polygons[i]).reshape(-1))
            lines.append(f"{int(cls)} {pts}")
        else:
            b = boxes[i]
            lines.append(f"{int(cls)} {b[0]:.6f} {b[1]:.6f} {b[2]:.6f} {b[3]:.6f}")
    Path(path).write_text("\n".join(lines) + ("\n" if lines else ""))


def polygons_to_masks(
    polygons: List[np.ndarray], h: int, w: int, scale: float = 1.0
) -> np.ndarray:
    """Rasterize absolute-pixel polygons to per-instance binary masks
    (reference src/dl/utils.py:1009-1014 uses cv2.fillPoly the same way).
    ``scale`` renders at a reduced resolution (mask targets live at the
    prediction stride so the criterion never resizes)."""
    hh, ww = int(round(h * scale)), int(round(w * scale))
    out = np.zeros((len(polygons), hh, ww), np.uint8)
    for i, poly in enumerate(polygons):
        if len(poly) < 3:
            continue
        pts = np.round(np.asarray(poly, np.float32) * scale).astype(np.int32)
        cv2.fillPoly(out[i], [pts], 1)
    return out


def clip_polygon(poly: np.ndarray, w: float, h: float) -> np.ndarray:
    """Sutherland–Hodgman clip of an absolute-pixel polygon to [0,w]x[0,h]
    (capability mirror of reference src/dl/utils.py:219-274)."""
    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def ix(p1, p2, axis, val):
        t = (val - p1[axis]) / (p2[axis] - p1[axis] + 1e-12)
        q = p1 + t * (p2 - p1)
        q[axis] = val
        return q

    pts = [p.astype(np.float64) for p in np.asarray(poly, np.float64)]
    for axis, val, keep_ge in ((0, 0.0, True), (0, float(w), False),
                               (1, 0.0, True), (1, float(h), False)):
        if not pts:
            break
        if keep_ge:
            pts = clip_edge(pts, lambda p: p[axis] >= val, lambda a, b: ix(a, b, axis, val))
        else:
            pts = clip_edge(pts, lambda p: p[axis] <= val, lambda a, b: ix(a, b, axis, val))
    return np.asarray(pts, np.float32).reshape(-1, 2)
