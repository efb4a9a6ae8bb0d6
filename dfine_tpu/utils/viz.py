"""Visualization: box/mask overlays for eval previews, debug dumps, infer
outputs (capability mirror of the reference's viz helpers in src/dl/utils.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import cv2
import numpy as np

_PALETTE = [
    (231, 76, 60), (46, 204, 113), (52, 152, 219), (155, 89, 182),
    (241, 196, 15), (230, 126, 34), (26, 188, 156), (149, 165, 166),
    (192, 57, 43), (39, 174, 96), (41, 128, 185), (142, 68, 173),
]


def color_for(cls: int):
    return _PALETTE[int(cls) % len(_PALETTE)]


def draw_detections(
    image_bgr: np.ndarray,
    boxes_xyxy: np.ndarray,
    labels: np.ndarray,
    scores: Optional[np.ndarray] = None,
    masks: Optional[np.ndarray] = None,
    label_to_name: Optional[Dict[int, str]] = None,
    thickness: int = 2,
) -> np.ndarray:
    img = image_bgr.copy()
    if masks is not None:
        overlay = img.copy()
        for i, m in enumerate(masks):
            c = color_for(labels[i])
            mm = m.astype(bool)
            overlay[mm] = (0.5 * np.asarray(c) + 0.5 * overlay[mm]).astype(np.uint8)
        img = overlay
    for i, b in enumerate(np.asarray(boxes_xyxy).astype(int)):
        c = color_for(labels[i])
        cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), c, thickness)
        name = (label_to_name or {}).get(int(labels[i]), str(int(labels[i])))
        txt = f"{name} {scores[i]:.2f}" if scores is not None else name
        cv2.putText(img, txt, (b[0], max(b[1] - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, c, 1, cv2.LINE_AA)
    return img


def save_eval_previews(
    out_dir: Path,
    name: str,
    image_rgb: np.ndarray,
    pred: Dict,
    gt: Dict,
    label_to_name: Optional[Dict[int, str]] = None,
) -> None:
    """Side-by-side GT vs prediction preview (reference train.py:401-409)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    bgr = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)
    left = draw_detections(
        bgr, gt["boxes"], gt["labels"], masks=gt.get("masks"), label_to_name=label_to_name
    )
    right = draw_detections(
        bgr, pred["boxes"], pred["labels"], pred.get("scores"), pred.get("masks"),
        label_to_name=label_to_name,
    )
    canvas = np.concatenate([left, right], axis=1)
    cv2.imwrite(str(out_dir / f"{name}.jpg"), canvas)
