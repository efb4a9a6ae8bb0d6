"""Helper: instantiate the upstream torch reference model inside this image.

Used ONLY by parity tests (tests/test_torch_parity.py) as the ground truth
for checkpoint-import equivalence — the BASELINE north star requires our
model to reproduce reference outputs given reference weights.  The reference
needs loguru and torchvision which are not installed; both are stubbed with
the minimal surface the arch code touches."""

from __future__ import annotations

import sys
import types
from copy import deepcopy


def _install_stubs():
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, _):
                return lambda *a, **k: None

        loguru.logger = _L()
        sys.modules["loguru"] = loguru
    if "torchvision" not in sys.modules:
        import torch

        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        boxes_mod = types.ModuleType("torchvision.ops.boxes")

        def box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2, reduction="none"):
            p = torch.sigmoid(inputs)
            ce = torch.nn.functional.binary_cross_entropy_with_logits(
                inputs, targets, reduction="none"
            )
            p_t = p * targets + (1 - p) * (1 - targets)
            loss = ce * ((1 - p_t) ** gamma)
            if alpha >= 0:
                a_t = alpha * targets + (1 - alpha) * (1 - targets)
                loss = a_t * loss
            return loss

        def nms(boxes, scores, iou_threshold):
            import torch as t

            keep = []
            idx = scores.argsort(descending=True)
            while idx.numel() > 0:
                i = idx[0]
                keep.append(i)
                if idx.numel() == 1:
                    break
                rest = idx[1:]
                xx1 = t.maximum(boxes[i, 0], boxes[rest, 0])
                yy1 = t.maximum(boxes[i, 1], boxes[rest, 1])
                xx2 = t.minimum(boxes[i, 2], boxes[rest, 2])
                yy2 = t.minimum(boxes[i, 3], boxes[rest, 3])
                inter = (xx2 - xx1).clamp(0) * (yy2 - yy1).clamp(0)
                a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                a2 = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
                iou = inter / (a1 + a2 - inter)
                idx = rest[iou <= iou_threshold]
            return t.stack(keep)

        boxes_mod.box_area = box_area
        ops.boxes = boxes_mod
        ops.sigmoid_focal_loss = sigmoid_focal_loss
        ops.nms = nms
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes_mod


def build_reference_model(
    size: str,
    num_classes: int,
    enable_mask_head: bool = False,
    decoder_overrides: dict | None = None,
):
    """Returns the reference torch DFINE model (random init, eval mode)."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    from src.d_fine.arch.dfine_decoder import DFINETransformer
    from src.d_fine.arch.hgnetv2 import HGNetv2
    from src.d_fine.arch.hybrid_encoder import HybridEncoder
    from src.d_fine.configs import models
    from src.d_fine.dfine import DFINE

    cfg = deepcopy(models[size])
    cfg["HGNetv2"]["pretrained"] = False
    cfg["HybridEncoder"]["eval_spatial_size"] = None
    cfg["DFINETransformer"]["eval_spatial_size"] = None
    cfg["DFINETransformer"]["enable_mask_head"] = enable_mask_head
    if decoder_overrides:
        cfg["DFINETransformer"].update(decoder_overrides)
    torch.manual_seed(0)
    model = DFINE(
        HGNetv2(**cfg["HGNetv2"]),
        HybridEncoder(**cfg["HybridEncoder"]),
        DFINETransformer(num_classes=num_classes, **cfg["DFINETransformer"]),
    )
    return model.eval()
