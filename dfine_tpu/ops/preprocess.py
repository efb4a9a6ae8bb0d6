"""On-device preprocessing — uint8 image -> network input inside the graph.

The reference preprocesses on CPU with cv2 (resize/letterbox, /255,
HWC->CHW; src/infer/torch_model.py:247-301) and ships float32 to the
device.  The TPU-native design fuses preprocessing INTO the jitted program:
the host sends the raw uint8 frame (4x smaller transfer) and XLA fuses
resize+scale+pad into the first conv's producers.  This is the BASELINE
north star's "preprocessing-to-prediction is one XLA program".

Semantics: bilinear resize with half-pixel centers = cv2.INTER_LINEAR.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """[..., H, W, C] float -> [..., h, w, C]; matches cv2.INTER_LINEAR
    (half-pixel centers, NO anti-aliasing on downscale — cv2 doesn't
    anti-alias, and jax.image.resize does by default)."""
    shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1])
    return jax.image.resize(img, shape, method="linear", antialias=False)


def preprocess_plain(
    raw: jnp.ndarray,  # [B, H, W, 3] uint8 RGB
    out_hw: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    x = raw.astype(jnp.float32) / 255.0
    return resize_bilinear(x, out_hw).astype(dtype)


def preprocess_letterbox(
    raw: jnp.ndarray,  # [B, H, W, 3] uint8 RGB (static H, W)
    out_hw: Tuple[int, int],
    pad_value: float = 114.0 / 255.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Aspect-preserving resize + center pad, all static-shape (input H, W
    are compile-time constants per jit specialization)."""
    b, h, w, c = raw.shape
    th, tw = out_hw
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = raw.astype(jnp.float32) / 255.0
    x = resize_bilinear(x, (nh, nw))
    top = (th - nh) // 2
    left = (tw - nw) // 2
    out = jnp.full((b, th, tw, c), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, x, (0, top, left, 0))
    return out.astype(dtype)
