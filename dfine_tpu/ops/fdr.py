"""Fine-grained Distribution Refinement (FDR) math.

Re-derivation of the reference's FDR utilities (reference:
src/d_fine/arch/utils.py:119-354) as pure-JAX, jit-safe functions.

FDR predicts, for each of the four box edges, a discrete probability
distribution over ``reg_max + 1`` bins; the box offset is the expectation of
the non-uniform bin-center sequence W(n) ("weighting function").  Offsets are
measured in units of (w/reg_scale, h/reg_scale) of the reference box, shifted
by 0.5*reg_scale (see distance2bbox).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import box_xyxy_to_cxcywh


def weighting_function(reg_max: int, up: float, reg_scale: float) -> jnp.ndarray:
    """Non-uniform bin values W(n), shape [reg_max + 1].

    Layout (reference arch/utils.py:145-188):
      [-2*U, -(s^(k-1)-1), ..., -(s-1), 0, s-1, ..., s^(k-1)-1, 2*U]
    with U = |up|*|reg_scale|, k = reg_max//2, s = (U+1)^(2/(reg_max-2)).
    Static python floats feed jnp.array -> this is a compile-time constant
    whenever reg_max/up/reg_scale are static (always true in this codebase).
    """
    up = abs(float(up))
    reg_scale = abs(float(reg_scale))
    ub1 = up * reg_scale
    ub2 = up * reg_scale * 2
    step = (ub1 + 1) ** (2 / (reg_max - 2))
    left = [-((step) ** i) + 1 for i in range(reg_max // 2 - 1, 0, -1)]
    right = [(step) ** i - 1 for i in range(1, reg_max // 2)]
    values = [-ub2] + left + [0.0] + right + [ub2]
    return jnp.asarray(values, dtype=jnp.float32)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray, reg_scale: float) -> jnp.ndarray:
    """Decode edge-distances into boxes (reference arch/utils.py:119-142).

    points: [..., 4] cxcywh reference boxes; distance: [..., 4] l/t/r/b in
    W(n) units.  Returns cxcywh.
    """
    reg_scale = abs(float(reg_scale))
    sx = points[..., 2] / reg_scale
    sy = points[..., 3] / reg_scale
    x1 = points[..., 0] - (0.5 * reg_scale + distance[..., 0]) * sx
    y1 = points[..., 1] - (0.5 * reg_scale + distance[..., 1]) * sy
    x2 = points[..., 0] + (0.5 * reg_scale + distance[..., 2]) * sx
    y2 = points[..., 1] + (0.5 * reg_scale + distance[..., 3]) * sy
    return box_xyxy_to_cxcywh(jnp.stack([x1, y1, x2, y2], axis=-1))


def integral(corners: jnp.ndarray, project: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Softmax-expectation over bins (reference dfine_decoder.py:274-295).

    corners: [..., 4*(reg_max+1)] logits; project: [reg_max+1] W(n) values.
    Returns [..., 4] expected offsets.  The inner matmul is tiny; XLA fuses
    the softmax+dot into the surrounding decoder computation.
    """
    shape = corners.shape
    x = corners.reshape(shape[:-1] + (4, reg_max + 1))
    x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    return jnp.einsum("...k,k->...", x, project.astype(jnp.float32)).reshape(shape[:-1] + (4,))


def translate_gt(gt: jnp.ndarray, reg_max: int, reg_scale: float, up: float):
    """Project continuous GT offsets onto fractional bin indices.

    Vectorized, mask-based re-derivation of reference arch/utils.py:267-327.
    gt: any shape, flattened internally. Returns (indices_f32, weight_right,
    weight_left) each of gt's flattened shape.
    """
    gt = gt.reshape(-1)
    fv = weighting_function(reg_max, up, reg_scale)  # [reg_max+1]

    # index of closest bin-value <= gt  (== #values <= gt, minus 1)
    mask = fv[None, :] <= gt[:, None]
    closest_left = jnp.sum(mask, axis=1).astype(jnp.float32) - 1.0

    valid = (closest_left >= 0) & (closest_left < reg_max)
    idx_safe = jnp.clip(closest_left, 0, reg_max - 1).astype(jnp.int32)
    left_values = fv[idx_safe]
    right_values = fv[idx_safe + 1]
    left_diffs = jnp.abs(gt - left_values)
    right_diffs = jnp.abs(right_values - gt)
    wr_valid = left_diffs / jnp.maximum(left_diffs + right_diffs, 1e-16)

    below = closest_left < 0
    above = closest_left >= reg_max
    weight_right = jnp.where(valid, wr_valid, 0.0)
    weight_right = jnp.where(above, 1.0, weight_right)
    weight_left = jnp.where(valid, 1.0 - wr_valid, 0.0)
    weight_left = jnp.where(below, 1.0, weight_left)
    indices = jnp.where(below, 0.0, closest_left)
    indices = jnp.where(above, reg_max - 0.1, indices)
    return indices, weight_right, weight_left


def bbox2distance(
    points: jnp.ndarray,
    bbox: jnp.ndarray,
    reg_max: int,
    reg_scale: float,
    up: float,
    eps: float = 0.1,
):
    """GT box -> per-edge fractional bin targets (reference arch/utils.py:330-354).

    points: [N, 4] cxcywh reference; bbox: [N, 4] xyxy GT.
    Returns (target_bins [N*4], weight_right [N*4], weight_left [N*4]),
    all stop_gradient'ed.
    """
    reg_scale = abs(float(reg_scale))
    sx = points[..., 2] / reg_scale + 1e-16
    sy = points[..., 3] / reg_scale + 1e-16
    left = (points[..., 0] - bbox[..., 0]) / sx - 0.5 * reg_scale
    top = (points[..., 1] - bbox[..., 1]) / sy - 0.5 * reg_scale
    right = (bbox[..., 2] - points[..., 0]) / sx - 0.5 * reg_scale
    bottom = (bbox[..., 3] - points[..., 1]) / sy - 0.5 * reg_scale
    four = jnp.stack([left, top, right, bottom], axis=-1)
    idx, wr, wl = translate_gt(four, reg_max, reg_scale, up)
    idx = jnp.clip(idx, 0, reg_max - eps)
    return (
        jax.lax.stop_gradient(idx.reshape(-1)),
        jax.lax.stop_gradient(wr),
        jax.lax.stop_gradient(wl),
    )
