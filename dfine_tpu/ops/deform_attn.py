"""Multi-scale deformable attention core for TPU.

The reference implements this with per-level ``F.grid_sample`` (reference:
src/d_fine/arch/utils.py:191-264).  On TPU we re-derive it as an explicit
4-corner bilinear gather: for every sampling point the 4 neighbouring texels
are fetched with ``take_along_axis`` (one vectorized row-gather per corner
per level, which XLA:TPU lowers to its native gather path) and blended with
bilinear weights.  Semantics match ``F.grid_sample(..., mode="bilinear",
padding_mode="zeros", align_corners=False)`` bit-for-bit in fp32:
out-of-bounds corners contribute zero via weight masking.

Kernel-choice note (measured, TPU v5e, D-FINE-m 640, bs=1): the whole
decoder including this op runs in ~0.05 ms — under 6% of the 0.93 ms model
forward (backbone 0.58, encoder 0.30).  A hand-written Pallas kernel cannot
win here: a VMEM row-loop pays ~29k sequential row reads per image, and the
MXU one-hot-matmul formulation costs ~35 GFLOP (~0.2 ms) versus the
gather's few MB of HBM traffic.  The XLA gather formulation IS the
speed-of-light implementation for these shapes, so it is used for both
serving and autodiff.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_level(
    value: jnp.ndarray,  # [B, nhead, H*W, d]
    h: int,
    w: int,
    loc: jnp.ndarray,  # [B, Q, nhead, P, 2] in [0, 1]
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Sample one level at `loc`; returns [B, Q, nhead, P, d]."""
    b, nhead, _, d = value.shape
    q, p = loc.shape[1], loc.shape[3]

    # align_corners=False pixel mapping: x = u*W - 0.5
    x = loc[..., 0].astype(compute_dtype) * w - 0.5
    y = loc[..., 1].astype(compute_dtype) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, dx, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # [B,Q,nhead,P]
        # gather along the HW axis: reorder index to [B, nhead, Q*P]
        idx_t = idx.transpose(0, 2, 1, 3).reshape(b, nhead, q * p)
        g = jnp.take_along_axis(value, idx_t[..., None], axis=2)  # [B,nhead,Q*P,d]
        g = g.reshape(b, nhead, q, p, d).transpose(0, 2, 1, 3, 4)  # [B,Q,nhead,P,d]
        wgt = (wgt * valid.astype(compute_dtype))[..., None]
        out = g * wgt if out is None else out + g * wgt
    return out


def ms_deform_attn_core(
    value: jnp.ndarray,  # [B, sum(HW), nhead, d]
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h,w), ...]
    sampling_locations: jnp.ndarray,  # [B, Q, nhead, sum(P), 2] in [0,1]
    attention_weights: jnp.ndarray,  # [B, Q, nhead, sum(P)] softmaxed
    num_points_list: Sequence[int],  # static per-level point counts
) -> jnp.ndarray:
    """Deformable attention: weighted sum of bilinear samples.

    Contract mirrors reference arch/utils.py:191-264 (method="default") with
    `2*loc-1` grid folded into the [0,1] convention. Returns [B, Q, nhead*d].
    """
    b, q = sampling_locations.shape[:2]
    nhead, d = value.shape[2], value.shape[3]
    compute_dtype = jnp.promote_types(value.dtype, jnp.float32)

    hw_sizes = [h * w for h, w in spatial_shapes]
    out = jnp.zeros((b, q, nhead, d), dtype=compute_dtype)
    hw_start = 0
    p_start = 0
    for (h, w), hw, p in zip(spatial_shapes, hw_sizes, num_points_list):
        v = value[:, hw_start : hw_start + hw]  # [B, HW, nhead, d]
        v = v.transpose(0, 2, 1, 3)  # [B, nhead, HW, d]
        loc = sampling_locations[:, :, :, p_start : p_start + p]
        att = attention_weights[:, :, :, p_start : p_start + p].astype(compute_dtype)
        sampled = _bilinear_gather_level(v, h, w, loc, compute_dtype)  # [B,Q,nhead,P,d]
        out = out + jnp.einsum("bqnpd,bqnp->bqnd", sampled, att)
        hw_start += hw
        p_start += p
    return out.reshape(b, q, nhead * d)


def sorted_segment_scatter(
    idx: jnp.ndarray,  # [R, N] int32 destination rows, -1 = dropped
    contrib: jnp.ndarray,  # [R, N, D] float contributions
    hw: int,
) -> jnp.ndarray:
    """Duplicate-index scatter-add as sort + cumsum + binary-search gather.

    XLA:TPU serializes scatter-adds with duplicate indices (the ~103 ms
    deform-attn value gradient, NOTES.md).  Parallel segment-sum instead:
    sort updates by destination, prefix-sum the payload, then for every
    output row binary-search its run boundary and take the cumsum
    difference.  Sort, cumsum, and searchsorted are all parallel on TPU and
    there is NO scatter anywhere.

    Returns [R, hw, D].
    """
    r, n = idx.shape
    d = contrib.shape[-1]

    def one(idx1, c1):
        key = jnp.where(idx1 < 0, hw, idx1)  # dropped entries sort last
        order = jnp.argsort(key)
        key_s = key[order]
        csum = jnp.cumsum(jnp.take(c1, order, axis=0).astype(jnp.float32), axis=0)
        # for each output row j: pos = last sorted element with key <= j
        pos = jnp.searchsorted(key_s, jnp.arange(hw, dtype=key_s.dtype), side="right") - 1
        pos_c = jnp.clip(pos, 0, n - 1)
        hit = (pos >= 0) & (jnp.take(key_s, pos_c) == jnp.arange(hw))
        end_csum = jnp.take(csum, pos_c, axis=0)
        # csum just before the run start = csum at the previous row's end
        prev_pos = jnp.searchsorted(
            key_s, jnp.arange(hw, dtype=key_s.dtype), side="left"
        ) - 1
        start_csum = jnp.where(
            (prev_pos >= 0)[:, None],
            jnp.take(csum, jnp.clip(prev_pos, 0, n - 1), axis=0),
            0.0,
        )
        return jnp.where(hit[:, None], end_csum - start_csum, 0.0)

    return jax.vmap(one)(idx, contrib).astype(contrib.dtype)


# Backward-implementation switch for MSDeformableAttention, read at TRACE
# time (like models.layers.set_bn_axis): "xla" = plain autodiff (serialized
# scatter-add for the value grad), "sorted" = custom VJP with the parallel
# segment-sum above, "pallas" = r1 one-hot-matmul kernel (kept for
# comparison).  Measured on v5e (m@640 bs8 full step, tools/profile_train):
# xla 364.7 ms, sorted 1204.9 ms — the sort+cumsum+searchsorted pipeline
# moves ~20x the scatter's bytes through HBM, so XLA's serialized scatter
# REMAINS the production backward (third measured attempt; see NOTES.md).
_DEFORM_BWD = "xla"


def set_deform_bwd(impl: str, allow_wrong_grads: bool = False) -> None:
    global _DEFORM_BWD
    assert impl in (
        "xla", "sorted", "pallas", "window",
        # r3 payload-reduction experiments (VERDICT r2 item #6):
        "concat",       # ONE scatter per level (4 corners concatenated) fp32
        "concat_bf16",  # same, bf16 payload (half the scatter bytes)
        "chunked",      # destination split into VMEM-sized row chunks
        "mxu",          # r3 re-tiled Pallas one-hot matmul (bf16 payload)
        "tiled",        # r4 SORTED tile-local dense accumulation (Pallas)
        # MEASUREMENT-ONLY ablations (wrong gradients, profiling only):
        # novalue = fused bwd with the value grad zeroed (scatter skipped);
        # xla_novalue = plain autodiff with stop_gradient(value) — prices
        # the serialized scatter WITHIN the autodiff backward family
        "novalue",
        "xla_novalue",
    ), impl
    if impl in ("novalue", "xla_novalue") and not allow_wrong_grads:
        # ADVICE r3: a typo'd/copied command must not silently train with a
        # zero value gradient — the ablation needs an explicit opt-in.
        raise ValueError(
            "set_deform_bwd('novalue') returns WRONG (zero) value gradients "
            "and exists only to price the scatter in profiling runs; pass "
            "allow_wrong_grads=True to opt in."
        )
    _DEFORM_BWD = impl


def concat_corner_scatter(
    idx: jnp.ndarray,  # [R, N] int32, -1 = dropped
    contrib: jnp.ndarray,  # [R, N, D]
    hw: int,
    acc_dtype=jnp.float32,
) -> jnp.ndarray:
    """One scatter-add per level with every corner contribution concatenated
    (plain autodiff issues 4 separate scatters), payload cast to acc_dtype
    before the scatter (bf16 halves the scatter's HBM write traffic)."""
    r, n = idx.shape
    d = contrib.shape[-1]
    safe = jnp.where(idx < 0, hw, idx)  # pad row absorbs dropped updates
    out = jnp.zeros((r, hw + 1, d), acc_dtype)
    out = out.at[jnp.arange(r)[:, None], safe].add(contrib.astype(acc_dtype))
    return out[:, :hw].astype(jnp.float32)


def chunked_scatter(
    idx: jnp.ndarray,  # [R, N] int32, -1 = dropped
    contrib: jnp.ndarray,  # [R, N, D]
    hw: int,
    n_chunks: int = 4,
) -> jnp.ndarray:
    """Scatter-add with the DESTINATION split into row chunks so each
    scatter's output fits VMEM; each chunk re-reads the full update stream
    with out-of-chunk rows masked to the pad slot."""
    r, n = idx.shape
    d = contrib.shape[-1]
    ch = -(-hw // n_chunks)
    outs = []
    ar = jnp.arange(r)[:, None]
    for k in range(n_chunks):
        lo = k * ch
        width = min(ch, hw - lo)
        if width <= 0:
            break
        local = idx - lo
        in_ck = (idx >= lo) & (local < width)
        safe = jnp.where(in_ck, local, width)
        o = jnp.zeros((r, width + 1, d), jnp.float32)
        o = o.at[ar, safe].add(contrib)
        outs.append(o[:, :width])
    return jnp.concatenate(outs, axis=1)


def deform_bwd_impl() -> str:
    return _DEFORM_BWD


def _corner_tables():
    return (
        (0, 0, lambda fx, fy: (1 - fx) * (1 - fy), lambda fx, fy: -(1 - fy), lambda fx, fy: -(1 - fx)),
        (0, 1, lambda fx, fy: fx * (1 - fy), lambda fx, fy: (1 - fy), lambda fx, fy: -fx),
        (1, 0, lambda fx, fy: (1 - fx) * fy, lambda fx, fy: -fy, lambda fx, fy: (1 - fx)),
        (1, 1, lambda fx, fy: fx * fy, lambda fx, fy: fy, lambda fx, fy: fx),
    )


def window_scatter_add(
    starts_y: jnp.ndarray,  # [R, N] int32 in [0, h-2]
    starts_x: jnp.ndarray,  # [R, N] int32 in [0, w-2]
    updates: jnp.ndarray,  # [R, N, 2, 2, D]
    h: int,
    w: int,
) -> jnp.ndarray:
    """Scatter-add of [2,2,D] windows — the 4 bilinear corners of a sampling
    point form one contiguous 2x2 patch, so ONE window update replaces FOUR
    row updates (4x fewer scatter ops than the row form).  Window starts are
    pre-clamped so no update is ever dropped by XLA's out-of-bounds rule;
    contributions of invalid (out-of-image) corners are zeroed by the
    caller.  Returns [R, h, w, D]."""
    d = updates.shape[-1]
    idx = jnp.stack([starts_y, starts_x], -1)  # [R, N, 2]
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )

    def one(op_idx, upd):
        return jax.lax.scatter_add(
            jnp.zeros((h, w, d), jnp.float32), op_idx, upd, dnums
        )

    return jax.vmap(one)(idx, updates)


def ms_deform_attn_core_fused(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_points_list: Sequence[int],
    interpret: bool = False,
    scatter_impl: str = "sorted",
) -> jnp.ndarray:
    """ms_deform_attn_core with a custom VJP.

    Forward is identical to the XLA version (gathers are fast).  The
    backward replaces XLA's serialized scatter-add for the VALUE gradient
    (~103 ms of a D-FINE-m train step, see NOTES.md):

    * ``scatter_impl="sorted"`` (default): sort+cumsum+binary-search
      segment-sum (``sorted_segment_scatter``) — fully parallel, no scatter.
    * ``scatter_impl="pallas"``: the r1 one-hot-matmul kernel
      (ops/pallas/scatter_rows.py) — measured slower, kept as comparison.

    Grads w.r.t. sampling locations and attention weights are closed-form
    re-gathers in both cases.
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    num_points_list = tuple(int(p) for p in num_points_list)

    @jax.custom_vjp
    def core(value, loc, att):
        return ms_deform_attn_core(value, spatial_shapes, loc, att, num_points_list)

    def fwd(value, loc, att):
        return core(value, loc, att), (value, loc, att)

    def bwd(res, g_out):
        if scatter_impl == "pallas":
            from .pallas import rows_scatter_add

            scatter = lambda i, c, hw: rows_scatter_add(i, c, hw, interpret=interpret)
        elif scatter_impl == "mxu":
            from .pallas.scatter_rows import rows_scatter_add_mxu

            scatter = lambda i, c, hw: rows_scatter_add_mxu(
                i, c, hw, interpret=interpret
            )
        elif scatter_impl == "tiled":
            from .pallas.scatter_rows import rows_scatter_add_tiled

            scatter = lambda i, c, hw: rows_scatter_add_tiled(
                i, c, hw, interpret=interpret
            )
        elif scatter_impl == "window":
            scatter = None  # handled inline (2x2 window form)
        elif scatter_impl == "concat":
            scatter = concat_corner_scatter
        elif scatter_impl == "concat_bf16":
            scatter = lambda i, c, hw: concat_corner_scatter(i, c, hw, jnp.bfloat16)
        elif scatter_impl == "chunked":
            scatter = chunked_scatter
        elif scatter_impl == "novalue":
            scatter = lambda i, c, hw: jnp.zeros(
                (i.shape[0], hw, c.shape[-1]), jnp.float32
            )
        else:
            scatter = sorted_segment_scatter

        value, loc, att = res
        b, q = loc.shape[:2]
        nhead, d = value.shape[2], value.shape[3]
        f32 = jnp.float32
        g = g_out.reshape(b, q, nhead, d).astype(f32)
        att32 = att.astype(f32)

        grad_loc = jnp.zeros(loc.shape, f32)
        grad_att = jnp.zeros(att.shape, f32)
        grad_val_parts = []
        hw_start = 0
        p_start = 0
        for (h, w), p in zip(spatial_shapes, num_points_list):
            hw = h * w
            v = value[:, hw_start : hw_start + hw].astype(f32)  # [B,HW,H,D]
            v_t = v.transpose(0, 2, 1, 3)  # [B,H,HW,D]
            l = loc[:, :, :, p_start : p_start + p].astype(f32)
            a = att32[:, :, :, p_start : p_start + p]  # [B,Q,H,P]

            x = l[..., 0] * w - 0.5
            y = l[..., 1] * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            ga_l = jnp.zeros(a.shape, f32)
            gfx = jnp.zeros(a.shape, f32)
            gfy = jnp.zeros(a.shape, f32)
            idx_parts, contrib_parts = [], []
            if scatter_impl == "window":
                sy = jnp.clip(y0i, 0, h - 2)  # [B,Q,H,P] window starts
                sx = jnp.clip(x0i, 0, w - 2)
                win = jnp.zeros((b, q, nhead, p, 2, 2, d), f32)
            for dy, dx, w_fn, dwdx_fn, dwdy_fn in _corner_tables():
                xi = x0i + dx
                yi = y0i + dy
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # [B,Q,H,P]
                # gather V_c: [B,Q,H,P,D]
                idx_t = idx.transpose(0, 2, 1, 3).reshape(b, nhead, q * p)
                vc = jnp.take_along_axis(v_t, idx_t[..., None], axis=2)
                vc = vc.reshape(b, nhead, q, p, d).transpose(0, 2, 1, 3, 4)
                g_dot_v = jnp.einsum("bqhd,bqhpd->bqhp", g, vc)
                m = valid.astype(f32)
                wgt = w_fn(fx, fy) * m
                ga_l = ga_l + wgt * g_dot_v
                gfx = gfx + m * dwdx_fn(fx, fy) * g_dot_v
                gfy = gfy + m * dwdy_fn(fx, fy) * g_dot_v
                # value-grad contributions
                coeff = (a * wgt)[..., None]  # [B,Q,H,P,1]
                contrib = coeff * g[:, :, :, None, :]  # [B,Q,H,P,D]
                if scatter_impl == "window":
                    # place this corner into its slot of the 2x2 window
                    oy = yi - sy  # in {0,1} for in-image corners
                    ox = xi - sx
                    for i in (0, 1):
                        for j in (0, 1):
                            sel = ((oy == i) & (ox == j) & valid)[..., None]
                            win = win.at[..., i, j, :].add(
                                jnp.where(sel, contrib, 0.0)
                            )
                else:
                    idx_eff = jnp.where(valid, idx, -1)
                    idx_parts.append(
                        idx_eff.transpose(0, 2, 1, 3).reshape(b * nhead, q * p)
                    )
                    contrib_parts.append(
                        contrib.transpose(0, 2, 1, 3, 4).reshape(b * nhead, q * p, d)
                    )
            grad_att = grad_att.at[:, :, :, p_start : p_start + p].set(ga_l)
            gu = a * gfx * w  # d x / d u = W
            gv_ = a * gfy * h
            grad_loc = grad_loc.at[:, :, :, p_start : p_start + p, :].set(
                jnp.stack([gu, gv_], -1)
            )
            if scatter_impl == "window":
                sy_t = sy.transpose(0, 2, 1, 3).reshape(b * nhead, q * p)
                sx_t = sx.transpose(0, 2, 1, 3).reshape(b * nhead, q * p)
                win_t = win.transpose(0, 2, 1, 3, 4, 5, 6).reshape(
                    b * nhead, q * p, 2, 2, d
                )
                gv_level = window_scatter_add(sy_t, sx_t, win_t, h, w)
                gv_level = gv_level.reshape(b, nhead, hw, d).transpose(0, 2, 1, 3)
            else:
                idx_all = jnp.concatenate(idx_parts, axis=1)  # [BH, Q*P*4]
                contrib_all = jnp.concatenate(contrib_parts, axis=1)
                gv_level = scatter(idx_all, contrib_all, hw)
                gv_level = gv_level.reshape(b, nhead, hw, d).transpose(0, 2, 1, 3)
            grad_val_parts.append(gv_level)
            hw_start += hw
            p_start += p

        grad_value = jnp.concatenate(grad_val_parts, axis=1).astype(value.dtype)
        return grad_value, grad_loc.astype(loc.dtype), grad_att.astype(att.dtype)

    core.defvjp(fwd, bwd)
    return core(value, sampling_locations, attention_weights)


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Standalone grid_sample(bilinear, zeros, align_corners=False) for NHWC.

    image: [B, H, W, C]; grid: [B, Hg, Wg, 2] in [-1, 1] (x, y order).
    Returns [B, Hg, Wg, C].  Used for parity tests and mask-paste paths.
    """
    b, h, w, c = image.shape
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = image.reshape(b, h * w, c)
    out = None
    for dy, dx, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = x0i + dx
        yi = y0i + dy
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        g = jnp.take_along_axis(flat, idx.reshape(b, -1)[..., None], axis=1)
        g = g.reshape(grid.shape[:-1] + (c,))
        wgt = (wgt * valid.astype(image.dtype))[..., None]
        out = g * wgt if out is None else out + g * wgt
    return out
