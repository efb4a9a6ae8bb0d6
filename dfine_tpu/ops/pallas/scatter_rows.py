"""Pallas TPU kernel: batched row scatter-add via on-the-fly one-hot matmul.

Built as a candidate backward for deformable-attention sampling w.r.t. the
value tensor (XLA lowers that gradient to a generic scatter-add, ~103 ms of
a 349 ms D-FINE-m train step).  The kernel reformulates the scatter as
dense MXU work:

    out[t, :] = sum_n (idx[n] == t) * contrib[n, :]

For each (batch-row, HW-tile) grid cell it streams contribution chunks,
builds the {0,1} match matrix with a broadcasted compare (VPU) and
accumulates ``match.T @ contrib`` on the MXU — no serialized updates, no
atomics, deterministic.

MEASURED OUTCOME (v5e, m@640 bs8, NOTES.md): the dense reformulation does
O(HW x N) MXU work and loses to XLA's native scatter — fwd+bwd 255.4 ms
(DEFAULT precision) / 366.3 ms (HIGHEST) vs 213.5 ms for autodiff.  The
kernel and its grad-exact custom VJP (ops/deform_attn.py::
ms_deform_attn_core_fused) are kept as a verified, measured alternative;
the production path uses XLA autodiff.  Revisit if Q*P grows (denser
sampling) or a sparse-tile variant (per-query HW locality) is designed.

Shapes: idx [BH, N] int32 (row targets, -1 = dropped), contrib [BH, N, D]
float32 -> out [BH, HW, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, contrib_ref, out_ref, *, chunk: int, n: int, tile: int):
    # idx_ref holds the FULL [BH, N] index array (un-blocked: TPU block
    # shapes must tile to (8, 128) or match the array; a (1, N) block does
    # neither) — select this program's row explicitly.
    bh = pl.program_id(0)
    t0 = pl.program_id(1) * tile
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # [tile, D]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile), 1) + t0  # [C, T]

    def body(c, acc):
        start = c * chunk
        ids = idx_ref[bh, pl.ds(start, chunk)]  # [C]
        vals = contrib_ref[0, pl.ds(start, chunk), :]  # [C, D]
        match = (ids[:, None] == row_ids).astype(jnp.float32)  # [C, T]
        # HIGHEST: keep f32 contributions exact on the MXU (bf16x3 passes);
        # the match matrix is 0/1 so only `vals` needs the extra precision
        return acc + jax.lax.dot_general(
            match, vals,
            dimension_numbers=(((0,), (0,)), ((), ())),  # match.T @ vals
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    acc = jax.lax.fori_loop(0, n // chunk, body, acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("hw", "tile", "chunk", "interpret"))
def rows_scatter_add(
    idx: jnp.ndarray,  # [BH, N] int32 in [0, hw) or -1
    contrib: jnp.ndarray,  # [BH, N, D]
    hw: int,
    tile: int = 512,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns out [BH, hw, D] with out[b, idx[b, n]] += contrib[b, n]."""
    bh, n = idx.shape
    d = contrib.shape[-1]
    tile = min(tile, hw)
    # pad HW to a tile multiple; -1 indices never match any row id
    hw_pad = -(-hw // tile) * tile
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n)), constant_values=-1)
        contrib = jnp.pad(contrib, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (bh, hw_pad // tile)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, n=n_pad, tile=tile),
        out_shape=jax.ShapeDtypeStruct((bh, hw_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, n_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx.astype(jnp.int32), contrib.astype(jnp.float32))
    return out[:, :hw]


# ---------------------------------------------------------------------------
# v2 (round 3): re-tiled one-hot-matmul kernel.
#
# The r1 kernel above loses to XLA's scatter not on FLOPs but on LOOP GRAIN:
# tile=512/chunk=512 means ~16 tiny [512,512]x[512,32] f32 dots per grid
# cell x 832 cells, and per-iteration overhead (match materialization,
# f32 MXU passes) dominates.  v2 restructures:
#   * bf16 operands (the {0,1} match matrix is EXACT in bf16; only the
#     contribution payload is rounded once — same precision budget as the
#     accepted concat_bf16 variant, but accumulation stays f32 on the MXU),
#   * chunk=2048, tile=1024 -> 4 large dots per cell instead of 16 small,
#   * idx + contrib blocks resident in VMEM across the inner hw-tile loop
#     (index maps constant in t), match built per chunk (4 MB bf16 scratch).
# ---------------------------------------------------------------------------


def _kernel_mxu(idx_ref, contrib_ref, out_ref, *, chunk: int, n: int, tile: int):
    bh = pl.program_id(0)
    t0 = pl.program_id(1) * tile
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # [tile, D]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile), 1) + t0

    def body(c, acc):
        start = c * chunk
        ids = idx_ref[bh, pl.ds(start, chunk)]  # [C]
        vals = contrib_ref[0, pl.ds(start, chunk), :]  # [C, D] bf16
        match = (ids[:, None] == row_ids).astype(jnp.bfloat16)  # [C, T]
        return acc + jax.lax.dot_general(
            match, vals,
            dimension_numbers=(((0,), (0,)), ((), ())),  # match.T @ vals
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, n // chunk, body, acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("hw", "tile", "chunk", "interpret"))
def rows_scatter_add_mxu(
    idx: jnp.ndarray,  # [BH, N] int32 in [0, hw) or -1
    contrib: jnp.ndarray,  # [BH, N, D]
    hw: int,
    tile: int = 1024,
    chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns out [BH, hw, D] with out[b, idx[b, n]] += contrib[b, n].

    bf16 payload, f32 accumulation (see module notes above).

    VMEM budget (ADVICE r3): per grid cell the kernel keeps the full
    [BH, n_pad] int32 idx array, one [1, n_pad, D] bf16 contribution block,
    the [chunk, tile] int32 row-id iota and the bf16 match matrix resident —
    at BH=64, N~8k, D=32 and the 2048x1024 defaults that is ~15 MB, right at
    the v5e VMEM ceiling.  ``chunk`` is therefore derived DOWN from the
    resident-idx footprint below so larger BH*N degrade to smaller match
    tiles instead of failing to lower (or silently spilling)."""
    bh, n = idx.shape
    d = contrib.shape[-1]
    tile = min(tile, max(128, -(-hw // 128) * 128))
    chunk = min(chunk, max(128, -(-n // 128) * 128))
    # keep idx (4*BH*n B) + contrib block + match + row_ids under ~12 MB:
    # shrink chunk (the match/row_ids factor) while the fixed residents grow.
    fixed_mb = (4 * bh * n + 2 * n * d) / 1e6
    while chunk > 512 and fixed_mb + (chunk * tile * 6) / 1e6 > 12.0:
        chunk //= 2
    hw_pad = -(-hw // tile) * tile
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n)), constant_values=-1)
        contrib = jnp.pad(contrib, ((0, 0), (0, n_pad - n), (0, 0)))

    grid = (bh, hw_pad // tile)
    out = pl.pallas_call(
        functools.partial(_kernel_mxu, chunk=chunk, n=n_pad, tile=tile),
        out_shape=jax.ShapeDtypeStruct((bh, hw_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, n_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx.astype(jnp.int32), contrib.astype(jnp.bfloat16))
    return out[:, :hw]


# ---------------------------------------------------------------------------
# v3 (round 4): SORTED tile-local dense accumulation (VERDICT r3 item #6).
#
# v1/v2 lose because every hw-tile scans the FULL update stream: O(N x HW)
# MXU work.  The missing granularity is locality: sort the updates by
# destination row first (one argsort of the int32 keys + one payload gather
# — NOT the 14-cumsum-pass pipeline that sank the r2 "sorted" variant), then
# the updates belonging to tile t form one contiguous span [lo_t, hi_t) of
# the stream.  Per-(bh, tile) chunk bounds are computed with searchsorted on
# the host graph and handed to the kernel via scalar prefetch; each grid
# cell only loops over ITS overlapping chunks.  Total MXU work drops from
# O(N x HW) to O(N x tile): ~13x less at m@640 level-0 shapes.
# ---------------------------------------------------------------------------


def _kernel_tiled(c_lo_ref, c_hi_ref, idx_ref, contrib_ref, out_ref, *,
                  chunk: int, tile: int):
    bh = pl.program_id(0)
    t = pl.program_id(1)
    t0 = t * tile
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile), 1) + t0

    def body(c, acc):
        start = c * chunk
        ids = idx_ref[bh, pl.ds(start, chunk)]  # [C] sorted keys
        vals = contrib_ref[0, pl.ds(start, chunk), :]  # [C, D] bf16
        match = (ids[:, None] == row_ids).astype(jnp.bfloat16)  # exact in bf16
        return acc + jax.lax.dot_general(
            match, vals,
            dimension_numbers=(((0,), (0,)), ((), ())),  # match.T @ vals
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # [tile, D]
    acc = jax.lax.fori_loop(c_lo_ref[bh, t], c_hi_ref[bh, t], body, acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("hw", "tile", "chunk", "interpret"))
def rows_scatter_add_tiled(
    idx: jnp.ndarray,  # [BH, N] int32 in [0, hw) or -1
    contrib: jnp.ndarray,  # [BH, N, D]
    hw: int,
    tile: int = 512,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns out [BH, hw, D] with out[b, idx[b, n]] += contrib[b, n].

    Sort-then-tile formulation (see v3 notes above): bf16 payload rounded
    once, f32 MXU accumulation — the same precision budget as
    ``rows_scatter_add_mxu``/``concat_bf16``.  VMEM residents per grid cell:
    the [BH, n_pad] sorted keys (int32), one [1, n_pad, D] bf16 payload
    block and the [chunk, tile] match scratch — ~2 MB at m@640 shapes."""
    bh, n = idx.shape
    d = contrib.shape[-1]
    tile = min(tile, max(128, -(-hw // 128) * 128))
    chunk = min(chunk, max(128, -(-n // 128) * 128))
    hw_pad = -(-hw // tile) * tile
    n_pad = -(-n // chunk) * chunk

    # 1. sort updates by destination row; dropped (-1) and pad entries get
    #    key hw_pad, beyond every tile's range, so no kernel loop visits them
    key = jnp.where(idx < 0, jnp.int32(hw_pad), idx.astype(jnp.int32))
    order = jnp.argsort(key, axis=1)
    key_s = jnp.take_along_axis(key, order, axis=1)
    contrib_s = jnp.take_along_axis(contrib, order[..., None], axis=1)
    if n_pad != n:
        key_s = jnp.pad(key_s, ((0, 0), (0, n_pad - n)),
                        constant_values=hw_pad)
        contrib_s = jnp.pad(contrib_s, ((0, 0), (0, n_pad - n), (0, 0)))

    # 2. per-(bh, tile) span of the sorted stream -> chunk-index bounds
    tiles = hw_pad // tile
    starts = jnp.arange(tiles, dtype=jnp.int32) * tile
    lo = jax.vmap(lambda ks: jnp.searchsorted(ks, starts, side="left"))(key_s)
    hi = jax.vmap(lambda ks: jnp.searchsorted(ks, starts + tile, side="left"))(key_s)
    c_lo = (lo // chunk).astype(jnp.int32)
    c_hi = (-(-hi // chunk)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, tiles),
        in_specs=[
            pl.BlockSpec((bh, n_pad), lambda b, t, lo_r, hi_r: (0, 0)),
            pl.BlockSpec((1, n_pad, d), lambda b, t, lo_r, hi_r: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d), lambda b, t, lo_r, hi_r: (b, t, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_tiled, chunk=chunk, tile=tile),
        out_shape=jax.ShapeDtypeStruct((bh, hw_pad, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(c_lo, c_hi, key_s, contrib_s.astype(jnp.bfloat16))
    return out[:, :hw]
