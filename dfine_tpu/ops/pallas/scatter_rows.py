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

    bf16 payload, f32 accumulation (see module notes above)."""
    bh, n = idx.shape
    d = contrib.shape[-1]
    tile = min(tile, max(128, -(-hw // 128) * 128))
    chunk = min(chunk, max(128, -(-n // 128) * 128))
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
