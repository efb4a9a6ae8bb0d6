"""Pallas scatter kernel + deform-attn custom VJP: correctness vs autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfine_tpu.ops.deform_attn import ms_deform_attn_core, ms_deform_attn_core_fused
from dfine_tpu.ops.pallas.scatter_rows import rows_scatter_add


def test_rows_scatter_add_matches_naive():
    rng = np.random.default_rng(0)
    BH, N, D, HW = 4, 1000, 32, 777
    idx = rng.integers(-1, HW, (BH, N)).astype(np.int32)
    contrib = rng.normal(size=(BH, N, D)).astype(np.float32)
    out = np.asarray(rows_scatter_add(jnp.asarray(idx), jnp.asarray(contrib), HW,
                                      interpret=True))
    ref = np.zeros((BH, HW, D), np.float32)
    for b in range(BH):
        valid = idx[b] >= 0
        np.add.at(ref[b], idx[b][valid], contrib[b][valid])
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


def test_rows_scatter_add_mxu_matches_bf16_rounded_naive():
    """v2 kernel: f32 accumulation is EXACT; the only error is the single
    bf16 rounding of each contribution (same budget as concat_bf16)."""
    from dfine_tpu.ops.pallas.scatter_rows import rows_scatter_add_mxu

    rng = np.random.default_rng(7)
    BH, N, D, HW = 3, 1000, 32, 777
    idx = rng.integers(-1, HW, (BH, N)).astype(np.int32)
    contrib = rng.normal(size=(BH, N, D)).astype(np.float32)
    out = np.asarray(
        rows_scatter_add_mxu(jnp.asarray(idx), jnp.asarray(contrib), HW,
                             interpret=True)
    )
    ref = np.zeros((BH, HW, D), np.float32)
    rounded = np.asarray(jnp.asarray(contrib).astype(jnp.bfloat16), np.float32)
    for b in range(BH):
        valid = idx[b] >= 0
        np.add.at(ref[b], idx[b][valid], rounded[b][valid])
    # f32 summation ORDER differs between the kernel's dot accumulation and
    # np.add.at, so exact equality would be incidental (ADVICE r3) — allow
    # reordering-level error while still catching any payload-rounding bug.
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-6)


def test_fused_core_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    B, Q, H, D = 2, 9, 4, 8
    shapes = [(6, 5), (3, 3)]
    pts = [3, 2]
    sum_hw = sum(h * w for h, w in shapes)
    P = sum(pts)
    value = jnp.asarray(rng.normal(size=(B, sum_hw, H, D)).astype(np.float32))
    # include out-of-bounds sampling locations (zero-pad semantics)
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, size=(B, Q, H, P, 2)).astype(np.float32))
    att = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, Q, H, P)).astype(np.float32)), -1)

    def loss_ref(v, l, a):
        return (ms_deform_attn_core(v, shapes, l, a, pts) ** 2).sum()

    def loss_new(v, l, a):
        return (ms_deform_attn_core_fused(v, shapes, l, a, pts, interpret=True) ** 2).sum()

    np.testing.assert_allclose(
        float(loss_ref(value, loc, att)), float(loss_new(value, loc, att)), rtol=1e-6
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, att)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(value, loc, att)
    for name, a, b in zip(("value", "loc", "att"), g_ref, g_new):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4 * scale, err_msg=f"grad {name}"
        )


def test_sorted_segment_scatter_matches_dense():
    from dfine_tpu.ops.deform_attn import sorted_segment_scatter

    rng = np.random.default_rng(3)
    R, N, D, HW = 4, 3000, 32, 640
    idx = rng.integers(-1, HW, size=(R, N)).astype(np.int32)
    c = rng.normal(size=(R, N, D)).astype(np.float32)
    out = np.asarray(
        jax.jit(lambda i, c: sorted_segment_scatter(i, c, HW))(
            jnp.asarray(idx), jnp.asarray(c)
        )
    )
    ref = np.zeros((R, HW, D), np.float32)
    for r in range(R):
        for n in range(N):
            if idx[r, n] >= 0:
                ref[r, idx[r, n]] += c[r, n]
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-5)


@pytest.mark.parametrize(
    "impl", ["sorted", "window", "concat", "concat_bf16", "chunked", "mxu", "tiled"]
)
def test_fused_grads_match_autodiff(impl):
    """Every selectable custom-VJP backward (sorted segment-sum, 2x2-window
    scatter) must match XLA autodiff on all three inputs including
    out-of-bounds sampling locations."""
    from dfine_tpu.ops.deform_attn import (
        ms_deform_attn_core,
        ms_deform_attn_core_fused,
    )

    rng = np.random.default_rng(0)
    B, Q, H, D = 2, 50, 8, 16
    shapes = ((20, 20), (10, 10), (5, 5))
    pts = (3, 6, 3)
    sumhw = sum(h * w for h, w in shapes)
    P = sum(pts)
    value = jnp.asarray(rng.normal(size=(B, sumhw, H, D)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, size=(B, Q, H, P, 2)).astype(np.float32))
    att = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, Q, H, P)).astype(np.float32)), -1)

    g_ref = jax.jit(jax.grad(
        lambda v, l, a: (ms_deform_attn_core(v, shapes, l, a, pts) ** 2).sum(),
        argnums=(0, 1, 2),
    ))(value, loc, att)
    g_f = jax.jit(jax.grad(
        lambda v, l, a: (
            ms_deform_attn_core_fused(
                v, shapes, l, a, pts, scatter_impl=impl,
                # pallas kernels need interpret on CPU
                interpret=(impl in ("mxu", "tiled")),
            ) ** 2
        ).sum(),
        argnums=(0, 1, 2),
    ))(value, loc, att)
    # concat_bf16 / mxu / tiled trade the value-grad payload to bf16 (accu-
    # mulation is bf16 resp. f32-on-MXU) — ~3 significant digits by design
    tol = (
        dict(rtol=5e-2, atol=2e-2)
        if impl in ("concat_bf16", "mxu", "tiled")
        else dict(rtol=2e-4, atol=2e-4)
    )
    for a, b in zip(g_ref, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)


def test_tiled_scatter_matches_naive():
    """Sorted tile-local kernel vs sequential reference (bf16 payload)."""
    from dfine_tpu.ops.pallas.scatter_rows import rows_scatter_add_tiled

    rng = np.random.default_rng(11)
    BH, N, D, HW = 3, 1000, 32, 777
    idx = rng.integers(-1, HW, (BH, N)).astype(np.int32)
    contrib = rng.normal(size=(BH, N, D)).astype(np.float32)
    out = np.asarray(
        rows_scatter_add_tiled(jnp.asarray(idx), jnp.asarray(contrib), HW,
                               interpret=True)
    )
    ref = np.zeros((BH, HW, D), np.float32)
    rounded = np.asarray(jnp.asarray(contrib).astype(jnp.bfloat16), np.float32)
    for b in range(BH):
        valid = idx[b] >= 0
        np.add.at(ref[b], idx[b][valid], rounded[b][valid])
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-6)


def test_tiled_scatter_empty_and_dense_tiles():
    """Degenerate spans: every update in ONE tile (others must stay zero),
    and an all-dropped stream (everything -1)."""
    from dfine_tpu.ops.pallas.scatter_rows import rows_scatter_add_tiled

    BH, N, D, HW = 2, 600, 8, 2000
    idx = np.full((BH, N), 700, np.int32)  # all in tile 1 (tile=512)
    contrib = np.ones((BH, N, D), np.float32)
    out = np.asarray(
        rows_scatter_add_tiled(jnp.asarray(idx), jnp.asarray(contrib), HW,
                               interpret=True)
    )
    assert out[0, 700, 0] == N
    mask = np.ones(HW, bool)
    mask[700] = False
    assert np.abs(out[:, mask]).max() == 0.0

    idx_drop = np.full((BH, N), -1, np.int32)
    out2 = np.asarray(
        rows_scatter_add_tiled(jnp.asarray(idx_drop), jnp.asarray(contrib), HW,
                               interpret=True)
    )
    assert np.abs(out2).max() == 0.0


# ---- compiled-on-TPU variants (ADVICE r3: interpret=True never exercises
# ---- the real BlockSpec tiling / bf16 MXU lowering) -----------------------

_tpu = any(d.platform == "tpu" for d in jax.devices())


@pytest.mark.skipif(not _tpu, reason="needs a real TPU for compiled pallas")
@pytest.mark.parametrize("impl", ["mxu", "tiled"])
def test_pallas_scatter_compiled_on_tpu(impl):
    from dfine_tpu.ops.pallas.scatter_rows import (
        rows_scatter_add_mxu,
        rows_scatter_add_tiled,
    )

    fn = {"mxu": rows_scatter_add_mxu, "tiled": rows_scatter_add_tiled}[impl]
    rng = np.random.default_rng(5)
    BH, N, D, HW = 4, 3000, 32, 1700  # non-multiple shapes: exercises padding
    idx = rng.integers(-1, HW, (BH, N)).astype(np.int32)
    contrib = rng.normal(size=(BH, N, D)).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(idx), jnp.asarray(contrib), HW))
    ref = np.zeros((BH, HW, D), np.float32)
    rounded = np.asarray(jnp.asarray(contrib).astype(jnp.bfloat16), np.float32)
    for b in range(BH):
        valid = idx[b] >= 0
        np.add.at(ref[b], idx[b][valid], rounded[b][valid])
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)
