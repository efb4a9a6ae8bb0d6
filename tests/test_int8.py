"""True-int8 serving path (dfine_tpu/infer/int8.py) — the reference's
OpenVINO-NNCF int8 engine analog (src/dl/ov_int8.py:130-139)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from dfine_tpu.infer.int8 import (
    _int8_matmul,
    apply_int8,
    convert_params_int8,
    count_int8,
)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    w = (rng.normal(size=(64, 32)) * 0.05).astype(np.float32)
    s = np.abs(w).max(0, keepdims=True) / 127.0
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    y = np.asarray(_int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s[0])))
    ref = x @ w
    assert np.abs(y - ref).max() / np.abs(ref).max() < 0.02


def test_compiled_program_contains_int8_dot():
    """In w8a8 mode the serving graph must execute a REAL i8 x i8 -> i32
    dot_general — not fake-quant (the r1 weakness this path replaces)."""
    from dfine_tpu.infer.int8 import set_int8_mode

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    m = nn.Dense(32)
    v = m.init(jax.random.key(0), x)
    v8 = jax.tree.map(jnp.asarray, convert_params_int8(jax.tree.map(np.asarray, v)))
    set_int8_mode("w8a8")
    try:
        txt = jax.jit(lambda v, x: apply_int8(m, v, x)).lower(v8, x).as_text()
        assert any(
            "dot_general" in ln and "i8>" in ln and "i32>" in ln
            for ln in txt.splitlines()
        ), "no int8 dot_general in the lowered program"
        y8 = np.asarray(apply_int8(m, v8, x))
    finally:
        set_int8_mode("w8a16")
    yf = np.asarray(m.apply(v, x))
    assert np.abs(y8 - yf).max() / np.abs(yf).max() < 0.02
    # w8a16 (default on this runtime — see NOTES.md): int8 HBM storage,
    # dequant fused into a bf16 dot; same quantized weights
    txt16 = jax.jit(lambda v, x: apply_int8(m, v, x)).lower(v8, x).as_text()
    assert any("i8>" in ln and "convert" in ln for ln in txt16.splitlines())
    y16 = np.asarray(apply_int8(m, v8, x))
    assert np.abs(y16 - yf).max() / np.abs(yf).max() < 0.02


def test_convert_targets_dense_only_and_is_idempotent():
    from dfine_tpu.models import build_model

    model = build_model("n", num_classes=3, enable_mask_head=False)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    v8 = convert_params_int8(jax.tree.map(np.asarray, v))
    nq, nk = count_int8(v8)
    assert 0 < nq < nk  # Dense kernels quantized, conv kernels untouched
    from flax import traverse_util

    flat = traverse_util.flatten_dict(v8["params"], sep="/")
    for k, a in flat.items():
        if k.endswith("/kernel") and np.asarray(a).ndim == 4:
            assert np.asarray(a).dtype != np.int8  # convs stay fp
    # re-converting converted variables must be a no-op (export_int8.npz load)
    assert convert_params_int8(v8) is v8


@pytest.mark.slow
def test_int8_full_model_forward_runs():
    from dfine_tpu.models import build_model
    from dfine_tpu.postprocess import topk_decode

    model = build_model("n", num_classes=3, enable_mask_head=False)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 320, 320, 3)).astype(np.float32)
    )
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    v8 = jax.tree.map(jnp.asarray, convert_params_int8(jax.tree.map(np.asarray, v)))

    @jax.jit
    def infer(v, x):
        out = apply_int8(model, v, x, train=False)
        return topk_decode(out["pred_logits"], out["pred_boxes"], 300)

    dec = infer(v8, x)
    for leaf in jax.tree.leaves(dec):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    b = np.asarray(dec["boxes"])
    assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()


def test_accuracy_control_revert_kernels():
    """nncf-style per-layer fallback (apps/quant.py): reverting a kernel
    restores exact fp math for that layer while the others stay int8."""
    from dfine_tpu.apps.quant import rank_by_quant_error, revert_kernels

    rng = np.random.default_rng(1)

    class TwoDense(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(48, name="a")(x)
            return nn.Dense(16, name="b")(x)

    m = TwoDense()
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    v_np = jax.tree.map(np.asarray, v)
    v8 = convert_params_int8(v_np)
    assert count_int8(v8) == (2, 2)

    ranking = rank_by_quant_error(v_np, v8)
    assert len(ranking) == 2 and ranking[0][1] >= ranking[1][1] >= 0

    worst = ranking[0][0]
    v8r = revert_kernels(v8, v_np, [worst])
    assert count_int8(v8r) == (1, 2)

    # the reverted layer's sub-output must be exact fp; full model closer
    y_fp = np.asarray(m.apply(v, x))
    y_q = np.asarray(apply_int8(m, jax.tree.map(jnp.asarray, v8), x))
    y_r = np.asarray(apply_int8(m, jax.tree.map(jnp.asarray, v8r), x))
    err_q = np.abs(y_q - y_fp).max()
    err_r = np.abs(y_r - y_fp).max()
    assert err_r <= err_q + 1e-7

    # reverting everything recovers fp bitwise (modulo bf16 dot in w8a16?
    # no: fp kernels bypass the interceptor entirely)
    v8all = revert_kernels(v8, v_np, [k for k, _ in ranking])
    y_all = np.asarray(apply_int8(m, jax.tree.map(jnp.asarray, v8all), x))
    np.testing.assert_allclose(y_all, y_fp, rtol=1e-6, atol=1e-6)


def test_w8a16_packed_matches_w8a16():
    """uint32-packed storage (the axon int8-param-dodge) must reproduce the
    w8a16 path exactly: unpack(pack(q)) == q and identical model output."""
    from dfine_tpu.infer.int8 import (
        _unpack_uint32_kernel,
        pack_int8_params,
        set_int8_mode,
    )

    rng = np.random.default_rng(2)
    # odd input dim exercises the pad-to-multiple-of-4 path
    q = rng.integers(-127, 128, size=(67, 24)).astype(np.int8)
    packed = pack_int8_params(
        {"params": {"kernel": q}, "quant": {"scale": np.ones(24, np.float32)}}
    )
    ku = np.asarray(packed["params"]["kernel"])
    assert ku.dtype == np.uint32 and ku.shape == (17, 24)
    unpacked = np.asarray(_unpack_uint32_kernel(jnp.asarray(ku), 67))
    np.testing.assert_array_equal(unpacked, q.astype(np.int32))

    m = nn.Dense(24)
    x = jnp.asarray(rng.normal(size=(4, 67)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    v8 = convert_params_int8(jax.tree.map(np.asarray, v))
    v8p = pack_int8_params(v8)
    assert not any(
        np.asarray(l).dtype == np.int8
        for l in jax.tree.leaves(v8p)
    ), "packed tree must hold no int8-typed buffers"
    set_int8_mode("w8a16")
    y16 = np.asarray(apply_int8(m, jax.tree.map(jnp.asarray, v8), x))
    y16p = np.asarray(apply_int8(m, jax.tree.map(jnp.asarray, v8p), x))
    np.testing.assert_array_equal(y16, y16p)
