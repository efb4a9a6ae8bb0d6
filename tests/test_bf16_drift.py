"""bf16-vs-fp32 drift guard (the probe the verify skill recommends).

At random init the decoder's top-300-of-sumHW selection ranks scores that
sit in a ~1e-4 band, so bf16 rounding permutes WHICH anchors are selected —
elementwise output comparison is meaningless.  Instead we bound drift where
it is well-posed: the backbone+encoder feature maps (no selection) and the
distribution of decoder scores."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfine_tpu.configs import model_config
from dfine_tpu.models import build_model
from dfine_tpu.models.hgnetv2 import HGNetv2
from dfine_tpu.models.hybrid_encoder import HybridEncoder


def _encoder(dtype):
    mc = model_config("n")
    e = mc["encoder"]
    bb = HGNetv2(name_=mc["backbone"]["name"], use_lab=mc["backbone"]["use_lab"],
                 return_idx=tuple(mc["backbone"]["return_idx"]), dtype=dtype)
    enc = HybridEncoder(
        in_channels=tuple(e["in_channels"]), feat_strides=tuple(e["feat_strides"]),
        hidden_dim=e["hidden_dim"], nhead=e["nhead"], dim_feedforward=e["dim_feedforward"],
        enc_act=e["enc_act"], use_encoder_idx=tuple(e["use_encoder_idx"]),
        num_encoder_layers=e["num_encoder_layers"], expansion=e["expansion"],
        depth_mult=e["depth_mult"], act=e["act"], dtype=dtype,
    )
    return bb, enc


@pytest.mark.slow
def test_bf16_features_close_to_fp32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 320, 320, 3)).astype(np.float32))

    bb32, enc32 = _encoder(jnp.float32)
    bv = bb32.init({"params": jax.random.key(0)}, x, False)
    feats32 = bb32.apply(bv, x, False)
    ev = enc32.init({"params": jax.random.key(1)}, feats32, False)
    outs32, _ = enc32.apply(ev, feats32, False)

    bb16, enc16 = _encoder(jnp.bfloat16)
    feats16 = bb16.apply(bv, x, False)
    outs16, _ = enc16.apply(ev, [f.astype(jnp.bfloat16) for f in feats16], False)

    for o32, o16 in zip(outs32, outs16):
        a = np.asarray(o32, np.float32)
        b = np.asarray(o16, np.float32)
        assert np.isfinite(b).all()
        scale = np.abs(a).mean() + 1e-6
        rel = np.abs(a - b).mean() / scale
        assert rel < 0.05, rel  # mean relative feature drift bounded


@pytest.mark.slow
def test_bf16_score_distribution_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 320, 320, 3)).astype(np.float32))
    m32 = build_model("n", num_classes=5, dtype=jnp.float32)
    v = m32.init({"params": jax.random.key(0)}, x, train=False)
    out32 = m32.apply(v, x, train=False)
    m16 = build_model("n", num_classes=5, dtype=jnp.bfloat16)
    out16 = m16.apply(v, x, train=False)

    s32 = np.sort(np.asarray(jax.nn.sigmoid(out32["pred_logits"]), np.float32).reshape(-1))
    s16 = np.sort(np.asarray(jax.nn.sigmoid(out16["pred_logits"]), np.float32).reshape(-1))
    assert np.isfinite(s16).all()
    # sorted score distributions must agree closely even if selection order
    # among near-ties differs
    assert np.abs(s32 - s16).max() < 0.05
