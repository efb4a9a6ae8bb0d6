"""Pretrained-weight bootstrap: auto-resolution, stage1 backbone load,
offline fallback (reference hgnetv2.py:354-441,490-545 equivalence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfine_tpu.utils.pretrained import (
    STAGE1_URLS,
    fetch,
    is_stage1_backbone_sd,
    load_pretrained,
    resolve_pretrained,
)

torch = pytest.importorskip("torch")


def _stage1_file(tmp_path, monkeypatch, arch="B0"):
    """Stage a stage1-style backbone checkpoint in the weights cache the way
    a user would after a manual download (this image has no egress)."""
    from reference_compat import build_reference_model

    monkeypatch.setenv("DFINE_WEIGHTS_DIR", str(tmp_path))
    ref = build_reference_model("n", 3)  # n uses the B0 backbone
    sd = ref.backbone.state_dict()
    name = STAGE1_URLS[arch].rsplit("/", 1)[-1]
    torch.save(sd, tmp_path / name)
    return ref, tmp_path / name


def test_auto_resolves_staged_stage1_offline(tmp_path, monkeypatch):
    ref, path = _stage1_file(tmp_path, monkeypatch)
    resolved = resolve_pretrained("auto", "n")
    assert resolved == path  # cached file wins; no network touched


def test_stage1_backbone_load_into_assembled_model(tmp_path, monkeypatch):
    ref, path = _stage1_file(tmp_path, monkeypatch)
    from dfine_tpu.models import build_model, jit_init

    model = build_model("n", num_classes=3, enable_mask_head=False)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = jit_init(model, {"params": jax.random.key(0)}, x, train=False)
    before = np.asarray(
        variables["params"]["decoder"]["dec_score_head_0"]["kernel"]
    ).copy()

    loaded = load_pretrained(path, variables, num_classes=3)

    # backbone stem conv must now match the reference backbone bitwise
    ref_k = ref.backbone.stem.stem1.conv.weight.detach().numpy()
    ours_k = np.asarray(loaded["params"]["backbone"]["stem"]["stem1"]["conv"]["kernel"])
    np.testing.assert_allclose(ours_k, ref_k.transpose(2, 3, 1, 0), atol=0)

    # and a backbone BN running stat
    ref_m = ref.backbone.stem.stem1.bn.running_mean.detach().numpy()
    ours_m = np.asarray(loaded["batch_stats"]["backbone"]["stem"]["stem1"]["bn"]["mean"])
    np.testing.assert_allclose(ours_m, ref_m, atol=0)

    # decoder stays at init (stage1 file carries no decoder tensors)
    after = np.asarray(loaded["params"]["decoder"]["dec_score_head_0"]["kernel"])
    np.testing.assert_array_equal(before, after)


def test_stage1_detection():
    sd_stage1 = {"stem.stem1.conv.weight": np.zeros(1), "stages.0.x": np.zeros(1)}
    sd_full = {"backbone.stem.stem1.conv.weight": np.zeros(1),
               "decoder.dec_score_head.0.weight": np.zeros(1)}
    assert is_stage1_backbone_sd(sd_stage1)
    assert not is_stage1_backbone_sd(sd_full)


def test_offline_fetch_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("DFINE_WEIGHTS_DIR", str(tmp_path))
    out = fetch("https://invalid.invalid/nothing.pth", timeout=2.0)
    assert out is None
    assert not list(tmp_path.glob("*.part"))  # no partial file left behind


def test_trainer_config_auto_offline_is_gracious(tmp_path, monkeypatch):
    """train.pretrained_model_path=auto with an empty cache and no network
    must resolve to None (random init), not raise."""
    monkeypatch.setenv("DFINE_WEIGHTS_DIR", str(tmp_path))
    import dfine_tpu.utils.pretrained as P

    monkeypatch.setattr(
        P, "fetch", lambda url, timeout=60.0, logger=None: None
    )
    assert resolve_pretrained("auto", "m") is None
