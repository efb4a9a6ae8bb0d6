"""Config system: interpolation, nested interpolation, CLI overrides."""

from pathlib import Path

import pytest

from dfine_tpu.config import apply_overrides, cli_config, get_latest_experiment_dir, load_config


def test_repo_config_interpolation():
    cfg = load_config("config.yaml", overrides=["model_name=l", "exp_name=abc"])
    # nested interpolation ${train.lrs.${model_name}.base_lr}
    assert cfg.train.base_lr == 0.000125
    assert cfg.train.backbone_lr == 0.00000625
    # date-stamped experiment name
    assert cfg.exp.startswith("abc_20")
    # path interpolation
    assert cfg.train.data_path.endswith("/data/dataset")
    assert "abc_20" in cfg.train.path_to_save


def test_overrides_typed():
    raw = {"a": {"b": 1}, "c": "x"}
    out = apply_overrides(raw, ["a.b=2.5", "c=[1, 2]", "a.new=hello", "d.e=true"])
    assert out["a"]["b"] == 2.5
    assert out["c"] == [1, 2]
    assert out["a"]["new"] == "hello"
    assert out["d"]["e"] is True


def test_cli_config_yaml_selection(tmp_path):
    p = tmp_path / "alt.yaml"
    p.write_text("x: 1\ny: ${x}\n")
    cfg = cli_config([str(p), "x=7"])
    assert cfg.x == 7 and cfg.y == 7


def test_latest_experiment_dir(tmp_path):
    (tmp_path / "exp_2026-01-01").mkdir()
    (tmp_path / "exp_2026-03-05").mkdir()
    (tmp_path / "other_2026-09-09").mkdir()
    assert get_latest_experiment_dir(tmp_path, "exp").name == "exp_2026-03-05"
    with pytest.raises(FileNotFoundError):
        get_latest_experiment_dir(tmp_path, "nope")
