"""`make export`: best checkpoint -> serving artifacts (aot/stablehlo/npz).

Mirror of reference src/dl/export.py:184-217 with XLA-native formats."""

from __future__ import annotations

import sys
from pathlib import Path

import jax


def main(argv=None):
    from dfine_tpu.config import cli_config, get_latest_experiment_dir
    from dfine_tpu.export import export_model
    from dfine_tpu.utils.checkpoint import restore_state

    cfg = cli_config(argv if argv is not None else sys.argv[1:])
    t = cfg.train
    models_root = Path(t.path_to_save).parent
    exp_dir = Path(t.path_to_save)
    if not exp_dir.exists():
        exp_dir = get_latest_experiment_dir(models_root, cfg.exp_name)
    state = restore_state(exp_dir / "best.ckpt", None)
    variables = {
        "params": state["ema_params"] if state.get("ema_params") is not None else state["params"],
        "batch_stats": state["ema_batch_stats"]
        if state.get("ema_batch_stats") is not None
        else state.get("batch_stats", {}),
    }
    num_classes = 1 if t.use_one_class else len(t.label_to_name)
    artifacts = export_model(
        cfg.model_name,
        variables,
        num_classes,
        exp_dir / "export",
        input_size=tuple(t.img_size),
        half=bool(cfg.export.half),
        max_batch_size=int(cfg.export.max_batch_size),
        enable_mask_head=cfg.task == "segment",
        formats=tuple(cfg.export.get("formats", ("aot", "stablehlo", "npz"))),
        dynamic_batch=bool(cfg.export.get("dynamic_input", False)),
    )
    for fmt, path in artifacts.items():
        print(f"exported {fmt}: {path}")


if __name__ == "__main__":
    main()
