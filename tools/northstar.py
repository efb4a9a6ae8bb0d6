"""Realistic-scale north-star training run (VERDICT r3 item #2).

Trains the headline config — D-FINE-m @ 640, segment task, full
augmentation pipeline (mosaic + affine + photometric) ON — on a
reference-scale synthetic dataset (5000 train / 1000 val, 21 classes,
variable density; runs/northstar_ds via tools/synth_dataset.py) for a
fixed wall-clock/epoch budget, exercising the composed system where the
reference lives (reference README.md:99-112 trains D-FINE-m@640 on a
few-thousand-image dataset with the full pipeline, train.py:481-634).

Resumable: re-launching with the same --out continues from the latest
full-state checkpoint (orbax TrainState resume).  Phases:

  python tools/northstar.py train --epochs 8          # the run itself
  python tools/northstar.py post                      # ckpt -> export -> infer smoke

Artifacts land in --out (default runs/northstar_run): metrics.csv,
train log (epoch wall-clock + loader stats), best/last checkpoints,
then exported artifacts from the post phase.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CLASSES = 21
LABEL_MAP = "{" + ", ".join(f"{i}: c{i:02d}" for i in range(N_CLASSES)) + "}"


def build_overrides(args, resume: bool):
    out = Path(args.out)
    over = [
        "model_name=m",
        "task=segment",
        f"train.data_path={args.data}",
        "train.img_size=[640,640]",
        "train.batch_size=8",
        f"train.epochs={args.epochs}",
        f"train.seed={args.seed}",
        "train.max_gt=100",
        "train.num_workers=3",          # 1-core host: keep prefetch threads modest
        "train.cache_images_mb=12000",  # 5k decoded 640px frames fit in RAM
        "train.use_wandb=false",
        "train.keep_ratio=false",
        "train.early_stopping=0",
        "train.pretrained_model_path=",  # random init: synthetic classes
        f"train.path_to_save={out}",
        f"train.eval_preds_path={out}/eval_preds",
        f"train.label_to_name={LABEL_MAP}",
        "train.to_visualize_eval=false",
        "train.debug_img_processing=false",
        # augs + mosaic stay at config.yaml defaults: ON (the point of the run)
    ]
    if resume:
        over.append("train.resume=true")
    return over


def build_cfg(args, resume: bool):
    from dfine_tpu.config import load_config

    return load_config(REPO / "config.yaml", build_overrides(args, resume))


def _compile_cache():
    import os

    import jax

    # persistent TPU compile cache shared with bench/parity tools: a
    # resumed session skips the multi-minute m@640 remote compiles
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dfine_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def cmd_train(args):
    _compile_cache()
    from dfine_tpu.train.trainer import Trainer

    out = Path(args.out)
    # trainer saves <out>/last.ckpt (trainer.py save_state layout) — gate
    # resume on exactly that file (ADVICE r4 high: the old 'ckpt*' glob never
    # matched 'last.ckpt', silently restarting multi-session runs at epoch 0)
    resume = (out / "last.ckpt").exists()
    cfg = build_cfg(args, resume=resume)
    t0 = time.time()
    trainer = Trainer(cfg)
    final = trainer.train()
    dur = time.time() - t0
    res = {
        "config": "D-FINE-m@640 segment, augs+mosaic ON",
        "dataset": f"{args.data} (5000/1000, {N_CLASSES} classes)",
        "epochs": args.epochs,
        "resumed": resume,
        "wall_s": round(dur, 1),
        "val": {k: v for k, v in final["val"].items() if isinstance(v, (int, float))},
    }
    (out / "northstar_result.json").write_text(json.dumps(res, indent=2))
    print(json.dumps(res, indent=2))


def cmd_post(args):
    """Flow the trained checkpoint through export -> serving smoke
    (VERDICT r3 item #2: 'the resulting checkpoint flowing through
    export -> bench -> infer')."""
    import numpy as np

    _compile_cache()
    from dfine_tpu.train.trainer import Trainer

    out = Path(args.out)
    # fail loudly rather than export/eval random-init weights (ADVICE r4:
    # load_checkpoint silently no-ops when the file is missing)
    assert (out / "best.ckpt").exists(), f"no trained checkpoint at {out}/best.ckpt — run the train phase first"
    cfg = build_cfg(args, resume=False)
    tr = Trainer(cfg)
    tr.load_checkpoint("best")
    m = tr.evaluate("val")
    print("best-ckpt val:", {k: round(v, 4) for k, v in m.items()
                             if isinstance(v, (int, float))})

    from dfine_tpu.export import export_model

    arts = export_model(
        "m", tr._current_eval_variables(), N_CLASSES, out / "export",
        input_size=(640, 640), enable_mask_head=True,
    )
    print("exported:", {k: str(v) for k, v in arts.items()})

    # infer smoke on val images through the jit serving backend, fed by the
    # exported npz weights (ckpt -> export -> infer, the full artifact path)
    from dfine_tpu.infer.jax_model import JAXModel

    model = JAXModel("m", str(arts["npz"]), N_CLASSES,
                     enable_mask_head=True, conf_thresh=0.5)
    img_dir = Path(args.data) / "images"
    val_names = (Path(args.data) / "val.csv").read_text().split()[:4]
    import cv2

    for n in val_names:
        im = cv2.imread(str(img_dir / n))
        preds = model(im)[0]
        print(n, "dets:", len(np.asarray(preds["scores"])))


def cmd_quant(args):
    """Accuracy-controlled int8 quantization of the trained north-star
    checkpoint (VERDICT r4 item #4: `make quant` end-to-end on a trained
    experiment).  Reuses build_cfg so the quant app sees the EXACT training
    config (model m, segment, 21-class label map, same val set); mirrors
    the reference's ov_int8 flow (ov_int8.py:130-139)."""
    _compile_cache()
    out = Path(args.out)
    assert (out / "best.ckpt").exists(), \
        f"no trained checkpoint at {out}/best.ckpt — run the train phase first"
    from dfine_tpu.apps.quant import main as quant_main

    # quant app takes CLI-style dotted overrides; feed it the same ones the
    # train phase resolved, so it evaluates on the identical val protocol
    quant_main([str(REPO / "config.yaml")] + build_overrides(args, resume=False))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("train", "post", "quant"):
        p = sub.add_parser(name)
        p.add_argument("--data", default="runs/northstar_ds")
        p.add_argument("--out", default="runs/northstar_run")
        p.add_argument("--epochs", type=int, default=8)
        p.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    {"train": cmd_train, "post": cmd_post, "quant": cmd_quant}[args.cmd](args)
