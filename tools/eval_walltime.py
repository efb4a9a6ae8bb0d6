"""Eval-epoch wall-clock probe (VERDICT r2 next-round item #9).

Times ``Trainer.evaluate`` end-to-end — eval forward on the TPU, decode,
mask RLE, coco_map + greedy-F1 metric tail — on a ~500-image synthetic
det+seg val set (tools/synth_dataset.py shapes, n@320, the
convergence-parity recipe).  The first evaluate() compiles; the second is
the honest steady-state number.  Prints wall seconds, eval img/s, and the
eval:train epoch-time ratio for a same-size train split so the <20%% budget
claim is checked against a measurement, not an estimate.

Usage: python tools/eval_walltime.py --root /tmp/evalwall [--n-val 500]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.convergence_parity import build_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/evalwall")
    ap.add_argument("--n-val", type=int, default=500)
    ap.add_argument("--n-train", type=int, default=64)
    args = ap.parse_args()

    root = Path(args.root)
    if not (root / "val.csv").exists():
        from tools.synth_dataset import generate

        generate(root, args.n_train, args.n_val, 320, seed=0)
        print(f"dataset: {args.n_train} train / {args.n_val} val at {root}")

    from dfine_tpu.train.trainer import Trainer

    cfg = build_cfg(root, epochs=1, out_dir=root / "run_evalwall")
    trainer = Trainer(cfg)

    t0 = time.time()
    trainer.evaluate("val")
    print(f"evaluate #1 (compile + run): {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    m = trainer.evaluate("val")
    wall = time.time() - t0
    n = args.n_val
    print(f"evaluate #2 (steady state):  {wall:.1f} s -> {n / wall:.1f} img/s "
          f"(f1={m.get('f1', float('nan')):.4f} mAP50={m.get('mAP_50', float('nan')):.4f})")

    # train-epoch comparison on the same data/model so the ratio is honest:
    # run the trainer's own step loop (epoch 0 compiles, epoch 1 is timed)
    import jax

    per_step = None
    for epoch in (0, 1):
        trainer.train_iter.set_epoch(epoch)
        t0 = time.time()
        count = 0
        for batch in trainer.train_iter:
            batch = trainer._to_device(batch)
            trainer.rng, step_rng = jax.random.split(trainer.rng)
            trainer.state, metrics = trainer.train_step(trainer.state, batch, step_rng)
            count += 1
        jax.block_until_ready(metrics["loss"])
        if epoch == 1:
            per_step = (time.time() - t0) / count
    bs = int(cfg.train.batch_size)
    train_imgs_per_s = bs / per_step
    # scale the train epoch to the val-set size: eval budget as % of the
    # epoch a SAME-SIZE train split would take (VERDICT framing)
    epoch_s = args.n_val / train_imgs_per_s
    print(f"train step: {per_step * 1000:.1f} ms (bs{bs}) -> {train_imgs_per_s:.1f} img/s; "
          f"{args.n_val}-img train epoch = {epoch_s:.1f} s; "
          f"eval/epoch ratio = {wall / epoch_s:.1%}", flush=True)


if __name__ == "__main__":
    main()
