"""Trainer-level multi-host e2e (VERDICT r3 item #4): 2 OS processes x 2 CPU
devices each run the FULL Trainer.train + evaluate on a small synthetic set;
final params and metrics must match the single-process 4-device run.

Composes what tests/test_multihost.py only exercises piecewise: global-batch
construction (dp.py shard_batch), strided eval + gather_objects
(trainer.evaluate), and rank-0 checkpoint writes."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

OVERRIDES = [
    "model_name=n",
    "task=segment",
    "train.img_size=[160,160]",
    "train.batch_size=8",
    "train.epochs=2",
    "train.use_wandb=false",
    "train.keep_ratio=false",
    "train.max_gt=6",
    "train.num_workers=1",
    "train.pretrained_model_path=",
    "train.seed=42",
    "train.early_stopping=0",
    "train.ignore_background_epochs=0",
    "train.label_to_name={0: ellipse, 1: rectangle, 2: triangle}",
    "train.to_visualize_eval=false",
    "train.debug_img_processing=false",
    "train.mosaic_augs.mosaic_prob=0.0",
    "train.augs.rotation_p=0.0",
    "train.augs.multiscale_prob=0.0",
    "train.augs.rotate_90=0.0",
    "train.augs.left_right_flip=0.0",
    "train.augs.up_down_flip=0.0",
    "train.augs.to_gray=0.0",
    "train.augs.gamma=0.0",
    "train.augs.blur=0.0",
    "train.augs.brightness=0.0",
    "train.augs.noise=0.0",
    "train.augs.coarse_dropout=0.0",
    "train.dp.enabled=true",
    "train.dp.n_devices=4",
]

# argv: pid nproc port dev_per_proc repo overrides_json out_dir tag
WORKER = r"""
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
import os

pid, nproc, port, dev_per_proc = (int(a) for a in sys.argv[1:5])
repo, overrides_json, out_dir, tag = sys.argv[5:9]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=%d" % dev_per_proc
)
sys.path.insert(0, repo)
sys.path.insert(0, repo + "/tests")

from dfine_tpu.config import load_config

overrides = json.loads(overrides_json)
if nproc > 1:
    overrides += [
        "train.dp.multihost.enabled=true",
        "train.dp.multihost.coordinator_address=localhost:%d" % port,
        "train.dp.multihost.num_processes=%d" % nproc,
        "train.dp.multihost.process_id=%d" % pid,
    ]
cfg = load_config(repo + "/config.yaml", overrides)

from dfine_tpu.train.trainer import Trainer

trainer = Trainer(cfg)
final = trainer.train()

if jax.process_index() == 0:
    import numpy as np
    from dfine_tpu.utils.checkpoint import save_params_npz

    ev = jax.tree.map(np.asarray, trainer.state.eval_variables(use_ema=True))
    save_params_npz(out_dir + "/final_params_" + tag + ".npz", ev)
    metrics = {k: v for k, v in final["val"].items()
               if isinstance(v, (int, float))}
    with open(out_dir + "/metrics_" + tag + ".json", "w") as f:
        json.dump(metrics, f)
print("WORKER%d_DONE" % pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(args):
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu"}
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, *map(str, args)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )


def _overrides_json(data_root, run_dir):
    over = OVERRIDES + [
        f"train.data_path={data_root}",
        f"train.path_to_save={run_dir}",
        f"train.eval_preds_path={run_dir}/eval_preds",
    ]
    return json.dumps(over)


@pytest.mark.slow
def test_trainer_two_process_matches_single_process(tmp_path):
    sys.path.insert(0, str(REPO / "tools"))
    from synth_dataset import generate

    data_root = tmp_path / "data"
    generate(data_root, 24, 8, 160, seed=0)

    # --- 2-process pod: 2 CPU devices each, shared checkpoint dir
    port = _free_port()
    run_multi = tmp_path / "run_multi"
    oj = _overrides_json(data_root, run_multi)
    procs = [
        _spawn([i, 2, port, 2, str(REPO), oj, str(tmp_path), "multi"])
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1800) for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][1][-4000:]}"
        assert f"WORKER{i}_DONE" in outs[i][0]

    assert (tmp_path / "final_params_multi.npz").exists()
    assert run_multi.exists() and any(run_multi.iterdir())

    # --- single-process 4-device reference, same seed/data/config
    run_single = tmp_path / "run_single"
    oj1 = _overrides_json(data_root, run_single)
    p = _spawn([0, 1, _free_port(), 4, str(REPO), oj1, str(tmp_path), "single"])
    out, err = p.communicate(timeout=1800)
    assert p.returncode == 0, f"single-proc run failed:\n{err[-4000:]}"

    # --- params must match (the composed training math is identical)
    with np.load(tmp_path / "final_params_multi.npz") as zm, \
         np.load(tmp_path / "final_params_single.npz") as zs:
        assert set(zm.files) == set(zs.files)
        worst = 0.0
        for k in zm.files:
            a, b = zm[k], zs[k]
            assert a.shape == b.shape, k
            if a.dtype.kind == "f":
                scale = max(np.abs(b).max(), 1e-6)
                worst = max(worst, float(np.abs(a - b).max() / scale))
        assert worst < 5e-3, f"max relative param divergence {worst}"

    m_multi = json.loads((tmp_path / "metrics_multi.json").read_text())
    m_single = json.loads((tmp_path / "metrics_single.json").read_text())
    for k in ("f1", "mAP_50"):
        assert abs(m_multi.get(k, 0.0) - m_single.get(k, 0.0)) < 0.05, (
            k, m_multi.get(k), m_single.get(k))
