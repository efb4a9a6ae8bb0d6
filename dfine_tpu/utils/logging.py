"""Logging / metrics sinks.

Console + per-experiment ``train_log.txt`` (the reference uses loguru,
src/dl/train.py:125-128 — loguru is not in this image, stdlib logging is
equivalent here), ``metrics.csv`` / ``extended_metrics.csv`` tables
(reference src/dl/utils.py:74-100), and an optional wandb gate
(reference train.py:118-123; wandb is absent in this image so the gate
no-ops unless it is importable).
"""

from __future__ import annotations

import csv
import logging
import sys
from pathlib import Path
from typing import Dict, Optional


def get_logger(log_file: Optional[Path] = None, name: str = "dfine_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s | %(levelname)s | %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsCSV:
    """Append-mode CSV with a stable header (reference utils.py:74-100)."""

    def __init__(self, path: Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._header = None

    def log(self, row: Dict) -> None:
        row = {k: (float(v) if hasattr(v, "item") else v) for k, v in row.items()}
        new = not self.path.exists()
        if self._header is None:
            self._header = list(row.keys())
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._header, extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(row)


class WandbGate:
    """No-op unless wandb is importable and enabled
    (reference train.py:118-123, 582-583)."""

    def __init__(self, enabled: bool, project: str, exp: str, config: dict):
        self.run = None
        if not enabled:
            return
        try:
            import wandb

            self.run = wandb.init(project=project, name=exp, config=config)
        except Exception:
            self.run = None

    def log(self, data: Dict, step: Optional[int] = None) -> None:
        if self.run is not None:
            self.run.log(data, step=step)

    def watch(self, params, grad_norm: Optional[float] = None,
              step: Optional[int] = None, sample: int = 8192) -> None:
        """Parameter-histogram logging — the ``wandb.watch(model)`` analog
        (reference train.py:118-123).  JAX grads are not retained between
        steps, so per-epoch param histograms (per top-level module) + the
        scalar grad norm stand in for torch's hook-based watch."""
        if self.run is None:
            return
        try:
            import numpy as np
            import wandb

            data: Dict = {}
            for name, sub in params.items():
                import jax

                leaves = jax.tree.leaves(sub)
                if not leaves:
                    continue
                flat = np.concatenate([np.asarray(l).reshape(-1) for l in leaves])
                if flat.size > sample:
                    flat = flat[:: max(1, flat.size // sample)]
                data[f"params/{name}"] = wandb.Histogram(flat)
            if grad_norm is not None:
                data["grad_norm"] = float(grad_norm)
            self.run.log(data, step=step)
        except Exception:
            pass

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()
