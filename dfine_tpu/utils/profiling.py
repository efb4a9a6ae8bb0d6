"""Profiling / observability (SURVEY aux 5).

The reference only has wall-clock timers + nvidia-smi VRAM polling
(src/dl/utils.py:112-157, bench.py:99-101).  The TPU version keeps the
latency-table UX (see apps/bench.py, apps/test_batching.py) and adds:
* ``trace(dir)``        — jax.profiler context writing a TensorBoard/XProf
                          trace of the wrapped region
* ``device_memory_stats`` — live HBM usage per device (the nvidia-smi analog)
* ``Timer``             — median/percentile wall-clock helper used by bench
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/dfine_tpu_trace"):
    """Profile the enclosed region: `with trace('/tmp/t'): step(...)`."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> List[Dict]:
    """Per-device memory stats in MiB (may be empty on backends that don't
    expose memory_stats, e.g. CPU)."""
    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        if s:
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use_mb": round(s.get("bytes_in_use", 0) / 2**20, 1),
                    "peak_bytes_mb": round(s.get("peak_bytes_in_use", 0) / 2**20, 1),
                    "bytes_limit_mb": round(s.get("bytes_limit", 0) / 2**20, 1),
                }
            )
    return out


class Timer:
    """Wall-clock percentile timer: `t = Timer(); t.lap(); ... t.summary()`."""

    def __init__(self):
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self, skip_first: bool = True) -> Dict[str, float]:
        s = np.asarray(self.samples[1:] if skip_first and len(self.samples) > 1 else self.samples)
        return {
            "n": int(len(s)),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p95_ms": float(np.percentile(s, 95) * 1e3),
        }


def estimate_eta(done: int, total: int, elapsed_s: float) -> float:
    """Remaining seconds estimate (reference src/dl/utils.py:112-127)."""
    if done == 0:
        return float("inf")
    return elapsed_s / done * (total - done)
