"""Pretrained-weight bootstrap: URL table + cached fetch + offline fallback.

Mirrors the reference's stage1-backbone auto-download (reference
src/d_fine/arch/hgnetv2.py:354-441 URL table, :490-545 rank-0-coordinated
fetch) for the "fresh clone -> fine-tune" workflow:

* ``train.pretrained_model_path: auto`` resolves to the PPHGNetV2 stage1
  checkpoint for the current model size's backbone, downloading it into a
  local cache on first use (rank 0 downloads; other processes wait for the
  file — the torch.distributed.barrier analog under single-controller SPMD).
* A URL value is fetched-and-cached the same way.
* Offline (this image has no egress), the helper degrades GRACEFULLY: if a
  manually staged file exists in the cache it is used; otherwise it logs the
  manual-download instruction and returns None so training proceeds from
  random init (the reference hard-exits here, :545 — for a training
  framework a warned random-init start is strictly more useful).

Stage1 checkpoints hold BACKBONE-RELATIVE keys (the reference loads them
with ``HGNetv2.load_state_dict(state)``); ``load_stage1_backbone`` prefixes
them onto the assembled model before the shared torch importer runs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

# reference hgnetv2.py arch_configs[...]["url"] — verbatim (release assets)
_STAGE1_URL = "https://github.com/Peterande/storage/releases/download/dfinev1.0/PPHGNetV2_{arch}_stage1.pth"
STAGE1_URLS = {f"B{i}": _STAGE1_URL.format(arch=f"B{i}") for i in range(7)}

# model size -> backbone arch (reference configs.py:54-200; ours configs.py)
SIZE_TO_ARCH = {"n": "B0", "s": "B0", "m": "B2", "l": "B4", "x": "B5"}


def cache_dir() -> Path:
    d = Path(os.environ.get(
        "DFINE_WEIGHTS_DIR", os.path.expanduser("~/.cache/dfine_tpu/weights")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _is_rank0() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def fetch(url: str, timeout: float = 60.0, logger=None) -> Optional[Path]:
    """Download ``url`` into the cache (rank 0 only; other ranks poll for the
    finished file).  Returns the local path, or None when offline and the
    file was never staged."""
    import time

    log = logger.info if logger is not None else print
    name = url.rsplit("/", 1)[-1]
    dst = cache_dir() / name
    if dst.exists():
        log(f"pretrained: using cached {dst}")
        return dst
    if not _is_rank0():
        # barrier analog: wait for rank 0's completed download
        deadline = time.time() + timeout
        while time.time() < deadline:
            if dst.exists() and not (dst.parent / (name + ".part")).exists():
                return dst
            time.sleep(1.0)
        return None
    part = dst.parent / (name + ".part")
    try:
        from urllib.request import urlopen

        log(f"pretrained: downloading {url} -> {dst}")
        with urlopen(url, timeout=timeout) as r, open(part, "wb") as f:
            while True:
                buf = r.read(1 << 20)
                if not buf:
                    break
                f.write(buf)
        part.rename(dst)
        return dst
    except Exception as e:  # offline / blocked egress
        part.unlink(missing_ok=True)
        log(
            f"pretrained: download failed ({type(e).__name__}: {e}). "
            f"Download manually from {url} and place it at {dst} "
            f"(or set DFINE_WEIGHTS_DIR). Continuing from random init."
        )
        return None


def resolve_pretrained(spec: str, model_name: str, logger=None) -> Optional[Path]:
    """Resolve ``train.pretrained_model_path`` to a local file.

    * ``"auto"``: the stage1 PPHGNetV2 checkpoint for this size's backbone
    * ``http(s)://...``: fetch-and-cache
    * anything else: treated as a local path (None if missing)
    """
    if not spec:
        return None
    if spec == "auto":
        arch = SIZE_TO_ARCH.get(model_name, "B0")
        return fetch(STAGE1_URLS[arch], logger=logger)
    if spec.startswith(("http://", "https://")):
        return fetch(spec, logger=logger)
    p = Path(spec)
    return p if p.exists() else None


def is_stage1_backbone_sd(sd: Dict) -> bool:
    """Stage1 files hold backbone-relative keys (``stem...``/``stages...``),
    not assembled-model keys (``backbone...``/``decoder...``)."""
    return any(k.startswith(("stem", "stages")) for k in sd) and not any(
        k.startswith(("backbone.", "decoder.", "encoder.")) for k in sd
    )


def load_pretrained(path: Path, variables_template: Dict,
                    num_classes: Optional[int] = None, logger=None) -> Dict:
    """Load either a full-model checkpoint or a stage1 backbone-only file
    (auto-detected) through the shared shape-filtered torch importer."""
    from .checkpoint import _torch_state_dict, load_torch_checkpoint

    sd = _torch_state_dict(Path(path))
    if is_stage1_backbone_sd(sd):
        if logger is not None:
            logger.info(f"pretrained: stage1 backbone-only checkpoint {path}")
        sd = {f"backbone.{k}": v for k, v in sd.items()}
    return load_torch_checkpoint(sd, variables_template, num_classes)
