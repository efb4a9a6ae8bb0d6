"""Config system — hydra/omegaconf replacement (neither ships in this image).

Mirrors the reference's single-config UX (reference config.yaml:1-160,
README.md:50-55): one YAML file, ``${dotted.path}`` interpolation (including
nested interpolation like ``${train.lrs.${model_name}.base_lr}``),
``${now:%fmt}`` timestamps, and CLI dotted overrides
(``python -m dfine_tpu.apps.train exp_name=x train.epochs=5``).

Access is attribute-style (cfg.train.base_lr) like omegaconf.
"""

from __future__ import annotations

import copy
import datetime
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

_INTERP = re.compile(r"\$\{([^${}]+)\}")


class ConfigNode(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _lookup(root: dict, dotted: str):
    cur: Any = root
    for part in dotted.split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        else:
            cur = cur[part]
    return cur


def _resolve_str(s: str, root: dict, depth: int = 0):
    if depth > 20:
        raise ValueError(f"interpolation loop at {s!r}")
    while True:
        m = _INTERP.search(s)
        if not m:
            return s
        expr = m.group(1)
        if expr.startswith("now:"):
            val: Any = datetime.datetime.now().strftime(expr[4:])
        else:
            val = _lookup(root, expr)
            if isinstance(val, str) and _INTERP.search(val):
                val = _resolve_str(val, root, depth + 1)
        if m.span() == (0, len(s)):
            return val  # full-string interpolation keeps the value's type
        s = s[: m.start()] + str(val) + s[m.end() :]


def _resolve_tree(obj, root):
    if isinstance(obj, dict):
        return {k: _resolve_tree(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_tree(v, root) for v in obj]
    if isinstance(obj, str):
        return _resolve_str(obj, root)
    return obj


def _parse_value(v: str):
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def apply_overrides(raw: dict, overrides: List[str]) -> dict:
    raw = copy.deepcopy(raw)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must look like key.path=value")
        key, val = ov.split("=", 1)
        parts = key.strip().split(".")
        cur = raw
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _parse_value(val)
    return raw


def load_config(
    path: str | Path = "config.yaml", overrides: Optional[List[str]] = None
) -> ConfigNode:
    with open(path) as f:
        raw = yaml.safe_load(f)
    if overrides:
        raw = apply_overrides(raw, overrides)
    # multi-pass: interpolations may reference interpolated values
    resolved = raw
    for _ in range(5):
        nxt = _resolve_tree(resolved, resolved)
        if nxt == resolved:
            break
        resolved = nxt
    return ConfigNode.wrap(resolved)


def save_config(cfg: ConfigNode, path: str | Path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict() if isinstance(cfg, ConfigNode) else cfg, f, sort_keys=False)


def cli_config(argv: List[str], default_path: str = "config.yaml") -> ConfigNode:
    """Entry-point helper: first positional arg ending in .yaml selects the
    file; everything else is a dotted override."""
    path = default_path
    overrides = []
    for a in argv:
        if a.endswith((".yaml", ".yml")) and "=" not in a:
            path = a
        else:
            overrides.append(a)
    return load_config(path, overrides)


def get_latest_experiment_dir(models_root: Path, exp_name: str) -> Path:
    """Resolve the newest date-stamped experiment directory
    (reference src/dl/utils.py:789-806)."""
    candidates = sorted(
        [p for p in Path(models_root).glob(f"{exp_name}_*") if p.is_dir()],
        key=lambda p: p.name,
    )
    if not candidates:
        raise FileNotFoundError(f"no experiment dirs matching {exp_name}_* in {models_root}")
    return candidates[-1]
