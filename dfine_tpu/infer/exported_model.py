"""Exported-artifact serving backend — the ONNX/OpenVINO analog.

Loads a ``jax.export`` StableHLO artifact produced by dfine_tpu.export (a
self-contained serialized program with weights baked in, portable across
processes and compatible JAX versions) and executes it.  This is the TPU
counterpart of shipping an .onnx/.xml file to a runtime."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .base import BaseServing


class ExportedModel(BaseServing):
    def __init__(self, *args, artifact_path: Optional[str] = None, **kwargs):
        self.artifact_path = artifact_path
        super().__init__(*args, **kwargs)

    def _build(self) -> None:
        from jax import export as jexport

        if self.artifact_path and Path(self.artifact_path).exists():
            blob = Path(self.artifact_path).read_bytes()
            self._exported = jexport.deserialize(bytearray(blob))
        else:
            # export in-process (mirrors building an engine on first load)
            from ..export import make_exported

            self._exported = make_exported(
                self.model, self.variables, self.input_size, self.num_top_queries
            )
        self._call = jax.jit(self._exported.call)

    def _predict(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        decoded = self._call(jnp.asarray(images))
        return jax.tree.map(np.asarray, decoded)
