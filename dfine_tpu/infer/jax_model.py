"""JIT serving backend — the reference Torch_model analog
(src/infer/torch_model.py:14-380): trace-on-first-call per input shape,
XLA-fused forward + NMS-free top-k decode in one program."""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..postprocess import topk_decode
from .base import BaseServing


class JAXModel(BaseServing):
    def _build(self) -> None:
        model = self.model
        k = self.num_top_queries

        @jax.jit
        def infer(variables, images):
            out = model.apply(variables, images, train=False)
            dec = topk_decode(
                out["pred_logits"], out["pred_boxes"], k, masks=out.get("pred_masks")
            )
            if "masks" in dec:  # D2H diet: top-100 strongest, bf16 (see bench.py)
                dec["masks"] = dec["masks"][:, :100].astype(jnp.bfloat16)
            return dec

        self._infer = infer

    def _predict(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        decoded = self._infer(self.variables, jnp.asarray(images))
        return jax.tree.map(np.asarray, decoded)

    def warmup(self, hw_buckets) -> None:
        """Populate the jit shape cache for every (h, w) bucket so first
        requests at those shapes run at steady-state latency."""
        for h, w in hw_buckets:
            out = self._infer(self.variables, jnp.zeros((1, h, w, 3), jnp.float32))
        jax.block_until_ready(out)


class Int8Model(JAXModel):
    """INT8 serving backend — the reference's OpenVINO-INT8 engine analog
    (src/infer + ov_int8.py), but executing REAL int8 dot_generals on the MXU
    (see dfine_tpu/infer/int8.py).  Same uniform __call__ contract."""

    def _load_variables(self, model_path):
        from .int8 import convert_params_int8

        v = super()._load_variables(model_path)
        return jax.tree.map(
            jnp.asarray, convert_params_int8(jax.tree.map(np.asarray, v))
        )

    def _build(self) -> None:
        from .int8 import apply_int8

        model = self.model
        k = self.num_top_queries

        @jax.jit
        def infer(variables, images):
            out = apply_int8(model, variables, images, train=False)
            dec = topk_decode(
                out["pred_logits"], out["pred_boxes"], k, masks=out.get("pred_masks")
            )
            if "masks" in dec:  # D2H diet: top-100 strongest, bf16 (see bench.py)
                dec["masks"] = dec["masks"][:, :100].astype(jnp.bfloat16)
            return dec

        self._infer = infer
