"""Checkpointing: orbax for native state, torch-.pth import for parity.

Improves on the reference, which stores bare EMA weights only with no
optimizer/scheduler resume (reference train.py:458-479, SURVEY 5): here
``last``/``best`` checkpoints carry the FULL TrainState (params, batch
stats, optimizer state, EMA, step) so training resumes exactly.

``load_torch_checkpoint`` imports the reference's .pth weights (numpy-level
key remap of reference src/d_fine/utils.py:92-181) so COCO-pretrained
starting points transfer; it is gated on torch being importable.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    """Orbax checkpointer that is safe under rank-0-only calling.

    Plain ``PyTreeCheckpointer().save`` opens with a GLOBAL
    ``sync_global_processes`` barrier; the trainer saves on rank 0 only
    (reference train.py:419-456 semantics), so under ``jax.distributed`` the
    other ranks never enter the barrier and rank 0 crashes with
    "sync_global_devices name mismatch ('Checkpointer:save_start')" — found
    by tests/test_multihost_trainer.py (r5).  Scoping the barrier to the
    calling process alone (active_processes={pid}) makes save/restore
    process-local: the state passed in is host-replicated numpy, so no
    cross-process coordination is actually needed.
    """
    import orbax.checkpoint as ocp

    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    pid = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=pid, active_processes={pid},
            barrier_sync_key_prefix=f"solo{pid}",
        ),
    )


def save_state(path: Path, state: Any) -> None:
    path = Path(path).absolute()
    _checkpointer().save(path, jax.tree.map(np.asarray, state), force=True)


def restore_state(path: Path, template: Any) -> Any:
    return _checkpointer().restore(Path(path).absolute(), item=template)


def save_params_npz(path: Path, variables: Dict) -> None:
    """Weights-only artifact for serving (flat npz, portable)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: Path) -> Dict:
    from flax import traverse_util

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")


# --------------------------------------------------------- torch importer --


def _torch_state_dict(path: Path, allow_pickle: bool = False) -> Dict[str, np.ndarray]:
    """Read a .pth/.pt state dict.  weights_only=True by default — matching
    the reference (d_fine/utils.py:161) — so third-party checkpoint files
    cannot execute arbitrary pickle code; pass allow_pickle=True only for
    trusted local files that need full deserialization."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=not allow_pickle)
    if isinstance(obj, dict):
        for key in ("ema", "model", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "module" in obj:
        obj = obj["module"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in obj.items()}


# COCO class index -> Objects365 class index (dataset metadata; the head-row
# correspondence table the reference uses to transfer Obj365-pretrained class
# heads onto COCO-indexed heads and back, reference d_fine/utils.py:8-90)
OBJ365_IDS = [
    0, 46, 5, 58, 114, 55, 116, 65, 21, 40, 176, 127, 249, 24, 56, 139, 92,
    78, 99, 96, 144, 295, 178, 180, 38, 39, 13, 43, 120, 219, 148, 173, 165,
    154, 137, 113, 145, 146, 204, 8, 35, 10, 88, 84, 93, 26, 112, 82, 265,
    104, 141, 152, 234, 143, 150, 97, 2, 50, 25, 75, 98, 153, 37, 73, 115,
    132, 106, 61, 163, 134, 277, 81, 133, 18, 94, 30, 169, 70, 328, 226,
]


def map_class_rows(cur: np.ndarray, pretrain: np.ndarray) -> np.ndarray:
    """Remap class-head rows between COCO and Objects365 indexing
    (reference d_fine/utils.py:92-107)."""
    if pretrain.shape == cur.shape:
        return pretrain
    out = cur.copy()
    if pretrain.shape[0] > cur.shape[0]:  # obj365 -> coco
        for coco_id, obj_id in enumerate(OBJ365_IDS):
            if coco_id < cur.shape[0]:
                out[coco_id] = pretrain[obj_id + 1]
    else:  # coco -> obj365
        for coco_id, obj_id in enumerate(OBJ365_IDS):
            if coco_id < pretrain.shape[0]:
                out[obj_id + 1] = pretrain[coco_id]
    return out


def adjust_head_parameters(sd: Dict[str, np.ndarray], current: Dict[str, np.ndarray]) -> Dict:
    """Cross-dataset class-head adaptation (reference d_fine/utils.py:110-138):
    score-head weights/biases are row-remapped via the COCO<->Obj365 table
    (unmapped rows keep the current model's init values); a size-mismatched
    denoising embedding is dropped.

    current: torch-style key -> current model tensor in TORCH layout.
    """
    sd = dict(sd)
    key = "decoder.denoising_class_embed.weight"
    if key in sd and key in current and tuple(sd[key].shape) != tuple(current[key].shape):
        del sd[key]
    head_names = ["decoder.enc_score_head.weight", "decoder.enc_score_head.bias"]
    for i in range(8):
        head_names += [f"decoder.dec_score_head.{i}.weight",
                       f"decoder.dec_score_head.{i}.bias"]
    for name in head_names:
        if name in sd and name in current:
            sd[name] = map_class_rows(np.asarray(current[name]), np.asarray(sd[name]))
    return sd


# non-parameter buffers the JAX model materializes as compile-time constants
_SKIP_SUFFIXES = (
    "num_batches_tracked", "anchors", "valid_mask", "num_points_scale",
    "project",  # Integral projection = weighting_function constant
)
_SKIP_EXACT = {
    "decoder.up", "decoder.reg_scale", "decoder.decoder.up", "decoder.decoder.reg_scale",
}

# module-path rewrites: (transformed torch path fragment) -> (our flax path)
_REWRITES = [
    (re.compile(r"decoder\.decoder\.layers_(\d+)"), r"decoder.decoder_layers_\1"),
    (re.compile(r"decoder\.decoder\.lqe_layers_(\d+)"), r"decoder.lqe_layers_\1"),
    (re.compile(r"decoder\.decoder\.pre_bbox_head\."), "decoder.pre_bbox_head."),
    (re.compile(r"(encoder\.encoder_\d+)\.layers_(\d+)"), r"\1_layers_\2"),
    (re.compile(r"enc_output\.proj"), "enc_output_proj"),
    (re.compile(r"enc_output\.norm"), "enc_output_norm"),
    (re.compile(r"\.cv2_0\."), ".cv2_csp."),
    (re.compile(r"\.cv2_1\."), ".cv2_conv."),
    (re.compile(r"\.cv3_0\."), ".cv3_csp."),
    (re.compile(r"\.cv3_1\."), ".cv3_conv."),
    (re.compile(r"downsample_convs_(\d+)_0\."), r"downsample_convs_\1."),
    (re.compile(r"input_proj_(\d+)_0\."), r"input_proj_\1.conv."),
    (re.compile(r"input_proj_(\d+)_1\."), r"input_proj_\1.norm."),
    (re.compile(r"pixel_decoder\.lateral_(\d+)"), r"pixel_decoder.lateral_\1"),
]


def torch_key_to_flax(key: str, shape) -> Optional[Tuple[str, Optional[str]]]:
    """Translate a reference state_dict key to (our flat key, transform).

    transform: None | 'conv' (OIHW->HWIO) | 'linear' (transpose 2D).
    Returns None for buffers we re-derive at trace time."""
    if any(key.endswith(s) for s in _SKIP_SUFFIXES) or key in _SKIP_EXACT:
        return None
    k = re.sub(r"\.(\d+)", r"_\1", key)  # torch list index -> flax name suffix
    for pat, rep in _REWRITES:
        k = pat.sub(rep, k)

    if k.endswith(".running_mean"):
        return "batch_stats/" + k[: -len(".running_mean")].replace(".", "/") + "/mean", None
    if k.endswith(".running_var"):
        return "batch_stats/" + k[: -len(".running_var")].replace(".", "/") + "/var", None
    if k.endswith(".in_proj_weight"):
        return "params/" + k[: -len(".in_proj_weight")].replace(".", "/") + "/in_proj/kernel", "linear"
    if k.endswith(".in_proj_bias"):
        return "params/" + k[: -len(".in_proj_bias")].replace(".", "/") + "/in_proj/bias", None
    if k.endswith("denoising_class_embed.weight"):
        return "params/" + k[: -len(".weight")].replace(".", "/") + "/embedding", None
    if k.endswith(".weight"):
        stem = "params/" + k[: -len(".weight")].replace(".", "/")
        if len(shape) == 1:
            return stem + "/scale", None  # BN / LayerNorm weight
        if len(shape) == 4:
            return stem + "/kernel", "conv"
        return stem + "/kernel", "linear"
    return "params/" + k.replace(".", "/"), None


def load_torch_checkpoint(
    path_or_sd,
    variables_template: Dict,
    num_classes: Optional[int] = None,
    verbose: bool = True,
    strict: bool = False,
) -> Dict:
    """Import a reference .pth (or an in-memory state dict) into our
    variables pytree.  Mirrors the reference's shape-filtered partial load
    with missed/unmatched reporting (reference d_fine/utils.py:156-181):
    keys that translate and shape-match load; the rest keep init values."""
    from flax import traverse_util

    sd = (
        _torch_state_dict(Path(path_or_sd))
        if isinstance(path_or_sd, (str, Path))
        else {k: np.asarray(v) for k, v in path_or_sd.items()}
    )
    flat = traverse_util.flatten_dict(variables_template, sep="/")

    # cross-dataset class-head adaptation: expose our current head tensors in
    # torch layout so row remapping matches the reference exactly
    head_keys = ["decoder.enc_score_head.weight", "decoder.enc_score_head.bias",
                 "decoder.denoising_class_embed.weight"]
    head_keys += [f"decoder.dec_score_head.{i}.{leaf}" for i in range(8)
                  for leaf in ("weight", "bias")]
    current_heads = {}
    for tk in head_keys:
        if tk not in sd:
            continue
        trans = torch_key_to_flax(tk, sd[tk].shape)
        if trans is None or trans[0] not in flat:
            continue
        ours, tf = trans
        v = np.asarray(flat[ours])
        current_heads[tk] = v.T if tf == "linear" else v
    sd = adjust_head_parameters(sd, current_heads)

    out = dict(flat)
    missed, shape_missed = [], []
    n_loaded = 0
    for tk, tv in sd.items():
        tv = np.asarray(tv)
        trans = torch_key_to_flax(tk, tv.shape)
        if trans is None:
            continue
        ours, tf = trans
        if ours not in flat:
            missed.append((tk, ours))
            continue
        v = tv
        if tf == "conv":
            v = tv.transpose(2, 3, 1, 0)
        elif tf == "linear":
            v = tv.T
        target = np.asarray(flat[ours])
        if v.shape != target.shape:
            shape_missed.append((tk, v.shape, target.shape))
            continue
        out[ours] = v.astype(target.dtype)
        n_loaded += 1
    if verbose:
        print(
            f"torch import: loaded {n_loaded}/{len(sd)} tensors; "
            f"{len(missed)} unmatched keys, {len(shape_missed)} shape mismatches"
        )
        for tk, ours in missed[:10]:
            print(f"  unmatched: {tk} -> {ours}")
        for tk, s1, s2 in shape_missed[:10]:
            print(f"  shape: {tk} {s1} vs {s2}")
    if strict and (missed or shape_missed):
        raise ValueError(f"strict import failed: {len(missed)} unmatched, "
                         f"{len(shape_missed)} shape mismatches")
    return traverse_util.unflatten_dict(out, sep="/")
