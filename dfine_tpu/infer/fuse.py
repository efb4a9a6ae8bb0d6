"""Deploy-time parameter fusion (the ``convert_to_deploy`` analog).

The reference rewrites modules at deploy: conv+BN -> fused conv
(hybrid_encoder.py:47-79) and RepVGG 3x3+1x1 -> one 3x3
(hybrid_encoder.py:106-156).  In flax/XLA the module graph must stay static,
so fusion is a PURE PARAM TRANSFORM: BN statistics are folded into the
preceding conv kernel and the BN is turned into the identity affine
(scale=1, bias=fused, mean=0, var=1-eps) — numerically identical outputs,
one fewer scale/shift in the graph (XLA folds the rest).

Inference-mode BN is already an affine op that XLA fuses into the conv's
epilogue, so this is mostly about checkpoint portability and matching the
reference's deploy capability, not a perf cliff.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def fuse_conv_bn(variables: Dict, eps: float = 1e-5) -> Dict:
    """Fold every (conv kernel, adjacent BN) pair.

    Layout assumption (all our conv blocks): params '<mod>/conv/kernel' or
    '<mod>/<name>/kernel' with sibling BN params '<mod>/bn|norm/{scale,bias}'
    and batch_stats '.../{mean,var}'."""
    params = traverse_util.flatten_dict(variables["params"], sep="/")
    stats = traverse_util.flatten_dict(variables.get("batch_stats", {}), sep="/")
    new_params = dict(params)
    new_stats = dict(stats)

    bn_names = ("bn", "norm", "bn1", "enc_bn")
    for key in list(params):
        if not key.endswith("/kernel"):
            continue
        mod = key.rsplit("/", 2)[0]  # strip '<conv>/kernel'
        conv_name = key.rsplit("/", 2)[1]
        # find a sibling BN
        for bn in bn_names:
            scale_k = f"{mod}/{bn}/scale"
            mean_k = f"{mod}/{bn}/mean"
            if scale_k in params and mean_k in stats:
                break
        else:
            continue
        if conv_name not in ("conv",):  # only conv->bn blocks
            continue
        gamma = np.asarray(params[scale_k])
        beta = np.asarray(params[f"{mod}/{bn}/bias"])
        mean = np.asarray(stats[mean_k])
        var = np.asarray(stats[f"{mod}/{bn}/var"])
        std = np.sqrt(var + eps)

        k = np.asarray(params[key])  # HWIO
        new_params[key] = (k * (gamma / std)[None, None, None, :]).astype(k.dtype)
        fused_bias = beta - gamma * mean / std
        # BN becomes identity affine carrying the fused bias
        new_params[scale_k] = np.ones_like(gamma)
        new_params[f"{mod}/{bn}/bias"] = fused_bias.astype(beta.dtype)
        new_stats[mean_k] = np.zeros_like(mean)
        new_stats[f"{mod}/{bn}/var"] = np.full_like(var, 1.0 - eps)

    return {
        "params": traverse_util.unflatten_dict(new_params, sep="/"),
        "batch_stats": traverse_util.unflatten_dict(new_stats, sep="/"),
    }


def fuse_repvgg_branch(variables: Dict) -> Dict:
    """Fold VGGBlock's 1x1 branch into the 3x3 branch (after fuse_conv_bn).

    conv2's fused 1x1 kernel is added into the center tap of conv1's 3x3
    kernel and the biases sum; conv2 is then zeroed so the block computes
    y = act(conv1'(x) + 0) — numerically identical, reference
    hybrid_encoder.py:117-156 capability."""
    params = traverse_util.flatten_dict(variables["params"], sep="/")
    new_params = dict(params)
    for key in list(params):
        if not key.endswith("conv1/conv/kernel"):
            continue
        base = key[: -len("conv1/conv/kernel")]
        k1 = f"{base}conv1/conv/kernel"
        k2 = f"{base}conv2/conv/kernel"
        if k2 not in params:
            continue
        b1 = f"{base}conv1/norm/bias"
        b2 = f"{base}conv2/norm/bias"
        if b1 not in params or b2 not in params:
            continue
        k3 = np.asarray(params[k1]).copy()  # [3,3,I,O]
        k1x1 = np.asarray(params[k2])  # [1,1,I,O]
        # only the RepVGG pattern (3x3 + 1x1, same I/O); CSPLayer also names
        # its (1x1, 1x1) convs conv1/conv2 — those must not be touched
        if k3.shape[:2] != (3, 3) or k1x1.shape[:2] != (1, 1) or k3.shape[2:] != k1x1.shape[2:]:
            continue
        k3[1, 1] += k1x1[0, 0]
        new_params[k1] = k3
        new_params[b1] = np.asarray(params[b1]) + np.asarray(params[b2])
        new_params[k2] = np.zeros_like(k1x1)
        new_params[b2] = np.zeros_like(params[b2])
    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(new_params, sep="/")
    return out


def convert_to_deploy(variables: Dict) -> Dict:
    """Full deploy conversion (reference dfine.py:43-48 deploy())."""
    fused = fuse_conv_bn(variables)
    return fuse_repvgg_branch(fused)
