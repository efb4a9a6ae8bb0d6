"""Data parallelism over a TPU device mesh — the DDP replacement.

The reference scales with torchrun + DDP + NCCL all-reduce hooks
(src/d_fine/dist_utils.py:12-43, src/dl/train.py:161-169).  The TPU-native
design is single-controller SPMD: one 1-axis ``jax.sharding.Mesh`` over ICI,
the train step wrapped in ``shard_map`` with ``axis_name='dp'`` so gradients,
BN statistics (SyncBN, reference train.py:159-160) and loss normalizers
(reference dfine_criterion.py:440-453) ride ``psum``/``pmean`` collectives
that XLA schedules on the interconnect.  There is no process group, no
rendezvous, no rank logic: replicated state + sharded batch in, replicated
state + scalar metrics out.

D-FINE is a <=62M-param vision model, so pure DP is the right parallelism
(SURVEY.md 2c); the mesh helper still accepts extra axes for future
tensor-parallel experiments.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def unreplicate(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Shard leading (batch) dim of every leaf across the mesh axis."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def make_dp_train_step(step_fn, mesh: Mesh, axis: str = "dp"):
    """Wrap a per-shard step (built with axis_name=axis) in shard_map + jit.

    step_fn: (state, batch, rng) -> (state, metrics) where state is
    replicated, batch is batch-sharded, rng is per-replica (folded in).
    """
    from jax.experimental.shard_map import shard_map

    def wrapped(state, batch, rng):
        def body(state, batch, rng):
            r = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            new_state, metrics = step_fn(state, batch, r)
            return new_state, metrics

        sharded = shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return sharded(state, batch, rng)

    return jax.jit(wrapped, donate_argnums=(0,))


def gather_predictions(preds: Sequence[Dict[str, np.ndarray]]) -> list:
    """Host-side gather of eval predictions.

    Under single-controller JAX the fully-addressable eval outputs already
    live on the host; the reference's ``all_gather_object`` ship-to-rank-0
    (dist_utils.py:121-187) reduces to a list concat.  Multi-host pods would
    use ``jax.experimental.multihost_utils.process_allgather`` here.
    """
    out = []
    for p in preds:
        out.extend(p if isinstance(p, list) else [p])
    return out
