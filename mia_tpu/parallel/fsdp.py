"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD shardings.

No wrapper classes and no manual collectives: each parameter (and its
optimizer-state mirrors) gets a ``NamedSharding`` that splits its largest
divisible axis over the mesh's ``data`` axis; the train step is jitted with
those shardings on the state and XLA inserts the all-gathers on use and the
reduce-scatter on the gradients. Small leaves (below ``min_size`` elements)
stay replicated — gathering them costs more latency than their memory is
worth.

The reference has no distributed story at all (SURVEY §2.8); this is the
memory-scaling path for models whose replicated optimizer state would not
fit one chip (SAM ViT-B adam: ~1.1 GB replicated vs ~140 MB/chip on an
8-way mesh).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(x, n: int, axis: str, min_size: int) -> P:
    """PartitionSpec sharding the largest ``n``-divisible axis of ``x``."""
    if x.ndim == 0 or x.size < min_size:
        return P()
    for i in sorted(range(x.ndim), key=lambda i: -x.shape[i]):
        if x.shape[i] % n == 0 and x.shape[i] >= n:
            spec = [None] * x.ndim
            spec[i] = axis
            return P(*spec)
    return P()


def fsdp_param_specs(params, mesh: Mesh, axis: str = "data",
                     min_size: int = 2 ** 14):
    n = mesh.shape[axis]
    return jax.tree.map(lambda x: fsdp_spec(x, n, axis, min_size), params)


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data",
                   min_size: int = 2 ** 14):
    """NamedSharding pytree for any state pytree (params, opt state, EMA…).

    Optimizer-state leaves that mirror a parameter's shape shard the same
    way automatically because the spec is a pure function of the leaf
    shape; scalar leaves (counts, schedules) replicate.
    """
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec(x, n, axis, min_size)), tree
    )


def shard_state_fsdp(state, mesh: Mesh, axis: str = "data",
                     min_size: int = 2 ** 14):
    """device_put a TrainState (or any pytree) with FSDP shardings."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        state,
        fsdp_shardings(state, mesh, axis, min_size),
    )
