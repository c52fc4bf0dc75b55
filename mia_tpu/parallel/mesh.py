"""Device-mesh utilities for data-parallel scaling over ICI.

The reference is strictly single-GPU (SURVEY.md §2.8: no torch.distributed
anywhere); the TPU-native scaling story is a 1-D ``("data",)`` mesh — params
replicated, batch and AL pool sharded — with XLA inserting the gradient
all-reduce over ICI. The helpers here build the mesh and the two shardings
every jitted program in the framework uses.

A second ``model`` axis is accepted for forward-compatibility (the SAM ViT
path can shard attention heads), giving TP×DP meshes on larger slices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    ``shape`` defaults to all devices along the first axis and 1 elsewhere.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in a pytree with its leading dim sharded over ``axis``."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(x, multiple: int, axis: int = 0, fill=0):
    """Pad ``axis`` up to a multiple (so a batch divides over the mesh).

    Returns ``(padded, valid_mask)`` — mask is 1 for real rows. Fixed-shape
    padding keeps jit caches warm as the AL labeled set grows (SURVEY §7).
    """
    import jax.numpy as jnp

    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    mask = jnp.arange(target) < n
    if target == n:
        return x, mask
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target - n)
    return jnp.pad(x, pad_widths, constant_values=fill), mask
