"""Device mesh + sharding rules (SURVEY.md §2.7).

The reference's parallelism inventory maps onto a 2-3 axis mesh:
- 'data'  : GOP/batch replicas (DataParallel equivalent)
- 'view'  : MCVC camera views (views fold into batch; cross-view attention
            becomes an all-gather over ICI)
- 'frame' : LSVC tree-layer frames (the temporal/'sequence' axis)

Everything is standard jax.sharding — XLA inserts the collectives. Model
params are replicated (they are small, tens of MB); activations shard on
batch-like axes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1, view: int = 1, frame: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * view * frame
    if n > len(devices):
        raise ValueError(f"mesh {data}x{view}x{frame} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, view, frame)
    return Mesh(arr, axis_names=("data", "view", "frame"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_gop(mesh: Mesh, gop, axis: str = "data"):
    """Shard a [T, B, H, W, C] GOP batch over a mesh axis on B."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.device_put(gop, sharding)


def shard_views(mesh: Mesh, gop):
    """Shard an MCVC [T, B*V, H, W, C] GOP over ('data','view') on axis 1."""
    sharding = NamedSharding(mesh, P(None, ("data", "view")))
    return jax.device_put(gop, sharding)


def gop_sharding(mesh: Mesh, batch_axes=("data",)):
    return NamedSharding(mesh, P(None, batch_axes))
