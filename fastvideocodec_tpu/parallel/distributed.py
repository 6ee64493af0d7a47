"""Multi-host distribution (SURVEY.md §2.7 'Distributed communication
backend'): jax.distributed initialization plus a hybrid ICI/DCN mesh.

The reference has no distributed backend at all (no NCCL/MPI init; its only
cross-device traffic is 2-GPU .cuda(n) copies). The TPU-native design:
every host calls `initialize()` (env-driven under standard TPU pod
launchers), then builds one global mesh where the OUTER axis maps across
hosts/slices (DCN) and the inner axes ride ICI. Collectives are inserted
by XLA from the same `NamedSharding`s used single-host — nothing else in
the framework changes shape between 1 chip and a pod.

Axis convention (parallel/mesh.py): 'data' is the only axis that crosses
DCN (gradient psum once per step — DCN-tolerant); 'view' and 'frame' stay
intra-slice (per-step activation collectives need ICI bandwidth).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the jax.distributed runtime. With no arguments, defers to
    the environment (TPU pod metadata / JAX_COORDINATOR_ADDRESS etc.), the
    standard path under multi-host launchers. Safe to skip single-host."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(data: int | None = None, view: int = 1, frame: int = 1) -> Mesh:
    """A (data, view, frame) mesh over ALL processes' devices.

    `data` defaults to filling every remaining device; it is laid out
    host-major so that the data axis is the one crossing DCN: shards of
    ('view', 'frame') always land on devices of one host/slice (ICI), and
    the once-per-step gradient psum over 'data' is the only DCN collective.
    """
    devices = np.asarray(jax.devices())  # global, process-major order
    n = len(devices)
    inner = view * frame
    if n % inner:
        raise ValueError(f"{n} devices not divisible by view*frame={inner}")
    if data is None:
        data = n // inner
    if data * inner != n:
        raise ValueError(
            f"mesh {data}x{view}x{frame} != {n} global devices"
        )
    per_host = n // max(jax.process_count(), 1)
    if inner > per_host and jax.process_count() > 1:
        raise ValueError(
            f"view*frame={inner} exceeds {per_host} devices/host — the "
            "activation-collective axes must stay on ICI"
        )
    arr = devices.reshape(data, view, frame)
    return Mesh(arr, axis_names=("data", "view", "frame"))
