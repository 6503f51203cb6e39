"""Device mesh + sharding helpers (GSPMD over ICI).

The reference is strictly single-device (reference: conf.py:3, SURVEY.md
§2.7).  The TPU-native equivalent of its training loop is SPMD batch data
parallelism over a 1-D ``Mesh(('data',))``: parameters and optimizer state
replicated, batches sharded on the leading axis, gradients reduced by the
XLA-inserted ``all-reduce`` over ICI — no hand-written collectives at this
model scale (SURVEY.md §5 "distributed communication backend").

These helpers are backend-agnostic: they work identically on a real TPU pod
slice and on a CPU host with ``--xla_force_host_platform_device_count=N``
(the standard JAX substitute for a fake distributed backend, used by the
test suite and the driver's multi-chip dry run).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Sequence[jax.Device] | None = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a host batch (pytree of numpy arrays) sharded over the
    mesh's data axis.  This is the host->device boundary; with a bounded
    prefetch loader ahead of it the transfer overlaps the previous step."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
