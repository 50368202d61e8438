"""Device mesh + sharding helpers.

The reference is single-GPU (fit.py:87-88, SURVEY.md §2.3); this module is
the TPU build's scale-out layer: a 1-D data-parallel mesh over all chips
(ICI), with batches sharded on the leading axis and model state replicated.
Under jit's SPMD partitioner that layout yields:
- gradient all-reduce (psum) over ICI automatically,
- global (cross-replica) BatchNorm statistics automatically — batch-axis
  reductions inside the model see the full global batch,
- exact metric aggregation — the confusion matrix is a full reduction.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_state(state, mesh: Mesh):
    """Place a pytree fully replicated on every device of the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)
