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


def make_mesh_2d(
    dp: int,
    sp: int,
    axis_names: tuple = ("data", "space"),
) -> Mesh:
    """2-D mesh: data parallelism x spatial partitioning.

    Spatial partitioning shards the tile *height* axis across chips — the
    scale-out path for tiles too large for one chip's HBM (the
    long-context/SP analog, SURVEY.md §5.7). Under jit's SPMD partitioner
    the convolution halo exchanges ride ICI automatically; no manual
    collectives.
    """
    devices = jax.devices()
    if dp * sp > len(devices):
        raise ValueError(
            f"mesh {dp}x{sp} needs {dp * sp} devices, have {len(devices)}"
        )
    grid = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def batch_shardings_for(mesh: Mesh) -> dict:
    """Per-key shardings for a training batch on a 1-D or 2-D mesh.

    On a ('data', 'space') mesh, images/targets shard (batch, height);
    per-sample leaves ('valid', 'mean', 'std') shard batch only.
    """
    data_axis = mesh.axis_names[0]
    if len(mesh.axis_names) > 1:
        space_axis = mesh.axis_names[1]
        image_spec = P(data_axis, space_axis)
    else:
        image_spec = P(data_axis)
    return {
        "image": NamedSharding(mesh, image_spec),
        "target": NamedSharding(mesh, image_spec),
        "dem": NamedSharding(mesh, image_spec),
        "slope": NamedSharding(mesh, image_spec),
        "preflood": NamedSharding(mesh, image_spec),
        "pre_post_difference": NamedSharding(mesh, image_spec),
        "hand": NamedSharding(mesh, image_spec),
        "mean": NamedSharding(mesh, P(data_axis)),
        "std": NamedSharding(mesh, P(data_axis)),
        "valid": NamedSharding(mesh, P(data_axis)),
    }


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_state(state, mesh: Mesh):
    """Place a pytree fully replicated on every device of the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(state, sharding)
