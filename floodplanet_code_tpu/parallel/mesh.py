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


def make_hybrid_mesh(
    n_pods: int,
    dp_per_pod: int,
    axis_names: tuple = ("pod", "data"),
) -> Mesh:
    """Hierarchical mesh: slow 'pod' axis (DCN, across hosts/slices) x fast
    'data' axis (ICI, within a slice).

    The batch shards jointly over both axes (P(('pod','data'))); giving the
    partitioner the topology as two named axes lets it schedule the
    gradient all-reduce hierarchically — reduce-scatter/all-gather over ICI
    within each pod, one small cross-pod exchange over DCN — instead of
    treating all devices as one flat ring. On real multi-host TPU the
    device grid comes from mesh_utils.create_hybrid_device_mesh (which
    orders devices so the fast axis is ICI-contiguous); elsewhere (CPU
    tests, single host) a plain reshape of jax.devices() is the same thing.
    """
    n = n_pods * dp_per_pod
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(
            f"hybrid mesh {n_pods}x{dp_per_pod} needs {n} devices, "
            f"have {len(devices)}"
        )
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        try:
            grid = mesh_utils.create_hybrid_device_mesh(
                (1, dp_per_pod), (n_pods, 1), devices=devices[:n]
            )
        except ValueError:
            # Devices without slice topology (CPU multi-process clusters):
            # group by process instead — jax.devices() is process-ordered,
            # so a plain reshape puts each process's (ICI-local) devices
            # together on the fast axis. Callers that want the slice-level
            # hierarchy should size n_pods with detect_n_pods(), which
            # makes the granule count match on sliced TPU topologies.
            print(
                f"[mesh] no slice topology for {n_pods}x{dp_per_pod} "
                "hybrid mesh; grouping the pod axis by process"
            )
            grid = np.array(devices[:n]).reshape(n_pods, dp_per_pod)
    else:
        grid = np.array(devices[:n]).reshape(n_pods, dp_per_pod)
    return Mesh(grid, axis_names)


def detect_n_pods(devices=None) -> int:
    """Number of DCN granules: distinct TPU slices when the runtime exposes
    them (multi-slice pods have several hosts per slice — the slice, not
    the host, is the ICI island), else the process count."""
    devices = list(jax.devices() if devices is None else devices)
    slices = {getattr(d, "slice_index", None) for d in devices}
    if None not in slices and len(slices) > 1:
        return len(slices)
    return jax.process_count()


def batch_axes(mesh: Mesh) -> tuple:
    """Every mesh axis the batch dimension shards over (all but 'space')."""
    return tuple(a for a in mesh.axis_names if a != "space")


def n_batch_shards(mesh: Mesh) -> int:
    """Number of ways the global batch is split (product of batch axes)."""
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape[a]
    return n


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the batch axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def batch_shardings_for(mesh: Mesh) -> dict:
    """Per-key shardings for a training batch.

    The batch dimension shards jointly over every non-'space' axis — one
    'data' axis, or ('pod', 'data') on a hierarchical DCN x ICI mesh. On a
    mesh with a 'space' axis, images/targets additionally shard their
    height; per-sample leaves ('valid', 'mean', 'std') shard batch only.
    """
    data_axis = batch_axes(mesh)
    if "space" in mesh.axis_names:
        image_spec = P(data_axis, "space")
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
