"""Multi-host (multi-process) scale-out over DCN.

The reference is strictly single-process/single-GPU (fit.py:87-88); this is
the TPU-native equivalent SURVEY.md §5.8 scopes: ``jax.distributed``
initialization, per-host data sharding, and coordinator-only side effects
(checkpoints, TensorBoard, prints).

Design:
- Every process runs the SAME jit-compiled SPMD program over the GLOBAL
  device mesh (``jax.devices()`` spans all hosts after initialization);
  XLA routes gradient/BN/metric reductions over ICI within a slice and DCN
  across hosts automatically.
- Each host loads only its slice of every global batch
  (``BatchLoader(process_shard=...)``) — the loader partitions the *same*
  globally-seeded epoch order on every host, so batch counts and example
  placement agree without any coordination traffic.
- Host-local numpy slices become global jax.Arrays with
  ``jax.make_array_from_process_local_data`` (see data.loader.device_prefetch).
- Only process 0 writes checkpoints/TB/logs; replicated metrics are
  readable on every host.

CI coverage: tests/test_multihost.py spins up a real 2-process
``jax.distributed`` CPU cluster (4 virtual devices each) and checks loss
parity against the single-process run.
"""

from __future__ import annotations

import os

import jax


def _distributed_client_active() -> bool:
    """True when jax.distributed.initialize() has already run.

    Deliberately avoids jax.process_count(): that call initializes the XLA
    backend as a side effect, after which jax.distributed.initialize()
    permanently raises RuntimeError — the exact failure this module must
    not trigger before fit_model's cluster join.
    """
    try:
        from jax._src.distributed import global_state

        return global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift fallback
        return jax.process_count() > 1


def initialize_from_env_or_config(cfg=None) -> bool:
    """Initialize jax.distributed when multi-host settings are present.

    Sources, in precedence order:
    - cfg ``tpu.multihost`` block: {coordinator_address, num_processes,
      process_id} (all three required);
    - standard cluster env (TPU pod metadata, ``JAX_COORDINATOR_ADDRESS`` /
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``), for which
      ``jax.distributed.initialize()`` auto-detects.

    Returns True if an initialization was performed. Safe to call when
    single-process (returns False, no-op).

    Must run before any backend-initializing JAX call (jax.devices(),
    jax.process_count(), any computation): jax.distributed.initialize()
    raises RuntimeError once the XLA backend exists. The
    already-initialized check below therefore inspects the distributed
    client directly instead of calling jax.process_count().
    """
    if _distributed_client_active():
        return False  # already initialized (e.g. by the launcher)
    block = None
    if cfg is not None:
        block = cfg.select("tpu.multihost")
    if block:
        coord = block.get("coordinator_address")
        nproc = block.get("num_processes")
        pid = block.get("process_id")
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
            return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process allowed to write checkpoints/TB/logs."""
    return jax.process_index() == 0


def process_shard() -> tuple[int, int] | None:
    """(process_id, process_count) for BatchLoader, or None single-process."""
    n = jax.process_count()
    if n <= 1:
        return None
    return (jax.process_index(), n)


def sync(name: str = "sync") -> None:
    """Barrier across all processes (no-op single-process).

    Called at every epoch end so fast workers do not run ahead of (or exit
    before) the coordinator's checkpoint write — an unsynchronized exit
    trips jax.distributed's shutdown barrier.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def local_batch_size(global_batch_size: int) -> int:
    """Per-host slice of the global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n
