"""Multi-host (multi-process) scale-out tests.

- Unit coverage of the per-host batch slicing (BatchLoader process_shard).
- A real 2-process ``jax.distributed`` CPU cluster (4 virtual devices each,
  8-device global mesh) running one short fit_model epoch end to end —
  the TPU-native equivalent of the distributed layer SURVEY.md §5.8 scopes,
  which the reference does not have (fit.py:87-88 pins one GPU).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from conftest import make_synthetic_csdap
from floodplanet_code_tpu.data import BatchLoader

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestProcessShardLoader:
    def _dataset(self, synthetic_csdap_root):
        from floodplanet_code_tpu.data import build_dataset, generate_image_slice_object

        sl = generate_image_slice_object(64, stride=64)
        return build_dataset(
            "floodplanet",
            "train",
            sl,
            sensor="S1",
            eval_region="RegionB",
            root_dir=synthetic_csdap_root,
        )

    def test_shards_partition_each_global_batch(self, synthetic_csdap_root):
        ds = self._dataset(synthetic_csdap_root)
        full = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
        parts = [
            BatchLoader(ds, batch_size=4, shuffle=True, seed=3, process_shard=(i, 2))
            for i in range(2)
        ]
        for batch_full, batch_0, batch_1 in zip(
            iter(full), iter(parts[0]), iter(parts[1])
        ):
            glued = np.concatenate([batch_0["image"], batch_1["image"]])
            np.testing.assert_array_equal(glued, batch_full["image"])
            glued_valid = np.concatenate([batch_0["valid"], batch_1["valid"]])
            np.testing.assert_array_equal(glued_valid, batch_full["valid"])

    def test_equal_batch_counts_across_shards(self, synthetic_csdap_root):
        ds = self._dataset(synthetic_csdap_root)
        counts = [
            sum(1 for _ in BatchLoader(ds, batch_size=4, process_shard=(i, 2)))
            for i in range(2)
        ]
        assert counts[0] == counts[1] == sum(1 for _ in BatchLoader(ds, batch_size=4))

    def test_indivisible_batch_raises(self, synthetic_csdap_root):
        ds = self._dataset(synthetic_csdap_root)
        with pytest.raises(ValueError):
            BatchLoader(ds, batch_size=5, process_shard=(0, 2))


def _run_cluster(
    tmp_path,
    num_processes: int,
    devices_per_proc: int,
    extra_overrides: tuple = (),
):
    """Spawn a real jax.distributed CPU cluster and return (results, outs)."""
    data_root = str(tmp_path / "data")
    make_synthetic_csdap(data_root, sensors=("S1",), scene_hw=(96, 128))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    # One SHARED experiment dir: orbax checkpointing is a collective
    # over a shared filesystem (the real-pod layout).
    shared = tmp_path / "shared"
    exp_dir = str(shared / "exp")
    os.makedirs(shared, exist_ok=True)
    with open(shared / "dataset_dirs.json", "w") as handle:
        json.dump({"floodplanet": data_root + "/"}, handle)

    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO_ROOT
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO_ROOT, "tests", "_multihost_worker.py"),
                    str(pid),
                    str(num_processes),
                    str(port),
                    data_root + "/",
                    exp_dir,
                    str(devices_per_proc),
                    *extra_overrides,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-2000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return exp_dir, results, outs


def _assert_cluster_invariants(exp_dir, results, outs, num_processes):
    assert all(r["process_count"] == num_processes for r in results)
    assert all(r["index_exists"] for r in results)
    # Every process computed the same (replicated) best metric.
    for r in results[1:]:
        assert r["best_metric"] == pytest.approx(
            results[0]["best_metric"], rel=1e-5
        )
    # IDENTICAL per-epoch metrics on every host, computed locally by each
    # process (HOSTMETRIC lines, tpu.log_all_hosts) — not just the
    # coordinator's shared checkpoint index.
    host_metrics = []
    for out in outs:
        host_metrics.append(
            [l for l in out.splitlines() if l.startswith("HOSTMETRIC ")]
        )
    assert host_metrics[0], outs[0][-2000:]
    for metrics in host_metrics[1:]:
        assert metrics == host_metrics[0]
    # The multi-host fit routes through the hierarchical DCN x ICI mesh
    # (('pod', 'data'), parallel/mesh.make_hybrid_mesh).
    for out in outs:
        assert "[fit] mesh axes: {'pod': " + str(num_processes) in out, (
            out[-2000:]
        )
    # Checkpoint round-trip: the second fit resumed epoch 0's collective
    # checkpoint on every process and trained epoch 1.
    for out in outs:
        assert "[fit] resumed from" in out, out[-2000:]
    assert results[0].get("epochs_seen") and 1 in results[0]["epochs_seen"]
    # The device-resident data cache stayed on under multi-host (the
    # SPMD batch-builder path, data/device_cache.py).
    for out in outs:
        assert "[fit] device data cache" in out, out[-2000:]
    # Exactly one TensorBoard log dir: the coordinator's.
    assert os.path.isdir(os.path.join(exp_dir, "tensorboard_logs"))


@pytest.mark.slow
class TestMultiProcessCluster:
    def test_fit_across_two_processes(self, tmp_path):
        """2-process x 4-device jax.distributed CPU cluster: hybrid
        (pod=2, data=4) mesh, identical host metrics, resume, device
        cache, coordinator-only side effects."""
        exp_dir, results, outs = _run_cluster(tmp_path, 2, 4)
        _assert_cluster_invariants(exp_dir, results, outs, 2)

    def test_fit_across_four_processes_pod_sharded_cache(self, tmp_path):
        """4-process x 2-device cluster: the (pod=4, data=2) hybrid mesh
        exercises a DCN axis wider than the per-pod ICI axis, with the
        device cache FORCED pod-sharded (each process holds 1/4 of the
        scene stacks; batch assembly psums crops over 'pod')."""
        exp_dir, results, outs = _run_cluster(
            tmp_path, 4, 2, ("tpu.device_cache_shard=pod",)
        )
        _assert_cluster_invariants(exp_dir, results, outs, 4)
        for out in outs:
            assert "(pod-sharded)" in out, out[-2000:]