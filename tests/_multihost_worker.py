"""Subprocess worker for the multi-process jax.distributed CPU tests.

Invoked by tests/test_multihost.py:

    python _multihost_worker.py <process_id> <num_processes> <port> \
        <data_root> <exp_dir> [devices_per_proc=4] [extra_override ...]

Each process gets ``devices_per_proc`` virtual CPU devices; the global
mesh spans num_processes x devices_per_proc. Runs one short fit_model
epoch over the synthetic dataset and prints a JSON result line for the
parent to compare across processes.
"""

import json
import os
import sys

_DEVICES_PER_PROC = int(sys.argv[6]) if len(sys.argv) > 6 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_DEVICES_PER_PROC}"
).strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    data_root = sys.argv[4]
    exp_dir = sys.argv[5]
    extra_overrides = list(sys.argv[7:])

    import jax

    jax.config.update("jax_platforms", "cpu")

    # exp_dir is SHARED across processes (orbax checkpointing is a
    # collective over a shared directory). The parent pre-writes
    # dataset_dirs.json next to it.
    os.chdir(os.path.dirname(exp_dir))
    if not os.path.exists("dataset_dirs.json"):
        with open("dataset_dirs.json", "w") as handle:
            json.dump({"floodplanet": data_root}, handle)

    from floodplanet_code_tpu.config import compose
    from floodplanet_code_tpu.train.fit import fit_model

    def make_cfg(n_epochs):
        cfg = compose(
            overrides=[
                "dataset.sensor=S1",
                "eval_region=RegionB",
                f"n_epochs={n_epochs}",
                "crop_height=64",
                "crop_width=64",
                "crop_stride=64",
                "batch_size=8",
                "n_workers=2",
                "limit_train_batches=3",
                "limit_val_batches=2",
                "transforms.rotate.active=false",
                "tpu.log_all_hosts=true",
                *extra_overrides,
            ]
        )
        # Cluster join happens INSIDE fit_model via the tpu.multihost
        # config block (parallel/multihost.initialize_from_env_or_config)
        # — regression coverage for the init-before-backend ordering bug.
        cfg.tpu["multihost"] = {
            "coordinator_address": f"localhost:{port}",
            "num_processes": num_processes,
            "process_id": process_id,
        }
        return cfg

    best = fit_model(make_cfg(1), overwrite_exp_dir=exp_dir)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == _DEVICES_PER_PROC * num_processes, (
        jax.devices()
    )

    # Checkpoint round-trip under the 2-process cluster: the second fit
    # must restore epoch 0's collective checkpoint on EVERY process and
    # continue from epoch 1.
    best2 = fit_model(make_cfg(2), overwrite_exp_dir=exp_dir)

    index_path = os.path.join(exp_dir, "checkpoints", "index.json")
    result = {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "best_checkpoint": best,
        "best_checkpoint_resumed": best2,
        "index_exists": os.path.exists(index_path),
    }
    if os.path.exists(index_path):
        with open(index_path) as handle:
            entries = json.load(handle)["entries"]
            result["best_metric"] = max(
                (e["metric"] for e in entries), default=None
            )
            result["epochs_seen"] = sorted({e["epoch"] for e in entries})
            # Full (epoch, metric) trajectory: the parent asserts it is
            # IDENTICAL across processes (replicated eval state).
            result["metric_by_epoch"] = sorted(
                (e["epoch"], e["metric"]) for e in entries
            )
    print("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
