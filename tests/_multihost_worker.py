"""Subprocess worker for the 2-process jax.distributed CPU test.

Invoked by tests/test_multihost.py:

    python _multihost_worker.py <process_id> <num_processes> <port> \
        <data_root> <exp_dir>

Each process gets 4 virtual CPU devices; the global mesh spans 8. Runs one
short fit_model epoch over the synthetic dataset and prints a JSON result
line for the parent to compare across processes.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    data_root = sys.argv[4]
    exp_dir = sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes, jax.devices()

    # exp_dir is SHARED across processes (orbax checkpointing is a
    # collective over a shared directory). The parent pre-writes
    # dataset_dirs.json next to it.
    os.chdir(os.path.dirname(exp_dir))
    if not os.path.exists("dataset_dirs.json"):
        with open("dataset_dirs.json", "w") as handle:
            json.dump({"floodplanet": data_root}, handle)

    from floodplanet_code_tpu.config import compose
    from floodplanet_code_tpu.train.fit import fit_model

    cfg = compose(
        overrides=[
            "dataset.sensor=S1",
            "eval_region=RegionB",
            "n_epochs=1",
            "crop_height=64",
            "crop_width=64",
            "crop_stride=64",
            "batch_size=8",
            "n_workers=2",
            "limit_train_batches=3",
            "limit_val_batches=2",
            "transforms.rotate.active=false",
        ]
    )
    best = fit_model(cfg, overwrite_exp_dir=exp_dir)

    index_path = os.path.join(exp_dir, "checkpoints", "index.json")
    result = {
        "process_id": process_id,
        "process_count": jax.process_count(),
        "best_checkpoint": best,
        "index_exists": os.path.exists(index_path),
    }
    if os.path.exists(index_path):
        with open(index_path) as handle:
            result["best_metric"] = max(
                (e["metric"] for e in json.load(handle)["entries"]), default=None
            )
    print("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
