"""Pod-scale multichip correctness: the dryrun's sharded-vs-single-device
loss-parity check at 8, 16, and 32 virtual CPU devices.

The TPU-native equivalent of SURVEY.md §2.3's data-parallel mandate at pod
scale: `__graft_entry__.dryrun_multichip` runs TWO full train steps (fwd,
CE, bwd, adam, EMA, BN stats) of the production flat-state GSPMD program
on an n-device (pod, data, space) mesh AND on a single device with the
identical global batch, asserting the per-step losses agree — SPMD
partitioning must not change the math. Each count needs its own
interpreter because --xla_force_host_platform_device_count is fixed at
backend init, hence the subprocess harness.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [8, 16, 32])
def test_dryrun_loss_parity_at_scale(n_devices):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g\n"
            f"g.dryrun_multichip({n_devices})\n",
        ],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip({n_devices}) failed:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"
    )
    ok_lines = [
        l for l in proc.stdout.splitlines()
        if l.startswith(f"dryrun_multichip({n_devices}): ok")
    ]
    assert ok_lines, f"no ok line in:\n{proc.stdout[-2000:]}"
    # The parity assertion lives inside the dryrun; the print carries it.
    assert "single-device loss parity" in ok_lines[-1]
    expected_mesh = {
        8: "{'pod': 2, 'data': 2, 'space': 2}",
        16: "{'pod': 2, 'data': 4, 'space': 2}",
        32: "{'pod': 2, 'data': 8, 'space': 2}",
    }[n_devices]
    assert expected_mesh in ok_lines[-1], ok_lines[-1]
