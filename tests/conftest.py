"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

The reference has no test suite at all (SURVEY.md §4); this suite is the
TPU build's own. Multi-chip sharding tests run on the XLA host platform with
8 virtual devices — the "fake backend" pattern from SURVEY.md §4.
"""

import os
import sys
import zlib

# Force CPU: the session env points JAX at real TPU hardware via a tunnel
# whose sitecustomize pins jax_platforms at interpreter start — env vars
# alone are ineffective, so override the live jax config before the backend
# initializes. Tests must run on the 8-device virtual host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    f"tests require the 8-device virtual CPU platform, got {jax.devices()}"
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    # `-m smoke` is the sub-minute inner-loop tier: slow-marked tests never
    # belong, even where a module-level smoke mark unions with a slow mark
    # on one test in the file (e.g. test_tiff's 4.4 GB BigTIFF case).
    if config.getoption("-m") == "smoke":
        deselected = [i for i in items if "slow" in i.keywords]
        if deselected:
            items[:] = [i for i in items if "slow" not in i.keywords]
            config.hook.pytest_deselected(items=deselected)


@pytest.fixture()
def rng(request):
    # Per-test deterministic Generator. The seed derives from the test's
    # nodeid, so the stream each test draws is a pure function of the test
    # itself — independent of which tests ran before it and of collection
    # order. (A session-scoped shared Generator made tolerance-sensitive
    # tests order-dependent: the r3 VERDICT caught
    # test_train_steps_agree_across_builds failing only after certain
    # three-file subsets.)
    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# Synthetic CSDAP-layout dataset fixture. The reference ships sample scenes
# under CSDAP_complete/<region>/<sensor>/*.tif with labels at
# <region>/labels/<name>.tif (floodplanet.py:76-95), but the PS/S2 blobs are
# stripped from the snapshot, so tests generate a miniature dataset with the
# same layout and value conventions.
# ---------------------------------------------------------------------------

_SENSOR_SPECS = {
    # sensor -> (bands, dtype, value range)
    "PS": (4, np.uint16, (0, 8000)),
    "S1": (2, np.float32, (-30.0, 5.0)),
    "S2": (10, np.uint16, (0, 4096)),
    "L8": (7, np.float32, (0.0, 20000.0)),
}


def make_synthetic_csdap(
    root,
    regions=("RegionA", "RegionB", "RegionC"),
    sensors=("PS", "S1"),
    scenes_per_region=2,
    scene_hw=(96, 128),
    seed=0,
):
    """Create a miniature CSDAP_complete tree of synthetic GeoTIFF scenes."""
    from floodplanet_code_tpu.geo import tiff

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "CSDAP_complete")
    h, w = scene_hw
    for region in regions:
        os.makedirs(os.path.join(base, region, "labels"), exist_ok=True)
        for sensor in sensors:
            os.makedirs(os.path.join(base, region, sensor), exist_ok=True)
        for i in range(scenes_per_region):
            name = f"{region}_{i}"
            # Label raw values: 0 nodata, 1 dry, 2 flood (floodplanet.py:587-591)
            label = rng.choice([0, 1, 2], size=(h, w), p=[0.1, 0.6, 0.3]).astype(
                np.uint8
            )
            tiff.imwrite(os.path.join(base, region, "labels", name + ".tif"), label)
            for sensor in sensors:
                bands, dtype, (lo, hi) = _SENSOR_SPECS[sensor]
                img = rng.uniform(lo, hi, size=(bands, h, w))
                # Correlate band 0 with the flood mask so training can learn.
                img[0] = np.where(label == 2, hi * 0.9, lo + (hi - lo) * 0.1)
                img = img.astype(dtype)
                layout_chw = sensor != "PS"  # PS scenes are stored HWC
                if layout_chw:
                    tiff.imwrite(
                        os.path.join(base, region, sensor, name + ".tif"), img
                    )
                else:
                    tiff.imwrite(
                        os.path.join(base, region, sensor, name + ".tif"),
                        np.transpose(img, (1, 2, 0)),
                        planar_as_chw=False,
                    )
    return root


@pytest.fixture(scope="session")
def synthetic_csdap_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("csdap_data")
    return str(make_synthetic_csdap(str(root)))


def make_synthetic_sen1floods11(
    root,
    regions=("Bolivia", "Ghana", "Mekong"),
    chips_per_region=2,
    chip_hw=(96, 96),
    seed=0,
):
    """Miniature Sen1Floods11 v1.1 hand-labeled layout: flat S1Hand/S2Hand/
    LabelHand dirs, labels in {-1 nodata, 0 dry, 1 water}."""
    from floodplanet_code_tpu.geo import tiff

    rng = np.random.default_rng(seed)
    h, w = chip_hw
    for sub in ("S1Hand", "S2Hand", "LabelHand"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for region in regions:
        for i in range(chips_per_region):
            stem = f"{region}_{100 + i}"
            label = rng.choice(
                [-1, 0, 1], size=(h, w), p=[0.1, 0.6, 0.3]
            ).astype(np.int16)
            tiff.imwrite(
                os.path.join(root, "LabelHand", f"{stem}_LabelHand.tif"), label
            )
            s1 = rng.uniform(-30.0, 5.0, size=(2, h, w)).astype(np.float32)
            s1[0] = np.where(label == 1, 4.0, -25.0)
            tiff.imwrite(os.path.join(root, "S1Hand", f"{stem}_S1Hand.tif"), s1)
            s2 = rng.uniform(0, 4096, size=(13, h, w)).astype(np.uint16)
            tiff.imwrite(os.path.join(root, "S2Hand", f"{stem}_S2Hand.tif"), s2)
    return root


@pytest.fixture(scope="session")
def synthetic_s1f11_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("s1f11_data")
    return str(make_synthetic_sen1floods11(str(root)))
