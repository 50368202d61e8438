"""Inference tests: stitcher parity (host vs device), sliding-window engine,
and the predict/infer CLI report layout."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from floodplanet_code_tpu.data.tiling import CropParams, crop_params_for_scene
from floodplanet_code_tpu.data import generate_image_slice_object
from floodplanet_code_tpu.inference.stitcher import (
    DeviceStitcher,
    ImageStitcher,
    finalize_canvas,
    make_tile_valid_mask,
    stitch_batch,
)


class TestHostStitcher:
    def test_overlap_average(self, tmp_path, rng):
        st = ImageStitcher(str(tmp_path))
        full = rng.random((40, 60, 2)).astype(np.float32)
        sl = generate_image_slice_object(20, stride=10)
        for cp in crop_params_for_scene(40, 60, sl):
            tile = np.zeros((20, 20, 2), np.float32)
            tile[: cp.height, : cp.width] = full[cp.h0 : cp.hE, cp.w0 : cp.wE]
            st.add_image(tile, "scene", cp, 40, 60)
        out = st.get_combined_images()["scene"]
        np.testing.assert_allclose(out, full, atol=1e-4)

    def test_save_class_thresholds(self, tmp_path):
        st = ImageStitcher(str(tmp_path), image_type_name="pred_class")
        cp = CropParams(0, 0, 4, 4, 4, 4, 4, 4)
        st.add_image(np.full((4, 4), 0.7, np.float32), "img", cp, 4, 4)
        paths, names, sizes = st.save_images(save_class=True)
        from floodplanet_code_tpu.geo import tiff

        saved = tiff.imread(paths[0])
        np.testing.assert_allclose(saved, 1.0)

    def test_pil_backend_scales(self, tmp_path):
        st = ImageStitcher(str(tmp_path), image_type_name="gt", save_backend="PIL", save_ext=".png")
        cp = CropParams(0, 0, 8, 8, 8, 8, 8, 8)
        st.add_image(np.full((8, 8), 0.5, np.float32), "img", cp, 8, 8)
        paths, _, _ = st.save_images()
        from PIL import Image

        arr = np.array(Image.open(paths[0]))
        assert arr.max() > 100  # x255 heuristic applied


class TestDeviceStitcher:
    def test_matches_host_stitcher(self, rng):
        """On-device scatter-add == host numpy stitcher (the oracle)."""
        h, w, c = 50, 70, 3
        sl = generate_image_slice_object(32, stride=16)
        crops = crop_params_for_scene(h, w, sl)
        tiles, offsets, heights, widths = [], [], [], []
        host = ImageStitcher("/tmp/_unused_host_stitch")
        for cp in crops:
            tile = rng.random((32, 32, c)).astype(np.float32)
            # zero out the padded region like the loader does
            tile[cp.height :, :, :] = 0
            tile[:, cp.width :, :] = 0
            host.add_image(
                tile[: cp.height, : cp.width], "s", cp, h, w
            )
            tiles.append(tile)
            offsets.append([cp.h0, cp.w0])
            heights.append(cp.height)
            widths.append(cp.width)
        dev = DeviceStitcher(c)
        valid = make_tile_valid_mask(heights, widths, 32, 32)
        dev.add_batch(
            "s", h, w, jnp.asarray(np.stack(tiles)), np.array(offsets), valid
        )
        np.testing.assert_allclose(
            dev.combined("s"), host.get_combined_images()["s"], atol=1e-4
        )

    def test_batch_valid_mask_excludes_padding(self, rng):
        c = 1
        cp = CropParams(0, 0, 8, 8, 8, 8, 8, 8)
        tiles = np.ones((2, 8, 8, c), np.float32)
        offsets = np.zeros((2, 2), np.int32)
        valid = make_tile_valid_mask([8, 8], [8, 8], 8, 8, batch_valid=[1, 0])
        canvas, weights = stitch_batch(
            jnp.zeros((8, 8, c)),
            jnp.zeros((8, 8)),
            jnp.asarray(tiles),
            jnp.asarray(offsets),
            jnp.asarray(valid),
        )
        np.testing.assert_allclose(np.asarray(weights), 1.0)  # only 1 tile

    def test_finalize_nan_scrub(self):
        canvas = jnp.zeros((4, 4, 1))
        weights = jnp.zeros((4, 4))
        out = np.asarray(finalize_canvas(canvas, weights))
        assert np.isfinite(out).all()

    def test_host_fallback_matches_device_path(self, rng):
        """Scenes over the HBM cap accumulate on host with identical output."""
        h, w, c = 50, 70, 2
        sl = generate_image_slice_object(32, stride=16)
        crops = crop_params_for_scene(h, w, sl)
        tiles, offsets, heights, widths = [], [], [], []
        for cp in crops:
            tile = rng.random((32, 32, c)).astype(np.float32)
            tile[cp.height :, :, :] = 0
            tile[:, cp.width :, :] = 0
            tiles.append(tile)
            offsets.append([cp.h0, cp.w0])
            heights.append(cp.height)
            widths.append(cp.width)
        tiles = np.stack(tiles)
        offsets = np.array(offsets)
        valid = make_tile_valid_mask(heights, widths, 32, 32)

        dev = DeviceStitcher(c)  # default cap: device path
        dev.add_batch("s", h, w, jnp.asarray(tiles), offsets, valid)
        small = DeviceStitcher(c, max_canvas_bytes=1024)  # forces host path
        small.add_batch("s", h, w, jnp.asarray(tiles), offsets, valid)
        assert "s" in small._host and "s" not in small._canvas
        np.testing.assert_allclose(
            small.combined("s"), dev.combined("s"), atol=1e-4
        )

    @pytest.mark.slow
    def test_big_raster_6k(self, rng):
        """A synthetic 6k x 6k scene stitches via the host fallback without
        allocating a multi-GB device canvas."""
        h = w = 6000
        c, tile = 1, 512
        st = DeviceStitcher(c, max_canvas_bytes=256 << 20)
        # Sparse coverage is enough to exercise the path end to end.
        offsets = np.array([[0, 0], [5632, 5632], [2944, 128]], np.int32)
        tiles = np.ones((3, tile, tile, c), np.float32)
        valid = make_tile_valid_mask([tile] * 3, [tile] * 3, tile, tile)
        st.add_batch("big", h, w, jnp.asarray(tiles), offsets, valid)
        assert "big" in st._host
        out = st.pop_combined("big")
        assert out.shape == (h, w, c)
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(out[5999, 5999], 1.0, atol=1e-4)
        assert out[1000, 1000] == 0.0


class TestInferenceBatchSize:
    def test_resolve_inference_batch_size(self):
        from floodplanet_code_tpu.config import compose
        from floodplanet_code_tpu.inference.sliding import (
            resolve_inference_batch_size,
        )

        cfg = compose(overrides=["batch_size=8"])
        # Config default (16, sweep-backed) wins over the train batch.
        assert resolve_inference_batch_size(cfg, 1) == 16
        # Rounds down to a device multiple, up to >= 1 tile per device.
        assert resolve_inference_batch_size(cfg, 3) == 15
        assert resolve_inference_batch_size(cfg, 32) == 32
        # null / 0 falls back to the training batch size.
        cfg2 = compose(
            overrides=["batch_size=10", "tpu.inference_batch_size=null"]
        )
        assert resolve_inference_batch_size(cfg2, 1) == 10
        cfg3 = compose(
            overrides=["batch_size=8", "tpu.inference_batch_size=4"]
        )
        assert resolve_inference_batch_size(cfg3, 2) == 4


class TestTTA:
    """Dihedral test-time augmentation (sliding.make_predict_step tta)."""

    def _model_and_vars(self, rng, n_ch=2, n_cls=3):
        import jax

        from floodplanet_code_tpu.models import build_model

        model = build_model("ms_model", {"ms_image": n_ch}, n_cls)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, n_ch)).astype(np.float32))
        variables = model.init(jax.random.key(0), {"image": x}, train=False)
        return model, variables

    def test_equivariance_square(self, rng):
        # The D4-averaged predictor must commute with every D4 transform:
        # step(g x) == g step(x), exactly (layout ops are lossless).
        from floodplanet_code_tpu.inference.sliding import (
            _d4_apply,
            _d4_elements,
            make_predict_step,
        )

        model, variables = self._model_and_vars(rng)
        step = make_predict_step(model, tta=True)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)).astype(np.float32))
        base = np.asarray(step(variables, {"image": x}))
        for g in _d4_elements(square=True):
            got = np.asarray(step(variables, {"image": _d4_apply(x, *g)}))
            np.testing.assert_allclose(
                got, np.asarray(_d4_apply(jnp.asarray(base), *g)),
                rtol=1e-5, atol=1e-6,
            )

    def test_nonsquare_uses_flip_subgroup(self, rng):
        from floodplanet_code_tpu.inference.sliding import (
            _d4_elements,
            make_predict_step,
        )

        assert len(_d4_elements(square=False)) == 4
        model, variables = self._model_and_vars(rng)
        step = make_predict_step(model, tta=True)
        x = jnp.asarray(rng.standard_normal((1, 16, 24, 2)).astype(np.float32))
        probs = np.asarray(step(variables, {"image": x}))
        assert probs.shape == (1, 16, 24, 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    def test_tta_false_is_plain_softmax(self, rng):
        import jax

        from floodplanet_code_tpu.inference.sliding import make_predict_step

        model, variables = self._model_and_vars(rng)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
        plain = np.asarray(
            jax.nn.softmax(
                model.apply(variables, {"image": x}, train=False), axis=-1
            )
        )
        got = np.asarray(
            make_predict_step(model, tta=False)(variables, {"image": x})
        )
        np.testing.assert_allclose(got, plain, rtol=1e-6)


@pytest.mark.slow
class TestEndToEndInference:
    @pytest.fixture(scope="class")
    def trained_exp(self, synthetic_csdap_root, tmp_path_factory):
        from floodplanet_code_tpu.config import compose
        from floodplanet_code_tpu.train.fit import fit_model

        cfg = compose(
            overrides=[
                "dataset.sensor=PS",
                "eval_region=RegionA",
                "crop_height=32",
                "crop_width=32",
                "crop_stride=32",
                "batch_size=8",
                "n_epochs=1",
                "n_workers=2",
                "lr=1e-3",
                "limit_train_batches=3",
                "limit_val_batches=2",
                "tpu.compute_dtype=float32",
                "transforms.rotate.active=false",
            ]
        )
        cfg.dataset["dataset_kwargs"] = {"root_dir": synthetic_csdap_root}
        exp_dir = str(tmp_path_factory.mktemp("exp_infer"))
        best = fit_model(cfg, overwrite_exp_dir=exp_dir)
        return exp_dir, best

    def test_predict_cli_outputs(self, trained_exp):
        from floodplanet_code_tpu.inference.predict import main as predict_main

        exp_dir, best = trained_exp
        metrics = predict_main([best, "--eval_dataset_split", "test"])
        assert "test_MulticlassJaccardIndex" in metrics
        pred_root = os.path.join(exp_dir, "predictions", "floodplanet")
        assert os.path.isdir(pred_root)
        region_dir = os.path.join(pred_root, "RegionA")
        ckpt_dirs = os.listdir(region_dir)
        pred_dir = os.path.join(region_dir, ckpt_dirs[0])
        assert os.path.exists(os.path.join(pred_dir, "metrics.json"))
        assert os.path.exists(
            os.path.join(pred_dir, "ranked_images_F1-score.txt")
        )
        assert os.path.exists(os.path.join(pred_dir, "ranked_regions_iou.txt"))
        scenes = os.listdir(
            os.path.join(pred_dir, "image_predictions", "RegionA")
        )
        assert scenes
        scene_dir = os.path.join(
            pred_dir, "image_predictions", "RegionA", scenes[0]
        )
        for artifact in (
            "rgb.png",
            "pred_softmax.png",
            "gt.png",
            "pred_class.tif",
            "cm.png",
            "rgb_cm.gif",
        ):
            assert os.path.exists(os.path.join(scene_dir, artifact)), artifact
        with open(os.path.join(pred_dir, "metrics.json")) as fh:
            saved = json.load(fh)
        assert saved["eval_dataset"] == "floodplanet"

    def test_infer_cli_masks(self, trained_exp, synthetic_csdap_root):
        from floodplanet_code_tpu.geo import tiff
        from floodplanet_code_tpu.inference.infer import main as infer_main

        exp_dir, best = trained_exp
        written = infer_main(
            [best, "floodplanet", "test", "--eval_region", "RegionA"]
        )
        assert written
        mask = tiff.imread(written[0])
        assert mask.dtype == np.uint8
        assert mask.shape == (96, 128)
        assert set(np.unique(mask)) <= {0, 255}

    def test_stitched_probabilities_normalized(self, trained_exp):
        """Overlap-averaged softmax stays a distribution."""
        from floodplanet_code_tpu.config import load_experiment_config
        from floodplanet_code_tpu.data import build_dataset
        from floodplanet_code_tpu.inference.predict import load_model_for_eval
        from floodplanet_code_tpu.inference.sliding import sliding_window_predict

        exp_dir, best = trained_exp
        cfg = load_experiment_config(exp_dir)
        slice_params = generate_image_slice_object(32, stride=16)
        ds = build_dataset(
            "floodplanet",
            "test",
            slice_params,
            sensor="PS",
            eval_region="RegionA",
            ignore_index=0,
            output_metadata=True,
            **(cfg.dataset.get("dataset_kwargs") or {}),
        )
        model, variables = load_model_for_eval(cfg, best, ds)
        results = list(
            sliding_window_predict(model, variables, ds, batch_size=8)
        )
        assert len(results) == 2  # RegionA has 2 scenes
        for scene in results:
            probs = scene["probabilities"]
            assert probs.shape == (96, 128, 3)
            np.testing.assert_allclose(
                probs.sum(axis=-1), 1.0, atol=1e-3
            )

    def test_batch_infer_driver(
        self, trained_exp, synthetic_csdap_root, tmp_path
    ):
        """The Batch_infer.sh-equivalent loop: masks exported per root
        without mutating a shared dataset_dirs.json (reference
        Batch_infer.sh:12-26 rewrote it in place)."""
        from floodplanet_code_tpu.inference.batch_infer import main

        exp_dir, best = trained_exp
        save_dir = str(tmp_path / "batch")
        results = main(
            [
                best,
                "floodplanet",
                "--roots",
                synthetic_csdap_root,
                synthetic_csdap_root,
                "--split",
                "test",
                "--save_dir",
                save_dir,
            ]
        )
        written = results[synthetic_csdap_root]
        assert written and all(os.path.exists(p) for p in written)
        assert all(p.startswith(save_dir) for p in written)

    def test_export_stablehlo_roundtrip(self, trained_exp, tmp_path, rng):
        """AOT export -> deserialize -> call matches the live predict step
        exactly (weights baked in as constants)."""
        import jax

        from floodplanet_code_tpu.config import load_experiment_config
        from floodplanet_code_tpu.data import (
            build_dataset,
            generate_image_slice_object,
        )
        from floodplanet_code_tpu.inference.predict import load_model_for_eval
        from floodplanet_code_tpu.inference.sliding import make_predict_step
        from floodplanet_code_tpu.tools.export_model import (
            export_checkpoint,
            load_exported,
        )

        exp_dir, best = trained_exp
        manifest = export_checkpoint(
            best, out_path=str(tmp_path / "model"), batch_size=2
        )
        assert os.path.exists(manifest["artifact"])
        assert manifest["inputs"]["image"]["shape"] == [2, 32, 32, 4]
        # Portable across backends, not pinned to the exporting one.
        assert {"cpu", "tpu"} <= set(manifest["platforms"])

        cfg = load_experiment_config(exp_dir)
        dataset = build_dataset(
            cfg.dataset.name,
            "test",
            generate_image_slice_object(32, stride=32),
            sensor=cfg.dataset.sensor,
            channels=cfg.dataset.channels,
            norm_mode=cfg.norm_mode,
            eval_region=cfg.eval_region,
            ignore_index=cfg.ignore_index,
            **(cfg.dataset.get("dataset_kwargs") or {}),
        )
        model, variables = load_model_for_eval(cfg, best, dataset)
        batch = {
            "image": jnp.asarray(
                rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
            )
        }
        live = np.asarray(make_predict_step(model)(variables, batch))
        aot = np.asarray(load_exported(manifest["artifact"])(batch))
        np.testing.assert_allclose(aot, live, rtol=1e-6, atol=1e-6)
        # The artifact runs standalone — no model code, no checkpoint.
        assert manifest["n_classes"] == live.shape[-1]

    def test_serve_from_stablehlo_artifact(
        self, trained_exp, synthetic_csdap_root, tmp_path
    ):
        """The serving daemon running a frozen AOT export: no checkpoint
        restore, no model tracing — the artifact's step is fed directly."""
        import threading
        import urllib.request

        from floodplanet_code_tpu.inference.serve import serve
        from floodplanet_code_tpu.tools.export_model import export_checkpoint

        exp_dir, best = trained_exp
        # Custom --out location: the daemon must find the experiment via
        # the manifest's checkpoint provenance, not the artifact's path.
        manifest = export_checkpoint(
            best, out_path=str(tmp_path / "anywhere" / "model"), batch_size=8
        )

        server = serve(artifact_path=manifest["artifact"], port=0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.server_address[1]
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer",
                data=json.dumps(
                    {
                        "root": synthetic_csdap_root,
                        "split": "test",
                        "save_dir": str(tmp_path / "artifact_masks"),
                    }
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.loads(r.read())
            assert out["written"], out
            assert all(os.path.exists(p) for p in out["written"])
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                health = json.loads(r.read())
            assert health["artifact"] == manifest["artifact"]
            assert health["checkpoint"] is None
        finally:
            server.shutdown()
        # TTA is frozen at export time: asking for it again must fail.
        with pytest.raises(ValueError):
            serve(artifact_path=manifest["artifact"], port=0, tta=True)

    def test_serve_daemon(self, trained_exp, synthetic_csdap_root, tmp_path):
        """The HTTP serving daemon: health, cold request, warm request."""
        import threading
        import urllib.request

        from floodplanet_code_tpu.inference.serve import serve

        exp_dir, best = trained_exp
        server = serve(best, port=0)  # ephemeral port
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        port = server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        try:
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                health = json.loads(r.read())
            assert health["status"] == "ok"
            assert health["model_loaded"] is False

            def post(payload, timeout=600):
                req = urllib.request.Request(
                    f"{base}/infer",
                    data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    return json.loads(r.read())

            out1 = post(
                {
                    "root": synthetic_csdap_root,
                    "split": "test",
                    "save_dir": str(tmp_path / "req1"),
                }
            )
            assert out1["written"], out1
            assert all(os.path.exists(p) for p in out1["written"])
            # Second request rides the warm compiled step (same masks).
            out2 = post(
                {
                    "root": synthetic_csdap_root,
                    "split": "test",
                    "save_dir": str(tmp_path / "req2"),
                }
            )
            assert len(out2["written"]) == len(out1["written"])
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                assert json.loads(r.read())["model_loaded"] is True
            # Bad requests surface as HTTP errors, not server death.
            import urllib.error

            with pytest.raises(urllib.error.HTTPError) as err:
                post({"split": "test"})
            assert err.value.code == 400
            with pytest.raises(urllib.error.HTTPError) as err:
                post({"root": "/nonexistent/dir"})
            assert err.value.code == 404
        finally:
            server.shutdown()
