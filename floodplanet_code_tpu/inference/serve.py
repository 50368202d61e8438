"""Long-lived flood-mask inference server (deployment/serving daemon).

The reference's deployment story is a shell loop that re-launches
infer.py per scene directory (Batch_infer.sh:12-26) — every invocation
pays interpreter start, checkpoint restore, and a fresh model compile.
This daemon loads the checkpoint ONCE, keeps the jitted sliding-window
step's compile cache warm across requests (the TPU-native win: first
request compiles in ~20-40 s, every later one runs at full device
throughput), and serves the same per-root workflow over HTTP:

    python -m floodplanet_code_tpu.inference.serve <checkpoint> \
        [--host 127.0.0.1] [--port 8765] [--tta]

    GET  /healthz
        -> {"status": "ok", "devices": N, "model_loaded": bool}
    POST /infer   {"root": "/data/scenes/T1", "split": "all",
                   "save_dir": "...", "dataset": "floodplanet"}
        -> {"written": [mask paths], "root": ..., "seconds": t}

Requests are serialized with a lock (one TPU program at a time); the
model/variables live on device between requests. Masks are written
exactly as the batch CLI writes them (georeferenced uint8 GeoTIFFs via
the native writer).
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class InferenceService:
    """Holds the warm model and runs per-root inference requests.

    Two sources, exactly one of which must be given:
    - ``checkpoint_path``: restore + trace the live model (jit compile on
      the first request);
    - ``artifact_path``: an AOT StableHLO export (tools/export_model.py,
      living under ``<exp>/export/``) — the frozen predict step runs as-is,
      no model code is traced and the weights are inside the artifact. TTA
      and tile/batch shape were fixed at export time (the JSON manifest
      next to the artifact records them; requests are validated against
      it).
    """

    def __init__(
        self,
        checkpoint_path: str | None = None,
        tta: bool = False,
        artifact_path: str | None = None,
    ):
        from floodplanet_code_tpu.config import load_experiment_config

        if (checkpoint_path is None) == (artifact_path is None):
            raise ValueError(
                "give exactly one of checkpoint_path / artifact_path"
            )
        self.checkpoint_path = checkpoint_path
        self.artifact_path = artifact_path
        self.manifest = None
        if artifact_path is not None:
            base = os.path.normpath(artifact_path)
            if base.endswith(".stablehlo"):
                base = base[: -len(".stablehlo")]
            with open(base + ".json") as handle:
                self.manifest = json.load(handle)
            if tta and not self.manifest["tta"]:
                raise ValueError(
                    "--tta requested but this artifact was exported with "
                    "tta=false; TTA is baked in at export time"
                )
            tta = bool(self.manifest["tta"])
            # The artifact may live anywhere (--out); its experiment dir
            # comes from the recorded checkpoint provenance.
            source = self.manifest["checkpoint"]
        else:
            source = checkpoint_path
        self.tta = tta
        self.experiment_dir = os.path.dirname(
            os.path.dirname(os.path.normpath(source))
        )
        self.cfg = load_experiment_config(self.experiment_dir)
        self._lock = threading.Lock()  # one device program at a time
        self._warm = None  # (model, variables, predict_step)
        self._warm_key = None  # (n_channels, n_classes) the triple was built for

    def _warm_model(self, dataset):
        """Load the checkpoint and build the predict step once per shape."""
        from floodplanet_code_tpu.inference.predict import load_model_for_eval
        from floodplanet_code_tpu.inference.sliding import make_predict_step

        key = (dataset.n_channels, dataset.n_classes)
        if self._warm is None or self._warm_key != key:
            if self.artifact_path is not None:
                from floodplanet_code_tpu.tools.export_model import (
                    load_exported,
                )

                call = load_exported(self.artifact_path)
                inputs = self.manifest["inputs"]

                def step(variables, batch, _call=call, _inputs=inputs):
                    feed = {}
                    for name, spec in _inputs.items():
                        got = list(batch[name].shape)
                        if got != spec["shape"]:
                            raise ValueError(
                                f"artifact expects {name} {spec['shape']}, "
                                f"request produced {got} — re-export with "
                                "matching batch/tile shape"
                            )
                        feed[name] = batch[name]
                    return _call(feed)

                self._warm = (None, {}, step)
            else:
                model, variables = load_model_for_eval(
                    self.cfg, self.checkpoint_path, dataset
                )
                step = make_predict_step(model, tta=self.tta)
                self._warm = (model, variables, step)
            self._warm_key = key
        return self._warm

    def infer_root(
        self,
        root: str,
        split: str = "all",
        save_dir: str | None = None,
        dataset_name: str | None = None,
    ) -> dict:
        from floodplanet_code_tpu.data import (
            build_dataset,
            generate_image_slice_object,
        )
        from floodplanet_code_tpu.inference.infer import infer

        if not os.path.isdir(root):
            raise FileNotFoundError(f"scene root does not exist: {root}")
        dataset_name = dataset_name or self.cfg.dataset.name
        save_dir = save_dir or os.path.join(
            self.experiment_dir,
            "serve_inference",
            os.path.basename(os.path.normpath(root)),
        )
        with self._lock:
            start = time.perf_counter()
            run_cfg = copy.deepcopy(self.cfg)
            kwargs = dict(run_cfg.dataset.get("dataset_kwargs") or {})
            kwargs["root_dir"] = root
            run_cfg.dataset["dataset_kwargs"] = kwargs
            if self.manifest is not None:
                # The artifact's batch/tile shape is frozen; feed exactly
                # it. It is also a single-device program (jax.export lowers
                # for nr_devices=1), so pin the mesh to one chip — infer()'s
                # device-count batch rounding then preserves the frozen
                # batch too. Multi-chip serving = checkpoint mode.
                shape = self.manifest["inputs"]["image"]["shape"]
                run_cfg.batch_size = int(shape[0])
                run_cfg.crop_height = int(shape[1])
                run_cfg.crop_width = int(shape[2])
                run_cfg.tpu["n_devices"] = 1
                # Pin the inference batch too: infer() prefers
                # tpu.inference_batch_size (sweep default 16), which must
                # not override the artifact's frozen batch dimension.
                run_cfg.tpu["inference_batch_size"] = int(shape[0])
            # Probe dataset (same non-overlap tiling infer() uses) to warm
            # the model for this channel/class shape.
            slice_params = generate_image_slice_object(
                run_cfg.crop_height,
                run_cfg.crop_width,
                stride=min(run_cfg.crop_height, run_cfg.crop_width),
            )
            probe = build_dataset(
                dataset_name,
                split,
                slice_params,
                sensor=run_cfg.dataset.sensor,
                channels=run_cfg.dataset.channels,
                norm_mode=run_cfg.norm_mode,
                eval_region=None,
                ignore_index=run_cfg.ignore_index,
                seed_num=run_cfg.select("seed_num"),
                train_split_pct=run_cfg.select("train_split_pct", 0.8),
                output_metadata=True,
                **kwargs,
            )
            warm = self._warm_model(probe)
            written = infer(
                run_cfg,
                self.checkpoint_path,
                dataset_name,
                split,
                save_dir,
                eval_region=None,
                tta=self.tta,
                warm=warm,
                dataset=probe,  # same cfg/root/split: skip the re-scan
            )
            return {
                "root": root,
                "written": written,
                "seconds": round(time.perf_counter() - start, 3),
            }

    @property
    def model_loaded(self) -> bool:
        return self._warm is not None


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            import jax

            self._reply(
                200,
                {
                    "status": "ok",
                    "devices": len(jax.devices()),
                    "model_loaded": service.model_loaded,
                    "checkpoint": service.checkpoint_path,
                    "artifact": service.artifact_path,
                },
            )

        def do_POST(self):
            if self.path != "/infer":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except ValueError as exc:
                self._reply(400, {"error": f"bad JSON body: {exc}"})
                return
            # Validate request fields OUTSIDE the service try-block so a
            # KeyError from deep inside the service is a 500, not a
            # misleading 400 "missing field".
            if "root" not in req:
                self._reply(400, {"error": "missing field: 'root'"})
                return
            try:
                result = service.infer_root(
                    root=req["root"],
                    split=req.get("split", "all"),
                    save_dir=req.get("save_dir"),
                    dataset_name=req.get("dataset"),
                )
                self._reply(200, result)
            except FileNotFoundError as exc:
                self._reply(404, {"error": str(exc)})
            except Exception as exc:  # surface, don't kill the server
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

        def log_message(self, fmt, *args):  # quiet default access logs
            pass

    return Handler


def serve(
    checkpoint_path: str | None = None,
    host: str = "127.0.0.1",
    port: int = 8765,
    tta: bool = False,
    artifact_path: str | None = None,
) -> ThreadingHTTPServer:
    """Build the HTTP server (caller runs serve_forever())."""
    service = InferenceService(
        checkpoint_path, tta=tta, artifact_path=artifact_path
    )
    server = ThreadingHTTPServer((host, port), make_handler(service))
    server.service = service  # exposed for tests
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Long-lived flood-mask inference server."
    )
    parser.add_argument("checkpoint_path", type=str, nargs="?", default=None)
    parser.add_argument(
        "--artifact",
        type=str,
        default=None,
        help="Serve an AOT StableHLO export (tools/export_model.py) "
        "instead of a checkpoint.",
    )
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument(
        "--tta",
        action="store_true",
        help="Dihedral test-time augmentation on every request.",
    )
    args = parser.parse_args(argv)
    server = serve(
        args.checkpoint_path,
        args.host,
        args.port,
        tta=args.tta,
        artifact_path=args.artifact,
    )
    print(
        f"[serve] listening on http://{args.host}:{server.server_address[1]} "
        f"({'artifact ' + args.artifact if args.artifact else 'checkpoint ' + str(args.checkpoint_path)})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
