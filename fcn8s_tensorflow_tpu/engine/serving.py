"""HTTP inference service: a deployable serving endpoint for a trained model.

The reference's only "serving" story is a Python loop around ``sess.run``
(`/root/reference/fcn8s_tensorflow.py:772-855`). This module packages this
framework's batched/tiled/quantized predict paths behind a dependency-free
HTTP API (stdlib ``ThreadingHTTPServer``), suitable for a pod-local sidecar
or a demo endpoint:

* ``POST /predict``  — request body: encoded image (PNG/JPEG, any H×W)
  → response: grayscale PNG of argmax class ids (uint8).
* ``POST /overlay``  — same request → RGB PNG with the class colors
  alpha-composited on the input (on-device compositing when the server was
  built with a color map).
* ``GET  /healthz``  — JSON liveness + model config.
* ``GET  /stats``    — JSON request counters and latency percentiles.

Predictions run under a lock (one device user at a time — the executables
are shape-cached, and requests of one size reuse one compiled program);
decode/encode run concurrently on the request threads.

Start:  python -m fcn8s_tensorflow_tpu.engine.serving <checkpoint_dir> [port]
Used by tests/test_serving.py.
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque

import numpy as np
from PIL import Image


class ClientError(ValueError):
    """Bad request payload (undecodable image) — maps to HTTP 400; every
    other failure is the server's fault and maps to 500."""


class InferenceService:
    """Wraps an ``FCN8s`` model with the request-level logic (decode,
    predict, encode, stats) — separable from the HTTP layer for tests."""

    def __init__(self, model, color_map=None, *, quantized: bool = False,
                 tile=None, tile_overlap: int = 128):
        self.model = model
        self.color_map = color_map
        self.quantized = quantized
        self.tile = tile
        self.tile_overlap = tile_overlap
        self._lock = threading.Lock()
        # counters/latencies get their own lock: `_lock` is held for whole
        # device predicts, and /stats must not block behind one
        self._stats_lock = threading.Lock()
        self._latencies: deque[float] = deque(maxlen=1000)  # bounded memory
        self.requests = 0
        self.errors = 0

    def predict_png(self, image_bytes: bytes, overlay: bool = False) -> bytes:
        try:
            image = np.asarray(Image.open(io.BytesIO(image_bytes)).convert("RGB"))
        except Exception as exc:
            raise ClientError(f"undecodable image: {exc}") from exc
        t0 = time.perf_counter()
        with self._lock:
            if overlay:
                if self.color_map is None:
                    raise ValueError("server built without a color_map")
                out = self.model.predict(
                    image[None], overlay=self.color_map, quantized=self.quantized,
                    tile=self.tile, tile_overlap=self.tile_overlap,
                )[0]
                mode_img = Image.fromarray(out.astype(np.uint8), mode="RGB")
            else:
                ids = self.model.predict(
                    image[None], quantized=self.quantized,
                    tile=self.tile, tile_overlap=self.tile_overlap,
                )[0]
                if self.model.num_classes > 256:
                    # uint8 would silently alias ids >= 256; a 16-bit
                    # grayscale PNG ('I;16') keeps them exact
                    mode_img = Image.fromarray(ids.astype(np.uint16))
                else:
                    mode_img = Image.fromarray(ids.astype(np.uint8), mode="L")
        with self._stats_lock:
            self._latencies.append(time.perf_counter() - t0)
            self.requests += 1
        buf = io.BytesIO()
        mode_img.save(buf, format="PNG")
        return buf.getvalue()

    def stats(self) -> dict:
        # snapshot under the lock: request threads append concurrently and
        # iterating a mutating deque raises (ADVICE r2)
        with self._stats_lock:
            lat = np.asarray(list(self._latencies)) * 1e3
            requests, errors = self.requests, self.errors
        return {
            "requests": requests,
            "errors": errors,
            "p50_ms": float(np.percentile(lat, 50)) if lat.size else None,
            "p95_ms": float(np.percentile(lat, 95)) if lat.size else None,
        }

    def health(self) -> dict:
        return {
            "status": "ok",
            "model_config": self.model.model_config,
            "quantized": self.quantized,
            "tile": list(self.tile) if self.tile else None,
        }


def make_server(service: InferenceService, host: str = "127.0.0.1",
                port: int = 8009):
    """Build (not start) a ``ThreadingHTTPServer`` for the service."""
    import http.server

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats() is the observability
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, obj, code=200):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(service.health())
            elif self.path == "/stats":
                self._send_json(service.stats())
            else:
                self._send_json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path not in ("/predict", "/overlay"):
                self._send_json({"error": "not found"}, 404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                png = service.predict_png(body, overlay=self.path == "/overlay")
                self._send(200, png, "image/png")
            except Exception as exc:  # noqa: BLE001 — a server must not die
                with service._stats_lock:
                    service.errors += 1
                # client payload faults -> 400; anything else (device
                # failure, server misconfiguration) is OUR fault -> 500 so
                # monitors flag the backend instead of blaming callers
                code = 400 if isinstance(exc, ClientError) else 500
                self._send_json({"error": str(exc)}, code)

    return http.server.ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    checkpoint_dir = argv[0]
    port = int(argv[1]) if len(argv) > 1 else 8009

    from ..labels import TRAINIDS_TO_RGBA_DICT
    from .model import FCN8s

    model = FCN8s(model_load_dir=checkpoint_dir)
    service = InferenceService(model, color_map=TRAINIDS_TO_RGBA_DICT)
    server = make_server(service, port=port)
    print(f"serving {checkpoint_dir} at http://127.0.0.1:{server.server_address[1]}"
          f" (POST /predict, /overlay; GET /healthz, /stats)")
    try:
        server.serve_forever()
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
