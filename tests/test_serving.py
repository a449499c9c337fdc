"""HTTP inference service (engine/serving.py): full request round trips."""

import io
import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.engine.model import FCN8s
from fcn8s_tensorflow_tpu.engine.serving import InferenceService, make_server

CMAP = {0: (255, 0, 0, 127), 1: (0, 255, 0, 127), 2: (0, 0, 255, 127)}


@pytest.fixture(scope="module")
def server():
    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    service = InferenceService(model, color_map=CMAP)
    srv = make_server(service, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", service
    srv.shutdown()
    srv.server_close()
    model.close()


def _png_bytes(rng, h=32, w=64):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
        buf, format="PNG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_predict_endpoint(server, rng):
    base, service = server
    status, png = _post(base + "/predict", _png_bytes(rng))
    assert status == 200
    ids = np.asarray(Image.open(io.BytesIO(png)))
    assert ids.shape == (32, 64) and ids.dtype == np.uint8
    assert ids.max() < 3


def test_overlay_endpoint_and_odd_size(server, rng):
    base, _ = server
    status, png = _post(base + "/overlay", _png_bytes(rng, h=30, w=50))
    assert status == 200
    rgb = np.asarray(Image.open(io.BytesIO(png)))
    assert rgb.shape == (30, 50, 3)


def test_health_and_stats(server, rng):
    base, service = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["model_config"]["num_classes"] == 3
    _post(base + "/predict", _png_bytes(rng))
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["p50_ms"] is not None


def test_bad_request_does_not_kill_server(server, rng):
    base, service = server
    try:
        _post(base + "/predict", b"this is not an image")
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())
    # server still alive
    status, _ = _post(base + "/predict", _png_bytes(rng))
    assert status == 200
    assert service.errors >= 1


def test_unknown_routes(server):
    base, _ = server
    try:
        urllib.request.urlopen(base + "/nope", timeout=30)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_server_fault_maps_to_500(rng):
    """Server-side faults (here: /overlay without a color map — a config
    error) return 500, not 400 (client fault)."""
    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    service = InferenceService(model, color_map=None)
    srv = make_server(service, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    try:
        try:
            _post(f"http://{host}:{port}/overlay", _png_bytes(rng))
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.shutdown()
        srv.server_close()
        model.close()


def test_wide_id_space_uses_16bit_png():
    """num_classes > 256 must not be truncated into a uint8 PNG — the ids
    round-trip through a 16-bit grayscale PNG instead (ADVICE r2)."""

    class _WideModel:
        num_classes = 300
        model_config = {"num_classes": 300}

        def predict(self, images, **kw):
            n, h, w = images.shape[:3]
            ids = np.arange(h * w, dtype=np.int32).reshape(1, h, w) % 300
            return np.repeat(ids, n, axis=0)

    service = InferenceService(_WideModel())
    rng = np.random.default_rng(0)
    png = service.predict_png(_png_bytes(rng, h=20, w=20))
    out = np.asarray(Image.open(io.BytesIO(png)))
    assert out.dtype == np.uint16 or out.dtype == np.int32
    assert out.max() == 299  # ids above 255 survived


def test_stats_concurrent_with_predictions(server, rng):
    """/stats must stay readable while request threads append latencies
    (snapshot under its own lock — ADVICE r2)."""
    base, service = server
    stop = threading.Event()
    errors = []

    def hammer_stats():
        while not stop.is_set():
            try:
                service.stats()
            except Exception as exc:  # pragma: no cover
                errors.append(exc)
                return

    t = threading.Thread(target=hammer_stats)
    t.start()
    try:
        for _ in range(3):
            _post(base + "/predict", _png_bytes(rng))
    finally:
        stop.set()
        t.join()
    assert not errors


# ---------------------------------------------------------------------------
# micro-batching
# ---------------------------------------------------------------------------
def test_microbatching_coalesces_concurrent_requests(rng):
    """8 concurrent same-shape requests under a 200 ms window must resolve
    correctly in FEWER device dispatches than requests, and each response
    must equal the unbatched prediction."""
    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    service = InferenceService(model, color_map=CMAP, batch_window_ms=200,
                               max_batch=8)
    try:
        bodies = [_png_bytes(rng) for _ in range(8)]
        results = [None] * 8

        def worker(i):
            results[i] = service.predict_png(bodies[i])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        st = service.stats()
        assert st["requests"] == 8
        assert st["dispatches"] < 8, st  # coalesced
        # responses match the unbatched path exactly
        ref_service = InferenceService(model, color_map=CMAP)
        for body, out in zip(bodies, results):
            ids = np.asarray(Image.open(io.BytesIO(out)))
            ref = np.asarray(Image.open(io.BytesIO(ref_service.predict_png(body))))
            np.testing.assert_array_equal(ids, ref)
    finally:
        service.close()
        model.close()


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_microbatching_groups_by_shape_and_mode(rng):
    """Mixed shapes and predict/overlay modes in one window resolve
    independently (separate device groups), all correct."""
    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    service = InferenceService(model, color_map=CMAP, batch_window_ms=150,
                               max_batch=4)
    try:
        specs = [(32, 64, False), (32, 64, True), (64, 64, False)]
        outs = {}

        def worker(i, h, w, overlay):
            outs[i] = (service.predict_png(_png_bytes(rng, h, w),
                                           overlay=overlay), overlay, h, w)

        threads = [threading.Thread(target=worker, args=(i, h, w, ov))
                   for i, (h, w, ov) in enumerate(specs)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (png, overlay, h, w) in outs.items():
            arr = np.asarray(Image.open(io.BytesIO(png)))
            assert arr.shape[:2] == (h, w)
            assert (arr.ndim == 3) == overlay
    finally:
        service.close()
        model.close()


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_microbatching_error_propagates_to_request(rng):
    """A device-side failure fails the affected requests (500 path), not
    the dispatcher thread; later requests still work."""
    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    service = InferenceService(model, color_map=None, batch_window_ms=50)
    try:
        with pytest.raises(ValueError, match="color_map"):
            service.predict_png(_png_bytes(rng), overlay=True)
        # the batcher thread survived; a good request still succeeds
        out = service.predict_png(_png_bytes(rng))
        assert np.asarray(Image.open(io.BytesIO(out))).shape == (32, 64)
    finally:
        service.close()
        model.close()


def test_microbatching_submit_after_close_fails_fast(rng):
    """A request arriving after close() must raise immediately (mapped to
    500 by the HTTP layer), never hang on an unresolved future."""
    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    service = InferenceService(model, color_map=CMAP, batch_window_ms=50)
    service.close()
    with pytest.raises(RuntimeError, match="closed"):
        service.predict_png(_png_bytes(rng))
    model.close()
