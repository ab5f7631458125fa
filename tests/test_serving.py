"""Serving subsystem: dynamic batcher, fixed-shape predictor, HTTP server.

No reference counterpart (the reference is offline-only); these tests pin
the serving contract: requests of any size produce the same predictions as
a direct forward, concurrent small requests share device batches, and the
HTTP surface round-trips npz tiles to JSON alphas.
"""

import io
import json
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.serve.batcher import DynamicBatcher

TILE = (8, 8, 2)


def _mean_predict(batch):
    return batch.mean(axis=(1, 2, 3))


def test_batcher_sizes_and_padding():
    b = DynamicBatcher(_mean_predict, batch_size=4, tile_shape=TILE,
                       max_delay_ms=1.0)
    try:
        rng = np.random.default_rng(0)
        for n in (1, 3, 4, 7, 11):  # below / at / spanning the batch size
            tiles = rng.random((n,) + TILE, np.float32)
            got = b.submit(tiles).result(timeout=30)
            np.testing.assert_allclose(got, _mean_predict(tiles), rtol=1e-6)
        stats = b.stats()
        assert stats["requests"] == 5
        assert stats["tiles"] == 26
        assert stats["batches"] >= 7  # 26 rows / 4 per batch
    finally:
        b.close()


def test_batcher_buckets_dispatch_smallest_fit():
    calls = []

    def predict(batch):
        calls.append(batch.shape[0])
        return _mean_predict(batch)

    b = DynamicBatcher(predict, batch_size=8, tile_shape=TILE,
                       max_delay_ms=1.0, bucket_sizes=[2, 4])
    try:
        rng = np.random.default_rng(7)
        for n in (1, 3, 9):  # -> bucket 2, bucket 4, full 8 + bucket 2
            tiles = rng.random((n,) + TILE, np.float32)
            got = b.submit(tiles).result(timeout=30)
            np.testing.assert_allclose(got, _mean_predict(tiles), rtol=1e-6)
        assert calls == [2, 4, 8, 2]
        stats = b.stats()
        assert stats["bucket_sizes"] == [2, 4, 8]
        assert stats["capacity_rows"] == 16
        assert stats["padded_rows"] == 3  # 1 in each bucket-2 flush, 1 in the 4
        assert stats["mean_batch_occupancy"] == pytest.approx(13 / 16)
    finally:
        b.close()

    with pytest.raises(ValueError):  # bucket above batch_size
        DynamicBatcher(_mean_predict, batch_size=4, tile_shape=TILE,
                       bucket_sizes=[8])
    with pytest.raises(ValueError):
        DynamicBatcher(_mean_predict, batch_size=4, tile_shape=TILE,
                       bucket_sizes=[0])


def test_batcher_coalesces_concurrent_requests():
    calls = []

    def predict(batch):
        calls.append(batch.shape[0])
        time.sleep(0.01)  # let the queue fill behind the device call
        return _mean_predict(batch)

    b = DynamicBatcher(predict, batch_size=8, tile_shape=TILE,
                       max_delay_ms=200.0)
    try:
        rng = np.random.default_rng(1)
        tiles = [rng.random((1,) + TILE, np.float32) for _ in range(16)]
        results = [None] * 16

        def worker(i):
            results[i] = b.submit(tiles[i]).result(timeout=30)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(16):
            np.testing.assert_allclose(
                results[i], _mean_predict(tiles[i]), rtol=1e-6
            )
        # 16 one-tile requests must NOT have taken 16 device calls
        assert b.stats()["batches"] < 16
    finally:
        b.close()


def test_batcher_error_propagates_and_recovers():
    state = {"fail": True}

    def predict(batch):
        if state["fail"]:
            raise RuntimeError("boom")
        return _mean_predict(batch)

    b = DynamicBatcher(predict, batch_size=2, tile_shape=TILE, max_delay_ms=1.0)
    try:
        bad = b.submit(np.zeros((3,) + TILE, np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            bad.result(timeout=30)
        state["fail"] = False  # the dispatcher must survive the failed batch
        tiles = np.random.default_rng(2).random((2,) + TILE, np.float32)
        np.testing.assert_allclose(
            b.submit(tiles).result(timeout=30), _mean_predict(tiles), rtol=1e-6
        )
    finally:
        b.close()


def test_batcher_assembly_failure_resolves_futures():
    """An unexpected failure in batch ASSEMBLY (before predict_fn runs)
    resolves the queued futures with the error instead of killing the
    dispatcher thread — a dead dispatcher would strand every later request
    at its full timeout while /healthz stays green."""
    b = DynamicBatcher(_mean_predict, batch_size=4, tile_shape=TILE,
                       max_delay_ms=200.0)
    try:
        fut = b.submit(np.ones((2,) + TILE, np.float32))
        # poison the buffer allocation inside the 200 ms coalescing window
        # (2 < batch_size rows, so the dispatcher waits out the deadline)
        b._tile_shape = (-1,) + TILE[1:]
        with pytest.raises(Exception):
            fut.result(timeout=30)
        b._tile_shape = TILE  # heal — the dispatcher must still be alive
        tiles = np.random.default_rng(3).random((2,) + TILE).astype(np.float32)
        np.testing.assert_allclose(
            b.submit(tiles).result(timeout=30), _mean_predict(tiles),
            rtol=1e-6,
        )
    finally:
        b.close()


@pytest.mark.parametrize("bucket_sizes", [None, [3, 5]])
def test_batcher_randomized_stress(bucket_sizes):
    """Adversarial interleaving: 12 threads, random request sizes (1..19,
    spanning the batch size both ways), random client-side jitter — every
    request's predictions must match the direct computation exactly, and
    every tile must be processed exactly once. Run twice: single-shape and
    with batch buckets (every dispatch must then be a declared shape)."""
    processed = []
    lock = threading.Lock()

    def predict(batch):
        with lock:
            processed.append(batch.shape[0])
        return _mean_predict(batch)

    b = DynamicBatcher(predict, batch_size=8, tile_shape=TILE,
                       max_delay_ms=3.0, bucket_sizes=bucket_sizes)
    try:
        n_threads, per_thread = 12, 6
        results = [[None] * per_thread for _ in range(n_threads)]
        tiles = [
            [np.random.default_rng(100 + 17 * t + k).random(
                (int(np.random.default_rng(7 * t + k).integers(1, 20)),) + TILE,
                np.float32)
             for k in range(per_thread)]
            for t in range(n_threads)
        ]

        def worker(t):
            rng = np.random.default_rng(1000 + t)
            for k in range(per_thread):
                time.sleep(float(rng.random()) * 0.004)
                results[t][k] = b.submit(tiles[t][k]).result(timeout=60)

        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(n_threads)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for t in range(n_threads):
            for k in range(per_thread):
                np.testing.assert_allclose(
                    results[t][k], _mean_predict(tiles[t][k]), rtol=1e-6
                )
        total = sum(x.shape[0] for row in tiles for x in row)
        stats = b.stats()
        assert stats["tiles"] == total
        # every dispatched batch is one of the declared static shapes
        shapes = {8} if bucket_sizes is None else set(bucket_sizes) | {8}
        assert set(processed) <= shapes
        assert stats["capacity_rows"] - stats["padded_rows"] == total
    finally:
        b.close()


def test_batcher_validates_and_closes():
    b = DynamicBatcher(_mean_predict, batch_size=2, tile_shape=TILE,
                       max_delay_ms=1.0)
    with pytest.raises(ValueError):
        b.submit(np.zeros((2, 8, 8, 3), np.float32))  # wrong channels
    with pytest.raises(ValueError):
        b.submit(np.zeros((0,) + TILE, np.float32))  # empty
    pending = b.submit(np.zeros((5,) + TILE, np.float32))
    b.close()  # must flush the outstanding request first
    assert pending.result(timeout=30).shape == (5,)
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((1,) + TILE, np.float32))


@pytest.fixture(scope="module")
def tiny_model():
    from crosstalk_tpu.models import build_model, init_model

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=32, batch=2)
    return cfg, model, variables


def test_predictor_matches_module_forward(tiny_model):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.predictor import make_predictor

    cfg, model, variables = tiny_model
    predict = make_predictor(variables, cfg, batch_size=4, image_size=32,
                             fast=False)
    raw = np.random.default_rng(3).random((4, 32, 32, 2), np.float32) * 7.0
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False)
    )[:, 0]
    np.testing.assert_allclose(predict(raw), golden, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):
        predict(np.zeros((3, 32, 32, 2), np.float32))  # not the static shape


def test_predictor_fast_path_close_to_module(tiny_model):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.predictor import make_predictor

    cfg, model, variables = tiny_model
    predict = make_predictor(variables, cfg, batch_size=4, image_size=32,
                             fast=True, use_pallas=False)
    raw = np.random.default_rng(4).random((4, 32, 32, 2), np.float32)
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False)
    )[:, 0]
    np.testing.assert_allclose(predict(raw), golden, atol=2e-2)  # bf16 path


def test_predictor_batch_buckets_match_module(tiny_model):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.predictor import make_predictor

    cfg, model, variables = tiny_model
    predict = make_predictor(variables, cfg, batch_size=[2, 4], image_size=32,
                             fast=False)
    rng = np.random.default_rng(11)
    for n in (2, 4):
        raw = rng.random((n, 32, 32, 2), np.float32) * 3.0
        golden = np.asarray(
            model.apply(variables, normalize_batch_nhwc(raw), train=False)
        )[:, 0]
        np.testing.assert_allclose(predict(raw), golden, rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):  # n must be one of the compiled shapes
        predict(np.zeros((3, 32, 32, 2), np.float32))


def test_server_with_buckets_end_to_end(tiny_model):
    from crosstalk_tpu.serve.predictor import make_predictor
    from crosstalk_tpu.serve.server import CrosstalkServer

    cfg, model, variables = tiny_model
    predict = make_predictor(variables, cfg, batch_size=[2, 4], image_size=32,
                             fast=False)
    server = CrosstalkServer(predict, batch_size=4, image_size=32, port=0,
                             max_delay_ms=2.0, bucket_sizes=[2],
                             model_info={"model": "single"})
    server.start_background()
    try:
        host, port = server.address
        url = f"http://{host}:{port}"
        out = _post_npz(url, mixed=np.random.rand(1, 32, 32),
                        source=np.random.rand(1, 32, 32))
        assert len(out["alpha"]) == 1
        with urllib.request.urlopen(url + "/stats", timeout=30) as resp:
            stats = json.load(resp)
        assert stats["bucket_sizes"] == [2, 4]
        assert stats["capacity_rows"] == 2  # the lone tile rode bucket 2
    finally:
        server.shutdown()


def test_predictor_mesh_sharded_matches_single(tiny_model):
    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.serve.predictor import make_predictor

    cfg, model, variables = tiny_model
    single = make_predictor(variables, cfg, batch_size=8, image_size=32,
                            fast=False)
    sharded = make_predictor(variables, cfg, batch_size=8, image_size=32,
                             fast=False, mesh=data_mesh(8))
    raw = np.random.default_rng(9).random((8, 32, 32, 2), np.float32)
    np.testing.assert_allclose(sharded(raw), single(raw), rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):  # batch must divide the mesh
        make_predictor(variables, cfg, batch_size=6, image_size=32,
                       fast=False, mesh=data_mesh(8), warmup=False)


def _post_npz(url, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url + "/predict", data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.load(resp)


@pytest.fixture()
def running_server(tiny_model):
    from crosstalk_tpu.serve.predictor import make_predictor
    from crosstalk_tpu.serve.server import CrosstalkServer

    cfg, model, variables = tiny_model
    predict = make_predictor(variables, cfg, batch_size=4, image_size=32,
                             fast=False)
    server = CrosstalkServer(predict, batch_size=4, image_size=32,
                             port=0, max_delay_ms=2.0,
                             model_info={"model": "single"})
    server.start_background()
    host, port = server.address
    yield f"http://{host}:{port}", model, variables
    server.shutdown()


def test_http_predict_roundtrip(running_server):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc

    url, model, variables = running_server
    rng = np.random.default_rng(5)
    mixed = rng.random((3, 32, 32), np.float64)  # float64 like the real TIFFs
    source = rng.random((3, 32, 32), np.float64)
    out = _post_npz(url, mixed=mixed, source=source)
    assert out["n"] == 3
    raw = np.stack([mixed, source], axis=-1).astype(np.float32)
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False)
    )[:, 0]
    np.testing.assert_allclose(out["alpha"], golden, rtol=1e-5, atol=1e-5)

    # stacked-tiles form + single-tile (n dim omitted) form
    out2 = _post_npz(url, tiles=raw)
    np.testing.assert_allclose(out2["alpha"], golden, rtol=1e-5, atol=1e-5)
    out3 = _post_npz(url, tiles=raw[0])
    np.testing.assert_allclose(out3["alpha"], golden[:1], rtol=1e-5, atol=1e-5)


def test_client_roundtrip(running_server):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.client import CrosstalkClient

    url, model, variables = running_server
    client = CrosstalkClient(url)
    assert client.health()["status"] == "ok"

    rng = np.random.default_rng(6)
    mixed = rng.random((2, 32, 32), np.float64)
    source = rng.random((2, 32, 32), np.float64)
    got = client.predict(mixed, source)
    raw = np.stack([mixed, source], axis=-1).astype(np.float32)
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False)
    )[:, 0]
    np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-5)
    # pre-stacked form
    np.testing.assert_allclose(client.predict(raw), golden,
                               rtol=1e-5, atol=1e-5)
    assert client.stats()["requests"] >= 2

    # chunked upload: 5 tiles in posts of <=2, results concatenate in order
    mixed5 = rng.random((5, 32, 32), np.float64)
    source5 = rng.random((5, 32, 32), np.float64)
    before = client.stats()["requests"]
    got5 = client.predict(mixed5, source5, chunk=2)
    raw5 = np.stack([mixed5, source5], axis=-1).astype(np.float32)
    golden5 = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw5), train=False)
    )[:, 0]
    np.testing.assert_allclose(got5, golden5, rtol=1e-5, atol=1e-5)
    assert client.stats()["requests"] == before + 3  # ceil(5/2) posts


def test_http_health_stats_and_errors(running_server):
    url, _, _ = running_server
    with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
        health = json.load(resp)
    assert health["status"] == "ok" and health["model"] == "single"

    _post_npz(url, mixed=np.zeros((1, 32, 32)), source=np.ones((1, 32, 32)))
    with urllib.request.urlopen(url + "/stats", timeout=30) as resp:
        stats = json.load(resp)
    assert stats["batches"] >= 1 and stats["batch_size"] == 4

    # malformed body -> 400 with a JSON error, server stays up
    req = urllib.request.Request(url + "/predict", data=b"not-an-npz")
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=30)
    assert exc_info.value.code == 400
    assert "error" in json.load(exc_info.value)

    # wrong tile size -> 400
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post_npz(url, tiles=np.zeros((1, 16, 16, 2)))
    assert exc_info.value.code == 400

    # unknown endpoint -> 404
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(url + "/nope", timeout=30)
    assert exc_info.value.code == 404


def test_metrics_endpoint_prometheus_format(running_server):
    url, model, variables = running_server
    # drive one request so the counters are nonzero
    _post_npz(url, tiles=np.random.rand(2, 32, 32, 2).astype(np.float32))
    with urllib.request.urlopen(url + "/metrics", timeout=30) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        body = resp.read().decode()
    lines = body.splitlines()
    # every metric is annotated with HELP/TYPE and carries a numeric value
    metrics = {}
    for line in lines:
        if line.startswith("#"):
            continue
        name, value = line.rsplit(" ", 1)
        metrics[name] = float(value)
    assert metrics["crosstalk_requests_total"] >= 1
    assert metrics["crosstalk_tiles_total"] >= 2
    assert metrics["crosstalk_batches_total"] >= 1
    assert 0.0 <= metrics["crosstalk_batch_occupancy"] <= 1.0
    assert metrics["crosstalk_batch_size"] == 4
    assert "# TYPE crosstalk_requests_total counter" in lines
    assert "# TYPE crosstalk_batch_occupancy gauge" in lines


def test_float16_wire_format_halves_payload_within_budget(running_server):
    """The production wire format: client casts to float16 before upload.
    Payload must be ~half the f32 size and predictions must stay within the
    quantization budget of the f32 answer (normalization is on-device, so
    f16 raw intensities only perturb alphas at the ~1e-3 level)."""
    from crosstalk_tpu.serve.client import CrosstalkClient

    url, model, variables = running_server
    client = CrosstalkClient(url)
    rng = np.random.default_rng(7)
    # realistic raw intensities (not pre-normalized), float64 like the TIFFs
    mixed = rng.random((4, 32, 32)) * 1800.0 + 100.0
    source = rng.random((4, 32, 32)) * 1800.0 + 100.0

    def body_size(dtype):
        buf = io.BytesIO()
        cast = (lambda a: np.asarray(a, dtype)) if dtype else np.asarray
        np.savez(buf, mixed=cast(mixed), source=cast(source))
        return len(buf.getvalue())

    f32, f16 = body_size("float32"), body_size("float16")
    assert f16 < 0.55 * f32  # halved transfer (npz headers are tiny)

    golden = client.predict(mixed, source, dtype="float32")
    got = client.predict(mixed, source, dtype="float16")
    np.testing.assert_allclose(got, golden, atol=2e-3)


def test_f16_transport_end_to_end_within_budget(tiny_model):
    """A server built with transport_dtype='float16' (f16 device batches,
    on-device upcast) returns predictions within the quantization budget of
    the f32 path, and reports the transport dtype in its stats."""
    from crosstalk_tpu.serve.client import CrosstalkClient
    from crosstalk_tpu.serve.predictor import make_predictor
    from crosstalk_tpu.serve.server import CrosstalkServer

    cfg, model, variables = tiny_model
    rng = np.random.default_rng(11)
    mixed = rng.random((3, 32, 32)) * 1800 + 100
    source = rng.random((3, 32, 32)) * 1800 + 100

    results = {}
    for dtype in ("float32", "float16"):
        predict = make_predictor(variables, cfg, batch_size=4, image_size=32,
                                 fast=False, input_dtype=np.dtype(dtype))
        server = CrosstalkServer(predict, batch_size=4, image_size=32,
                                 port=0, max_delay_ms=2.0,
                                 transport_dtype=dtype)
        server.start_background()
        try:
            host, port = server.address
            client = CrosstalkClient(f"http://{host}:{port}")
            results[dtype] = client.predict(mixed, source, dtype=dtype)
            assert client.stats()["transport_dtype"] == dtype
        finally:
            server.shutdown()
    np.testing.assert_allclose(results["float16"], results["float32"],
                               atol=2e-3)


def test_http_request_limits(running_server):
    """Malformed Content-Length and oversized requests are clean 400s, not
    dropped connections; the server survives both."""
    url, _, _ = running_server

    # non-numeric Content-Length -> 400 (not a handler-thread traceback)
    import http.client

    host, port = url.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", "banana")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
    finally:
        conn.close()

    # tile-count cap -> 400 with an actionable message
    from crosstalk_tpu.serve.server import CrosstalkServer, _decode_request

    with pytest.raises(ValueError, match="cap is 2"):
        buf = io.BytesIO()
        np.savez(buf, tiles=np.zeros((3, 32, 32, 2), np.float16))
        _decode_request(buf.getvalue(), (32, 32), max_tiles=2)

    # zip-bomb: a ~KB compressed body that would DECODE to ~800 MB is
    # rejected from the .npy member headers alone, before np.load
    # materializes anything (constant arrays deflate ~1000x)
    bomb = io.BytesIO()
    np.savez_compressed(
        bomb, tiles=np.zeros((100_000, 32, 32, 2), np.float32)
    )
    assert len(bomb.getvalue()) < 1 << 20  # fits any sane body cap
    with pytest.raises(ValueError, match="would decode"):
        _decode_request(bomb.getvalue(), (32, 32), max_tiles=4096)

    # body-size cap -> 400 end-to-end against a tightly-capped server
    small = CrosstalkServer(lambda b: b.mean(axis=(1, 2, 3)), batch_size=2,
                            image_size=32, port=0, max_body_bytes=1024)
    small.start_background()
    try:
        shost, sport = small.address
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post_npz(f"http://{shost}:{sport}",
                      tiles=np.zeros((1, 32, 32, 2), np.float32))
        assert exc_info.value.code == 400
        assert "Content-Length" in json.load(exc_info.value)["error"]
    finally:
        small.shutdown()

    # the main server is still healthy after all of the above
    with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
        assert json.load(resp)["status"] == "ok"


def test_decode_request_integer_and_overflow_payloads():
    """Saturated 16-bit counts on a float16 transport go through the wire
    rescale (a direct uint16 65535 -> f16 cast is inf -> NaN predictions
    behind HTTP 200), and a float64 payload beyond float32 range is
    rejected instead of passing inf to the device."""
    from crosstalk_tpu.serve.server import _decode_request

    counts = np.linspace(0, 65535, 32, dtype=np.float64)
    tiles = np.broadcast_to(
        counts[None, None, :, None], (1, 32, 32, 2)
    ).astype(np.uint16)
    buf = io.BytesIO()
    np.savez(buf, tiles=tiles)
    out = _decode_request(buf.getvalue(), (32, 32), max_tiles=16,
                          transport_dtype=np.float16)
    assert out.dtype == np.float16
    f32 = out.astype(np.float32)
    assert np.isfinite(f32).all()
    # the rescale is a positive per-(tile, channel) affine map, so the
    # device's min-max normalize recovers the same normalized tile
    np.testing.assert_allclose(
        (f32[0, :, :, 0] - f32[0, :, :, 0].min())
        / (f32[0, :, :, 0].max() - f32[0, :, :, 0].min()),
        (tiles[0, :, :, 0] - tiles[0, :, :, 0].min())
        / np.ptp(tiles[0, :, :, 0].astype(np.float64)),
        atol=2e-3,
    )

    big = np.full((1, 32, 32, 2), 1e39)  # finite in f64, inf after f32 cast
    buf = io.BytesIO()
    np.savez(buf, tiles=big)
    with pytest.raises(ValueError, match="overflow"):
        _decode_request(buf.getvalue(), (32, 32), max_tiles=16,
                        transport_dtype=np.float32)


def test_server_shutdown_before_start_returns():
    """shutdown() on a constructed-but-never-started server returns instead
    of blocking forever on the serve_forever event (cleanup paths call it)."""
    from crosstalk_tpu.serve.server import CrosstalkServer

    server = CrosstalkServer(_mean_predict, batch_size=2, image_size=32,
                             port=0)
    t = threading.Thread(target=server.shutdown, daemon=True)
    t.start()
    t.join(timeout=15)
    assert not t.is_alive(), "shutdown() hung on a never-started server"


def test_decode_request_malformed_bodies_raise_valueerror():
    """Every malformed body class maps to ValueError (-> HTTP 400), never
    an unhandled exception in the handler thread."""
    import zipfile

    from crosstalk_tpu.serve.server import _decode_request

    ok = io.BytesIO()
    np.savez(ok, tiles=np.zeros((1, 32, 32, 2), np.float32))
    ok_bytes = ok.getvalue()

    # a zip whose member is not a .npy payload
    notnpy = io.BytesIO()
    with zipfile.ZipFile(notnpy, "w") as zf:
        zf.writestr("tiles.npy", b"this is not numpy data")

    rng = np.random.default_rng(0)
    bodies = [
        b"",                                   # empty
        b"garbage" * 100,                      # not a zip
        ok_bytes[: len(ok_bytes) // 2],        # truncated zip
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),  # random bytes
        notnpy.getvalue(),                     # zip, non-npy member
    ]
    for body in bodies:
        with pytest.raises(ValueError):
            _decode_request(body, (32, 32), max_tiles=16)
    # the well-formed body still decodes after all that
    assert _decode_request(ok_bytes, (32, 32), max_tiles=16).shape == (
        1, 32, 32, 2)


def test_http_error_with_unread_body_closes_connection(running_server):
    """A 404 on a POST whose body was never drained must close the
    keep-alive connection — otherwise the unread npz bytes are parsed as
    the next request line and every later request on the connection fails."""
    import http.client

    url, _, _ = running_server
    host, port = url.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.request("POST", "/wrong-path", body=b"x" * 100_000)
        resp = conn.getresponse()
        assert resp.status == 404
        assert resp.getheader("Connection", "").lower() == "close"
        resp.read()
        # a good request on a FRESH connection still works
        conn2 = http.client.HTTPConnection(host, int(port), timeout=30)
        try:
            conn2.request("GET", "/healthz")
            assert conn2.getresponse().status == 200
        finally:
            conn2.close()
    finally:
        conn.close()


def test_remote_eval_cli(tmp_path, tiny_model):
    """The remote-eval CLI scores a TIFF directory against a live server
    and writes the eval_run_{ts} contract; predictions must match a direct
    local forward within the f16 payload budget."""
    from crosstalk_tpu.cli.remote_eval import main as remote_eval_main
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.predictor import make_predictor
    from crosstalk_tpu.serve.server import CrosstalkServer
    from tests.conftest import make_synthetic_dataset

    cfg, model, variables = tiny_model
    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path / "data"))

    predict = make_predictor(variables, cfg, batch_size=4, image_size=32,
                             fast=False)
    server = CrosstalkServer(predict, batch_size=4, image_size=32, port=0,
                             max_delay_ms=2.0)
    server.start_background()
    try:
        host, port = server.address
        out = tmp_path / "out"
        out.mkdir()
        rc = remote_eval_main([
            "-m", mixed_dir, "-s", source_dir,
            "--url", f"http://{host}:{port}",
            "-o", str(out), "--request_tiles", "5", "-j", "1",
        ])
        assert rc == 0
        (run_dir,) = list(out.glob("eval_run_*"))
        assert (run_dir / "params.txt").exists()
        (csv_path,) = list(run_dir.glob("test_predictions_*.csv"))
        assert list(run_dir.glob("test_predictions_plot_*.png"))

        import csv as csv_mod

        with open(csv_path) as f:
            rows = list(csv_mod.DictReader(f))
        assert list(rows[0].keys()) == [
            "Image_ID", "Actual_Label", "Predicted_Label"]

        from crosstalk_tpu.data.index import PairIndex
        from crosstalk_tpu.data.pipeline import TileStore

        store = TileStore(PairIndex(mixed_dir, source_dir).samples, jobs=1)
        assert len(rows) == len(store)
        golden = np.asarray(model.apply(
            variables,
            normalize_batch_nhwc(np.asarray(store.tiles, np.float32)),
            train=False))[:, 0]
        got = np.array([float(r["Predicted_Label"]) for r in rows])
        np.testing.assert_allclose(got, golden, atol=2e-3)  # f16 payload
        ids = [int(r["Image_ID"]) for r in rows]
        assert ids == [int(i) for i in store.ids]

        # unreachable server -> clean error, not a traceback
        rc = remote_eval_main([
            "-m", mixed_dir, "-s", source_dir,
            "--url", "http://127.0.0.1:9", "-o", str(out),
        ])
        assert rc == 1
    finally:
        server.shutdown()


def test_serve_cli_flag_validation(tmp_path, capsys):
    from crosstalk_tpu.cli.serve import main as serve_main

    # neither -p nor --artifact
    assert serve_main([]) == 1
    assert "exactly one of" in capsys.readouterr().out
    # both
    assert serve_main(["-p", "a.pth", "--artifact", "b.ctkx"]) == 1
    assert "exactly one of" in capsys.readouterr().out
    # missing checkpoint file
    assert serve_main(["-p", str(tmp_path / "nope.pth")]) == 1
    assert "Error loading model" in capsys.readouterr().out
    # corrupt artifact
    bad = tmp_path / "bad.ctkx"
    bad.write_bytes(b"garbage")
    assert serve_main(["--artifact", str(bad)]) == 1
    assert "Error loading artifact" in capsys.readouterr().out
    # batch buckets: artifact path, non-integer, out-of-range
    assert serve_main(["--artifact", str(bad), "--batch_buckets", "32"]) == 1
    assert "requires a checkpoint" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--batch_buckets", "x,2"]) == 1
    assert "comma-separated integers" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--batch_size", "8",
                       "--batch_buckets", "16"]) == 1
    assert "must be in 1..batch_size" in capsys.readouterr().out
    # out-of-range port: clear error, not socket OverflowError
    assert serve_main(["-p", "a.pth", "--port", "99999"]) == 1
    assert "--port must be in 0-65535" in capsys.readouterr().out
    # non-positive --image_size: clear error, not a silent 256 fallback
    # (0) or a raw np.zeros shape error (negative) — round-3 advice
    assert serve_main(["-p", "a.pth", "--image_size", "0"]) == 1
    assert "--image_size must be positive" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--image_size", "-4"]) == 1
    assert "--image_size must be positive" in capsys.readouterr().out
    # --quantize int8 contract: checkpoint-only, parity-exclusive,
    # calibration dirs required (and only meaningful with it)
    assert serve_main(["--artifact", str(bad), "--quantize", "int8"]) == 1
    assert "--quantize int8 requires a checkpoint" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--quantize", "int8", "--parity"]) == 1
    assert "mutually exclusive" in capsys.readouterr().out
    # two-branch int8 is gated: measured wash (PERF_NOTES "int8 serving")
    assert serve_main(["-p", "a.pth", "-o", "double",
                       "--quantize", "int8"]) == 1
    assert "gated to the single-branch family" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--quantize", "int8"]) == 1
    assert "requires --calibration_mixed_dir" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--quantize", "int8",
                       "--calibration_mixed_dir", "m",
                       "--calibration_source_dir", "s",
                       "--calibration_tiles", "0"]) == 1
    assert "--calibration_tiles must be positive" in capsys.readouterr().out
    assert serve_main(["-p", "a.pth", "--calibration_mixed_dir", "m"]) == 1
    assert "only apply with --quantize" in capsys.readouterr().out


def test_serve_cli_rejects_wrong_image_size(tmp_path, capsys):
    """An --image_size incompatible with the checkpoint's head dims is a
    clear startup error, not a compile-time shape traceback."""
    torch = pytest.importorskip("torch")
    from crosstalk_tpu.cli.serve import main as serve_main
    from tests.torch_ref import TorchSingle

    torch.manual_seed(1)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=32)
    ckpt = str(tmp_path / "m.pth")
    torch.save(tmodel.state_dict(), ckpt)
    assert serve_main(["-p", ckpt, "--image_size", "64"]) == 1
    assert "compatible tile sizes: 32-39px" in capsys.readouterr().out


def test_serve_cli_subprocess(tmp_path):
    """Full CLI drive: load a real torch .pth (full-width single model at
    64px), serve it with the float16 transport, query it over HTTP, compare
    against the torch twin within the f16 quantization budget."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref import TorchSingle, burn_in_batch_stats

    torch.manual_seed(7)
    tmodel = TorchSingle(image_size=64)
    burn_in_batch_stats(tmodel, 64, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)
    # a second, differently-initialized checkpoint for the hot-reload leg
    torch.manual_seed(8)
    tmodel2 = TorchSingle(image_size=64)
    burn_in_batch_stats(tmodel2, 64, steps=2, seed=1)
    ckpt2 = str(tmp_path / "model2.pth")
    torch.save(tmodel2.state_dict(), ckpt2)

    proc = subprocess.Popen(
        [sys.executable, "-m", "crosstalk_tpu.cli.serve",
         "-p", ckpt, "-o", "single", "--port", "0", "--image_size", "64",
         "--batch_size", "4", "--batch_buckets", "2", "--parity",
         "--transport_dtype", "float16", "--allow_reload"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        url = None
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("serve CLI exited before listening")
            if line.startswith("Serving on "):
                url = line.split()[2]
                break
        assert url, "never saw the 'Serving on' line"

        rng = np.random.default_rng(8)
        mixed = rng.random((5, 64, 64), np.float64)
        source = rng.random((5, 64, 64), np.float64)
        out = _post_npz(url, mixed=mixed, source=source)

        raw = np.stack([mixed, source], axis=-1).astype(np.float32)
        lo = raw.min(axis=(1, 2), keepdims=True)
        hi = raw.max(axis=(1, 2), keepdims=True)
        norm = (raw - lo) / (hi - lo)
        with torch.no_grad():
            golden = tmodel(
                torch.from_numpy(norm.transpose(0, 3, 1, 2))
            ).numpy().ravel()
        # f16 transport: within the quantization budget of the torch golden
        np.testing.assert_allclose(out["alpha"], golden, atol=2e-3)

        # the 5-tile request rode a full 4-batch + the 2-bucket remainder
        with urllib.request.urlopen(url + "/stats", timeout=30) as resp:
            stats = json.load(resp)
        assert stats["bucket_sizes"] == [2, 4]
        assert stats["capacity_rows"] == 6 and stats["padded_rows"] == 1

        # hot-swap to the second checkpoint through the CLI's reload path
        from crosstalk_tpu.serve.client import CrosstalkClient

        client = CrosstalkClient(url, timeout=120)
        info = client.reload(ckpt2)
        assert info["status"] == "reloaded" and info["checkpoint"] == ckpt2
        out2 = _post_npz(url, mixed=mixed, source=source)
        with torch.no_grad():
            golden2 = tmodel2(
                torch.from_numpy(norm.transpose(0, 3, 1, 2))
            ).numpy().ravel()
        np.testing.assert_allclose(out2["alpha"], golden2, atol=2e-3)
        assert not np.allclose(golden2, golden)  # the swap actually happened

        # a reload candidate of a DIFFERENT model size is rejected (400)
        # and the current model keeps serving
        torch.manual_seed(9)
        small = TorchSingle(initial_filters=8, num_blocks=3, image_size=64)
        ckpt3 = str(tmp_path / "model3.pth")
        torch.save(small.state_dict(), ckpt3)
        try:
            client.reload(ckpt3)
            raise AssertionError("size-mismatched reload must fail")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "size mismatch" in e.read().decode()
        out3 = _post_npz(url, mixed=mixed, source=source)
        np.testing.assert_allclose(out3["alpha"], golden2, atol=2e-3)

        # SIGTERM drains gracefully: exit 0, shutdown message printed
        proc.terminate()
        rest = proc.communicate(timeout=60)[0]
        assert proc.returncode == 0, f"SIGTERM exit {proc.returncode}:\n{rest}"
        assert "Shutting down" in rest
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_serve_cli_int8_subprocess(tmp_path):
    """Full --quantize int8 drive: calibration tiles load + pair at startup,
    the int8 program serves, /healthz reports the tier, predictions track
    the torch twin within the int8 envelope, and hot-reload recalibrates."""
    torch = pytest.importorskip("torch")
    from crosstalk_tpu.data.tiff import write_tile
    from tests.torch_ref import TorchSingle, burn_in_batch_stats

    size = 32
    torch.manual_seed(12)
    tmodel = burn_in_batch_stats(
        TorchSingle(initial_filters=8, num_blocks=3, image_size=size),
        size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    calib_m = tmp_path / "calib_mixed"
    calib_s = tmp_path / "calib_source"
    calib_m.mkdir()
    calib_s.mkdir()
    rng = np.random.default_rng(13)
    for i in range(8):
        write_tile(str(calib_m / f"c{i}_mixed.tif"), rng.random((size, size)))
        write_tile(str(calib_s / f"c{i}_source.tif"), rng.random((size, size)))

    proc = subprocess.Popen(
        [sys.executable, "-m", "crosstalk_tpu.cli.serve",
         "-p", ckpt, "-o", "single", "--port", "0",
         "--batch_size", "4", "--quantize", "int8",
         "--calibration_mixed_dir", str(calib_m),
         "--calibration_source_dir", str(calib_s)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        url = None
        saw_calibration = False
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("serve CLI exited before listening")
            if line.startswith("Calibrating int8"):
                saw_calibration = True
            if line.startswith("Serving on "):
                url = line.split()[2]
                break
        assert url, "never saw the 'Serving on' line"
        assert saw_calibration

        with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
            health = json.load(resp)
        assert health["path"] == "int8-serving"

        mixed = rng.random((4, size, size), np.float64)
        source = rng.random((4, size, size), np.float64)
        out = _post_npz(url, mixed=mixed, source=source)
        raw = np.stack([mixed, source], axis=-1).astype(np.float32)
        lo = raw.min(axis=(1, 2), keepdims=True)
        hi = raw.max(axis=(1, 2), keepdims=True)
        norm = (raw - lo) / (hi - lo)
        with torch.no_grad():
            golden = tmodel(
                torch.from_numpy(norm.transpose(0, 3, 1, 2))
            ).numpy().ravel()
        spread = max(float(np.ptp(golden)), 1e-3)
        assert float(np.abs(out["alpha"] - golden).mean()) < 0.15 * spread
    finally:
        if proc.poll() is None:
            proc.terminate()
            proc.wait(timeout=60)


def test_hot_reload_endpoint():
    """POST /reload hot-swaps the model with zero downtime: old model keeps
    serving during the (slow) load+compile, the swap is atomic, failures
    leave the previous model serving, and the endpoint is off by default."""
    from crosstalk_tpu.serve.client import CrosstalkClient
    from crosstalk_tpu.serve.server import CrosstalkServer

    def model_a(batch):
        return np.full((batch.shape[0],), 1.0, np.float32)

    registry = {
        "b.pth": lambda batch: np.full((batch.shape[0],), 2.0, np.float32),
    }
    reload_started = threading.Event()
    release_reload = threading.Event()

    def reload_fn(path):
        if path not in registry:
            raise FileNotFoundError(path)
        reload_started.set()
        # simulate the load+compile window; requests must keep serving
        assert release_reload.wait(timeout=30)
        return registry[path], {"model": "single", "checkpoint": path}

    # ---- reload disabled by default
    off = CrosstalkServer(model_a, batch_size=2, image_size=8,
                          port=0, max_delay_ms=1.0)
    off.start_background()
    try:
        url = "http://%s:%d" % off.address
        with pytest.raises(urllib.error.HTTPError) as exc:
            CrosstalkClient(url).reload("b.pth")
        assert exc.value.code == 403
    finally:
        off.shutdown()

    server = CrosstalkServer(model_a, batch_size=2, image_size=8,
                             port=0, max_delay_ms=1.0,
                             model_info={"checkpoint": "a.pth"},
                             reload_fn=reload_fn)
    server.start_background()
    try:
        url = "http://%s:%d" % server.address
        client = CrosstalkClient(url)
        tiles = np.zeros((3, 8, 8, 2), np.float32)
        np.testing.assert_array_equal(client.predict(tiles), [1.0] * 3)

        # bad path -> 400, old model untouched
        release_reload.set()
        with pytest.raises(urllib.error.HTTPError) as exc:
            client.reload("missing.pth")
        assert exc.value.code == 400
        assert "still serving" in json.loads(exc.value.read())["error"]
        np.testing.assert_array_equal(client.predict(tiles), [1.0] * 3)
        assert client.health()["checkpoint"] == "a.pth"

        # slow reload: requests issued mid-reload are served by the old model
        release_reload.clear()
        reload_started.clear()
        done = {}

        def do_reload():
            done["info"] = client.reload("b.pth")

        t = threading.Thread(target=do_reload)
        t.start()
        assert reload_started.wait(timeout=30)
        np.testing.assert_array_equal(client.predict(tiles), [1.0] * 3)
        release_reload.set()
        t.join(timeout=30)
        assert done["info"]["status"] == "reloaded"
        assert done["info"]["checkpoint"] == "b.pth"

        np.testing.assert_array_equal(client.predict(tiles), [2.0] * 3)
        assert client.health()["checkpoint"] == "b.pth"
        assert client.stats()["reloads"] == 1
    finally:
        server.shutdown()


def test_io_timeout_frees_stalled_connections():
    """Slow-loris guard: a client that sends headers but never the body (or
    idles on a keep-alive connection) must not pin a handler thread forever
    — the socket read times out, the stalled POST gets a 408, and the
    server keeps serving."""
    import socket

    from crosstalk_tpu.serve.server import CrosstalkServer

    server = CrosstalkServer(_mean_predict, batch_size=4, image_size=8,
                             port=0, max_delay_ms=1.0, io_timeout=1.0)
    server.start_background()
    host, port = server.address
    try:
        # 1) headers claim a body that never arrives -> 408, connection closed
        s = socket.create_connection((host, port), timeout=10)
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 50\r\n\r\n")
        t0 = time.monotonic()
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = s.recv(4096)
            if not chunk:
                break
            resp += chunk
        assert time.monotonic() - t0 < 8.0
        assert b"408" in resp.split(b"\r\n", 1)[0], resp[:200]
        s.close()

        # 2) an idle connection (no request line) is reaped, not held open
        idle = socket.create_connection((host, port), timeout=10)
        assert idle.recv(4096) == b""  # server closed it after io_timeout
        idle.close()

        # 3) the server still serves normal requests afterwards
        tiles = np.random.default_rng(3).random((2, 8, 8, 2), np.float32)
        buf = io.BytesIO()
        np.savez(buf, tiles=tiles)
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert out["n"] == 2
    finally:
        server.shutdown()


def test_f16_wire_survives_saturated_16bit_intensities(running_server):
    """Raw counts above float16's max (65504) — e.g. a saturated 16-bit
    pixel at 65535 — must NOT become inf/NaN on the f16 wire. The client
    rescales per (tile, channel) to [0, 1] before casting (serve/wire.py);
    the on-device min-max normalize is exactly invariant under that, so
    predictions match the f32 path within the quantization budget."""
    from crosstalk_tpu.serve.client import CrosstalkClient

    url, _, _ = running_server
    client = CrosstalkClient(url)
    rng = np.random.default_rng(13)
    mixed = rng.random((3, 32, 32)) * 65535.0  # saturating 16-bit range
    source = rng.random((3, 32, 32)) * 100000.0  # beyond it entirely
    golden = client.predict(mixed, source, dtype="float32")
    got = client.predict(mixed, source, dtype="float16")
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, golden, atol=2e-3)
    # stacked (n, H, W, 2) input takes the same safe path
    tiles = np.stack([mixed, source], axis=-1)
    got2 = client.predict(tiles, dtype="float16")
    np.testing.assert_allclose(got2, golden, atol=2e-3)


def test_decode_request_casts_once_to_transport_dtype():
    """Server-side decode goes straight to the batcher's transport dtype:
    f16 payload on an f16 server passes through without an f32 detour, and
    a wide payload downcast to f16 rescales instead of overflowing."""
    from crosstalk_tpu.serve.server import _decode_request

    rng = np.random.default_rng(5)
    raw = (rng.random((2, 8, 8, 2)) * 100000.0).astype(np.float32)

    buf = io.BytesIO()
    np.savez(buf, tiles=raw)
    out = _decode_request(buf.getvalue(), (8, 8), 16, np.float16)
    assert out.dtype == np.float16
    assert np.isfinite(out.astype(np.float32)).all()
    assert out.astype(np.float32).max() <= 1.0

    f16 = (raw / raw.max()).astype(np.float16)
    buf = io.BytesIO()
    np.savez(buf, tiles=f16)
    out = _decode_request(buf.getvalue(), (8, 8), 16, np.float16)
    assert out.dtype == np.float16
    np.testing.assert_array_equal(out, f16)


def test_decode_request_rejects_wide_dtype_bombs_and_nonfinite():
    """The zip-bomb guard bounds BYTES, not just elements: a tiny compressed
    body declaring float64/structured members at the element cap must be
    rejected before np.load materializes gigabytes. Non-finite payloads are
    rejected too (min-max normalize would propagate NaN into predictions)."""
    from crosstalk_tpu.serve.server import _decode_request

    max_tiles = 4
    hw = (8, 8)

    # float64 members at the element cap: allowed byte budget is 8B/elem,
    # so exactly at cap passes the size guard (shape check rejects later) —
    # but a structured dtype with a big itemsize must be caught.
    big_item = np.zeros((max_tiles, 8, 8, 2), dtype=[("v", "V256")])
    buf = io.BytesIO()
    np.savez_compressed(buf, tiles=big_item)
    with pytest.raises(ValueError, match="bytes|dtype"):
        _decode_request(buf.getvalue(), hw, max_tiles)

    # object dtype is rejected at the header, never unpickled
    obj = np.empty((2, 2), dtype=object)
    obj.fill(None)
    buf = io.BytesIO()
    import zipfile

    with zipfile.ZipFile(buf, "w") as zf:
        member = io.BytesIO()
        np.lib.format.write_array(member, obj, allow_pickle=True)
        zf.writestr("tiles.npy", member.getvalue())
    with pytest.raises(ValueError, match="object dtype"):
        _decode_request(buf.getvalue(), hw, max_tiles)

    # non-finite values -> clean 400-path ValueError, not NaN predictions
    bad = np.full((1, 8, 8, 2), np.inf, np.float32)
    buf = io.BytesIO()
    np.savez(buf, tiles=bad)
    with pytest.raises(ValueError, match="non-finite"):
        _decode_request(buf.getvalue(), hw, max_tiles)


def test_to_f16_wire_is_invariant_under_device_normalize():
    """normalize(to_f16_wire(x)) == normalize(x) up to f16 quantization —
    the property that makes the f16 wire format safe."""
    import jax.numpy as jnp

    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.wire import to_f16_wire

    rng = np.random.default_rng(3)
    raw = (rng.random((3, 8, 8, 2)) * 87000.0 - 1000.0).astype(np.float32)
    raw[1, :, :, 0] = 70000.0  # constant plane beyond f16 range

    wire = to_f16_wire(raw, (1, 2))
    assert wire.dtype == np.float16
    assert np.isfinite(wire.astype(np.float32)).all()

    a = np.asarray(normalize_batch_nhwc(jnp.asarray(raw)))
    b = np.asarray(normalize_batch_nhwc(jnp.asarray(wire, jnp.float32)))
    # constant planes pass through (clipped into f16 range), varying planes
    # match to f16 resolution
    np.testing.assert_allclose(b[0], a[0], atol=2e-3)
    np.testing.assert_allclose(b[2], a[2], atol=2e-3)
    assert float(b[1, 0, 0, 0]) == pytest.approx(65504.0)
