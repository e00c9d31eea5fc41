"""Micro-batching serving frontend (ladder_tpu/serving/batcher.py):
correctness under concurrency, actual coalescing, fault isolation, and
the HTTP drop-in surface."""

import threading

import numpy as np
import pytest

from tests.test_serving import save_trained_like, tiny_config


@pytest.fixture(scope="module")
def batched(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("batcher")
    cfg = tiny_config(tmp_path)
    model, params = save_trained_like(cfg)
    from ladder_tpu.serving import Batcher, InferenceEngine

    engine = InferenceEngine(cfg, serve_batch=8)
    # a long linger window makes coalescing deterministic in the tests
    batcher = Batcher(engine, max_wait_ms=150.0)
    yield cfg, engine, batcher
    batcher.close()


def test_concurrent_requests_coalesce_and_match(batched):
    cfg, engine, batcher = batched
    rng = np.random.default_rng(3)
    xs = [rng.random((1, 28, 28, 1)).astype(np.float32) for _ in range(6)]
    direct = [engine.encode(x) for x in xs]

    before = dict(batcher.stats)
    results = [None] * len(xs)
    barrier = threading.Barrier(len(xs))

    def worker(i):
        barrier.wait()
        results[i] = batcher.encode(xs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(xs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    for (m, s), (dm, ds) in zip(results, direct):
        assert m.shape == (1, cfg["code_size"])
        np.testing.assert_allclose(m, dm, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(s, ds, rtol=1e-5, atol=1e-6)

    made = batcher.stats["batches"] - before["batches"]
    got = batcher.stats["requests"] - before["requests"]
    assert got == len(xs)
    # 6 single-row requests inside one 150 ms window on an 8-row budget
    # must coalesce into strictly fewer dispatches
    assert made < got
    assert batcher.stats["coalesced"] > 0


def test_row_order_preserved_multi_row(batched):
    cfg, engine, batcher = batched
    rng = np.random.default_rng(4)
    a = rng.random((3, 28, 28, 1)).astype(np.float32)
    b = rng.random((2, 28, 28, 1)).astype(np.float32)
    out = [None, None]
    t1 = threading.Thread(
        target=lambda: out.__setitem__(0, batcher.reconstruct(a)))
    t2 = threading.Thread(
        target=lambda: out.__setitem__(1, batcher.reconstruct(b)))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    np.testing.assert_allclose(out[0], engine.reconstruct(a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1], engine.reconstruct(b),
                               rtol=1e-5, atol=1e-6)


def test_mismatched_shapes_do_not_poison_peers(batched):
    cfg, engine, batcher = batched
    good = np.random.default_rng(5).random((1, 28, 28, 1)).astype(np.float32)
    bad = np.zeros((1, 7, 7, 1), np.float32)  # wrong spatial dims
    res = {}

    def ok():
        res["good"] = batcher.encode(good)

    def boom():
        try:
            batcher.encode(bad)
            res["bad"] = "no error"
        except Exception as e:  # noqa: BLE001
            res["bad"] = e

    t1 = threading.Thread(target=ok)
    t2 = threading.Thread(target=boom)
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    # different row shapes never share a batch: good result intact
    np.testing.assert_allclose(res["good"][0], engine.encode(good)[0],
                               rtol=1e-5, atol=1e-6)
    assert isinstance(res["bad"], Exception)


def test_oversized_request_completes(batched):
    """A single request larger than max_rows must still dispatch (the
    engine chunks it) — the worker used to spin forever because the lead
    never fit the row budget."""
    cfg, engine, batcher = batched
    x = np.random.default_rng(7).random(
        (batcher._max_rows + 3, 28, 28, 1)).astype(np.float32)
    fut = batcher.submit("reconstruct", x)
    out = fut.result(timeout=60)
    np.testing.assert_allclose(out, engine.reconstruct(x),
                               rtol=1e-5, atol=1e-6)


def test_uint8_and_float_requests_never_coalesce(batched):
    """Same row shape, different dtype: the engine normalises uint8
    inside the jitted path, so coalescing the two would skip the /255
    for the uint8 rows. Each caller must get its own dtype's result."""
    cfg, engine, batcher = batched
    rng = np.random.default_rng(8)
    xu = rng.integers(0, 256, (1, 28, 28, 1), dtype=np.uint8)
    xf = (xu.astype(np.float32) / 255.0)
    direct_u = engine.encode(xu)
    direct_f = engine.encode(xf)
    res = {}
    barrier = threading.Barrier(2)

    def run(key, x):
        barrier.wait()
        res[key] = batcher.encode(x)

    t1 = threading.Thread(target=run, args=("u", xu))
    t2 = threading.Thread(target=run, args=("f", xf))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    np.testing.assert_allclose(res["u"][0], direct_u[0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(res["f"][0], direct_f[0],
                               rtol=1e-5, atol=1e-6)


def test_rejects_empty_and_unknown(batched):
    cfg, engine, batcher = batched
    with pytest.raises(ValueError, match="empty batch"):
        batcher.submit("encode", np.zeros((0, 28, 28, 1), np.float32))
    with pytest.raises(ValueError, match="unbatchable"):
        batcher.submit("generate", np.zeros((1, 28, 28, 1), np.float32))


def test_delegates_engine_surface(batched):
    cfg, engine, batcher = batched
    assert batcher.serve_batch == engine.serve_batch
    assert batcher.buckets == engine.buckets
    g = batcher.generate(2, seed=0)
    assert g.shape[0] == 2


def test_http_handler_with_batcher(batched):
    """make_handler accepts the Batcher as a drop-in engine and /healthz
    reports the batching stats."""
    import http.client
    import json
    import sys
    from http.server import ThreadingHTTPServer

    sys.path.insert(0, "/root/repo")
    from serve import make_handler

    cfg, engine, batcher = batched
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        info = json.loads(conn.getresponse().read())
        assert info["ok"] and "batching" in info
        import io
        buf = io.BytesIO()
        x = np.random.default_rng(6).random((1, 28, 28, 1)).astype(np.float32)
        np.save(buf, x)
        conn.request("POST", "/reconstruct", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        out = np.load(io.BytesIO(resp.read()))
        np.testing.assert_allclose(out, engine.reconstruct(x),
                                   rtol=1e-5, atol=1e-6)
    finally:
        srv.shutdown()


def test_concurrent_http_load_mixed_shapes_and_dtypes(batched):
    """VERDICT r3 item 6: N parallel HTTP clients with mixed paths, row
    counts and dtypes against the batcher-fronted graceful server — every
    client gets exactly its own rows back (no cross-request mixing) and
    p99 latency stays bounded on CPU."""
    import http.client
    import io
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from serve import make_http_server, serve_http

    from ladder_tpu.serving import Batcher

    cfg, engine, _ = batched
    front = Batcher(engine, max_wait_ms=5.0)  # fresh: the server closes it
    srv = make_http_server(front, 0)
    port = srv.server_address[1]
    server_thread = threading.Thread(
        target=serve_http, args=(engine, front, srv), kwargs=dict(quiet=True))
    server_thread.start()

    rng = np.random.default_rng(11)
    n_clients = 12
    jobs = []  # (route, request array, expected response array)
    for i in range(n_clients):
        kind = i % 3
        if kind == 0:   # single-row float32 encode
            x = rng.random((1, 28, 28, 1)).astype(np.float32)
            jobs.append(("/encode", x, np.stack(engine.encode(x))))
        elif kind == 1:  # single-row uint8 encode (different dtype key)
            x = rng.integers(0, 256, (1, 28, 28, 1), dtype=np.uint8)
            jobs.append(("/encode", x, np.stack(engine.encode(x))))
        else:            # multi-row reconstruct
            x = rng.random((2, 28, 28, 1)).astype(np.float32)
            jobs.append(("/reconstruct", x, engine.reconstruct(x)))

    results = [None] * n_clients
    latencies = [None] * n_clients
    barrier = threading.Barrier(n_clients)

    def client(i):
        route, x, _ = jobs[i]
        buf = io.BytesIO()
        np.save(buf, x)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        barrier.wait()
        t0 = time.perf_counter()
        conn.request("POST", route, body=buf.getvalue())
        resp = conn.getresponse()
        body = resp.read()
        latencies[i] = time.perf_counter() - t0
        assert resp.status == 200, (route, resp.status, body[:200])
        results[i] = np.load(io.BytesIO(body))
        conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert all(r is not None for r in results)
        for (route, x, expect), got in zip(jobs, results):
            np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6), \
                route
        lat = sorted(latencies)
        p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]
        assert p99 < 20.0, f"p99 latency {p99:.2f}s over bound"
        assert front.stats["coalesced"] > 0  # the load actually batched
    finally:
        srv.shutdown()
        server_thread.join(timeout=30)
    assert not server_thread.is_alive()
    # serve_http's drain closed the batcher on the way out
    with pytest.raises(RuntimeError, match="closed"):
        front.submit("encode", np.zeros((1, 28, 28, 1), np.float32))


def test_close_drains_queued_requests(batched):
    """Graceful drain: every request queued before close() completes with
    its correct result; submissions after close() are rejected."""
    cfg, engine, _ = batched
    from ladder_tpu.serving import Batcher

    batcher = Batcher(engine, max_wait_ms=200.0)  # long linger: work queues
    rng = np.random.default_rng(12)
    xs = [rng.random((1, 28, 28, 1)).astype(np.float32) for _ in range(5)]
    expect = [engine.reconstruct(x) for x in xs]
    futs = [batcher.submit("reconstruct", x) for x in xs]
    batcher.close(timeout=60)  # worker must flush the queue before exiting
    for f, e in zip(futs, expect):
        np.testing.assert_allclose(f.result(timeout=1), e,
                                   rtol=1e-5, atol=1e-6)
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit("reconstruct", xs[0])
