"""Serving layer: engine parity with the raw model, padding, generation,
AOT export round-trip, and the HTTP endpoint (new-framework capability on
top of the reference's checkpoint artifacts, base.py:37-85, 768-777)."""

import io
import json
import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ladder_tpu.models.builder import make_model
from ladder_tpu.utils.checkpoint import CheckpointManager, save_gm_prior_info


def tiny_config(tmp_path, prior="ours"):
    from tests.conftest import make_config

    cfg = make_config(prior=prior, n_mixtures=4, n_MC_samples=4)
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
    os.makedirs(cfg["result_dir"], exist_ok=True)
    return cfg


def save_trained_like(cfg, seed=0):
    """Init a model and persist it through the reference-layout artifacts."""
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    ck = CheckpointManager(cfg)
    ck.save({"params": params}, model="joint")
    rng = np.random.default_rng(seed)
    K = cfg["n_mixtures"]
    covs = np.stack([np.eye(cfg["representation_size"]) * 0.5] * K)
    save_gm_prior_info(cfg["result_dir"],
                       np.full((K,), 1.0 / K),
                       rng.standard_normal((K, cfg["representation_size"])),
                       covs)
    return model, params


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serving")
    cfg = tiny_config(tmp_path)
    model, params = save_trained_like(cfg)
    from ladder_tpu.serving import InferenceEngine
    engine = InferenceEngine(cfg, serve_batch=8)
    return cfg, model, params, engine


def test_engine_matches_model(served):
    cfg, model, params, engine = served
    x = np.random.default_rng(1).random((5, 28, 28, 1)).astype(np.float32)
    mean, std = engine.encode(x)
    ref_mean, ref_std = model.encode(params, jnp.asarray(x))
    np.testing.assert_allclose(mean, np.asarray(ref_mean)[:5], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(std, np.asarray(ref_std)[:5], rtol=1e-5,
                               atol=1e-5)

    recon = engine.reconstruct(x)
    ref = np.clip(np.asarray(model.decode(params, ref_mean)), 0, 1)[:5]
    np.testing.assert_allclose(recon, ref, rtol=1e-4, atol=1e-4)
    assert recon.min() >= 0.0 and recon.max() <= 1.0

    # uint8 inputs are normalised like the training pipeline
    xu = (x * 255).astype(np.uint8)
    mean_u, _ = engine.encode(xu)
    ref_u, _ = model.encode(params, jnp.asarray(
        xu.astype(np.float32) / 255.0))
    np.testing.assert_allclose(mean_u, np.asarray(ref_u)[:5], rtol=1e-5,
                               atol=1e-5)


def test_engine_padding_invariance(served):
    """Results must not depend on the pad rows (batch 3 vs batch 8)."""
    _, _, _, engine = served
    x = np.random.default_rng(2).random((8, 28, 28, 1)).astype(np.float32)
    full, _ = engine.encode(x)
    part, _ = engine.encode(x[:3])
    np.testing.assert_allclose(part, full[:3], rtol=1e-5, atol=1e-6)


def test_engine_celeba_bn_bucket_determinism(tmp_path):
    """The CelebA encoder normalises with batch statistics (reference
    parity quirk, models.py:471), so outputs legitimately depend on the
    padded batch composition — what MUST hold is that dispatch is
    deterministic: the same request always hits the same bucket and
    returns bit-identical results, and a request's outputs don't change
    when served alone vs padded (the pad rows are repeats of row -1, so a
    full-bucket request is composition-stable)."""
    cfg = tiny_config(tmp_path)
    cfg.update(exp_name="celeba", dim_input_x=128, dim_input_y=128,
               dim_input_channel=3, num_hidden_units=16, code_size=8)
    save_trained_like(cfg)
    from ladder_tpu.serving import InferenceEngine
    engine = InferenceEngine(cfg, serve_batch=4, buckets=(2,))
    x = np.random.default_rng(5).random((3, 128, 128, 3)).astype(np.float32)
    m1, s1 = engine.encode(x)
    m2, s2 = engine.encode(x)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(s1, s2)
    # full-bucket request: no pad rows, so exact across repeat calls too
    x4 = np.concatenate([x, x[:1]], axis=0)
    np.testing.assert_array_equal(engine.encode(x4)[0],
                                  engine.encode(x4)[0])


def test_engine_generate_and_density(served):
    _, _, _, engine = served
    imgs = engine.generate(11, seed=3)
    assert imgs.shape == (11, 28, 28, 1)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # deterministic per seed
    np.testing.assert_array_equal(imgs, engine.generate(11, seed=3))
    assert not np.array_equal(imgs, engine.generate(11, seed=4))
    lp = engine.t_log_density(np.zeros((4, 2), np.float32))
    assert lp.shape == (4,) and np.isfinite(lp).all()


def test_engine_warmup_and_latency(served):
    _, _, _, engine = served
    secs = engine.warmup()
    assert secs >= 0.0
    assert "encode" in engine.latency_ema
    # per-bucket latency keys exist for every warmed bucket
    for b in engine.buckets:
        assert f"encode@b{b}" in engine.latency_ema


def test_engine_bucket_dispatch_and_chunking(served):
    """1-row requests hit bucket 1; oversized batches chunk; empty errors."""
    _, _, _, engine = served
    assert engine.buckets == [1, 8]  # serve_batch=8 with default (1, 8)
    assert engine._bucket_for(1) == 1
    assert engine._bucket_for(2) == 8

    x = np.random.default_rng(11).random((19, 28, 28, 1)).astype(np.float32)
    chunked = engine.reconstruct(x)            # 19 > serve_batch=8 -> 3 chunks
    assert chunked.shape == (19, 28, 28, 1)
    ref = np.concatenate([engine.reconstruct(x[i:i + 8])
                          for i in range(0, 19, 8)])
    np.testing.assert_allclose(chunked, ref, rtol=1e-6, atol=1e-6)

    # bucket-1 result equals the padded-to-8 result (pad invariance)
    one, _ = engine.encode(x[:1])
    full, _ = engine.encode(x[:8])
    np.testing.assert_allclose(one, full[:1], rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="empty batch"):
        engine.reconstruct(x[:0])


def test_engine_mesh_validation(served):
    """Bad mesh shapes fail at construction with clear messages."""
    cfg, _, _, _ = served
    from ladder_tpu.serving import InferenceEngine

    with pytest.raises(ValueError, match="devices are available"):
        InferenceEngine(cfg, serve_batch=8, mesh_devices=512)
    if len(jax.devices()) >= 3:
        with pytest.raises(ValueError, match="divisible"):
            InferenceEngine(cfg, serve_batch=8, mesh_devices=3)


def test_export_roundtrip(served, tmp_path):
    cfg, model, params, engine = served
    from ladder_tpu.serving import export_inference, load_exported
    written = export_inference(engine, str(tmp_path / "exp"),
                               names=("decode", "reconstruct"))
    assert set(written) == {"decode", "reconstruct"}
    x = np.random.default_rng(4).random((8, 28, 28, 1)).astype(np.float32)
    recon_direct = engine.reconstruct(x)
    recon_exported = np.asarray(load_exported(written["reconstruct"])(x))
    np.testing.assert_allclose(recon_exported, recon_direct, rtol=1e-5,
                               atol=1e-5)
    z = np.random.default_rng(5).standard_normal(
        (8, cfg["code_size"])).astype(np.float32)
    np.testing.assert_allclose(np.asarray(load_exported(written["decode"])(z)),
                               engine.decode(z), rtol=1e-5, atol=1e-5)


def test_engine_mesh_parity(served):
    """8-virtual-device data-parallel serving == single-device results."""
    cfg, model, params, engine = served
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ladder_tpu.serving import InferenceEngine
    sharded = InferenceEngine(cfg, serve_batch=8, mesh_devices=8)
    x = np.random.default_rng(6).random((8, 28, 28, 1)).astype(np.float32)
    np.testing.assert_allclose(sharded.reconstruct(x), engine.reconstruct(x),
                               rtol=1e-5, atol=1e-5)


def test_http_endpoint(served):
    import urllib.request

    from http.server import ThreadingHTTPServer

    import serve as serve_cli

    _, _, _, engine = served
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_cli.make_handler(engine))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

        x = np.random.default_rng(7).random((3, 28, 28, 1)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"})
        with urllib.request.urlopen(req, timeout=60) as r:
            recon = np.load(io.BytesIO(r.read()))
        np.testing.assert_allclose(recon, engine.reconstruct(x), rtol=1e-5,
                                   atol=1e-5)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/generate?n=2&seed=1",
                timeout=60) as r:
            gen = np.load(io.BytesIO(r.read()))
        assert gen.shape == (2, 28, 28, 1)

        # malformed body -> clean HTTP 400, not a reset connection
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reconstruct", data=b"not-an-npy",
            headers={"Content-Type": "application/x-npy"})
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_engine_requires_checkpoints(tmp_path):
    """A serving engine must refuse to silently serve random-init weights."""
    from ladder_tpu.serving import InferenceEngine

    cfg = tiny_config(tmp_path / "empty")  # dirs exist, no checkpoints
    with pytest.raises(FileNotFoundError, match="allow_uninitialized"):
        InferenceEngine(cfg, serve_batch=8)
    # escape hatch for benches/smoke tests
    eng = InferenceEngine(cfg, serve_batch=8, allow_uninitialized=True)
    assert eng.reconstruct(np.zeros((1, 28, 28, 1), np.float32)).shape == \
        (1, 28, 28, 1)


def test_decode_representation_and_generate_edge_cases(served):
    cfg, model, params, engine = served
    t = np.random.default_rng(8).standard_normal(
        (3, cfg["representation_size"])).astype(np.float32)
    imgs = engine.decode_representation(t)
    import jax.numpy as jnp
    z = np.asarray(model.inner_decode(params, jnp.asarray(t))[0])
    ref = np.clip(np.asarray(model.decode(params, jnp.asarray(z))), 0, 1)
    np.testing.assert_allclose(imgs, ref, rtol=1e-5, atol=1e-5)

    empty = engine.generate(0)
    assert empty.shape == (0, 28, 28, 1)


def test_export_uint8_contract_and_mesh_guard(served, tmp_path):
    """Exported artifacts keep the engine's uint8-or-float input contract
    (the loader normalises), and mesh engines refuse to export."""
    cfg, model, params, engine = served
    from ladder_tpu.serving import (
        InferenceEngine,
        export_inference,
        load_exported,
    )

    written = export_inference(engine, str(tmp_path / "exp8"),
                               names=("reconstruct",))
    x8 = np.random.default_rng(9).integers(
        0, 256, (8, 28, 28, 1)).astype(np.uint8)
    got = np.asarray(load_exported(written["reconstruct"])(x8))
    np.testing.assert_allclose(got, engine.reconstruct(x8), rtol=1e-5,
                               atol=1e-5)

    import jax
    if len(jax.devices()) >= 8:
        sharded = InferenceEngine(cfg, serve_batch=8, mesh_devices=8)
        with pytest.raises(ValueError, match="single-device"):
            export_inference(sharded, str(tmp_path / "expm"))


def test_gm_fallback_next_to_checkpoint(tmp_path):
    """With no GM fit in result_dir, the engine falls back to
    checkpoint_dir/GM_prior_info.npz — how pretrained_models/ ships the
    accurate fit (mirroring the reference's figures/<exp>/result demo
    artifact), so serve.py --generate works out of the box."""
    cfg = tiny_config(tmp_path)
    model, params = save_trained_like(cfg)
    import shutil
    shutil.move(os.path.join(cfg["result_dir"], "GM_prior_info.npz"),
                os.path.join(cfg["checkpoint_dir"], "GM_prior_info.npz"))
    from ladder_tpu.serving import InferenceEngine
    engine = InferenceEngine(cfg, serve_batch=4)
    imgs = engine.generate(3, seed=0)
    assert imgs.shape == (3, 28, 28, 1) and np.isfinite(imgs).all()


def test_serve_cli_sigterm_drains_gracefully(tmp_path):
    """serve.py --http under SIGTERM (what deploy systems send): the server
    stops accepting, in-flight requests complete, the micro-batch queue
    drains, and the process exits 0 with the drain message — never a dead
    socket for accepted work."""
    import http.client
    import signal
    import socket
    import subprocess
    import sys
    import time

    from tests.conftest import make_config

    cfg = make_config(prior="standard_gaussian")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "/root/repo/serve.py", "--config", str(cfg_path),
         "--http", str(port), "--allow-uninitialized", "--serve-batch", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path))
    try:
        # wait for the ready line (engine warmup compiles the buckets)
        ready = False
        deadline = time.time() + 420
        lines = []
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                break
            lines.append(line)
            if "serving on" in line:
                ready = True
                break
        assert ready, "server never became ready:\n" + "".join(lines)

        buf = io.BytesIO()
        x = np.random.default_rng(0).random((1, 28, 28, 1)).astype(np.float32)
        np.save(buf, x)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/reconstruct", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        out = np.load(io.BytesIO(resp.read()))
        assert out.shape == (1, 28, 28, 1)
        conn.close()

        proc.send_signal(signal.SIGTERM)
        rest, _ = proc.communicate(timeout=120)
        lines.append(rest)
        assert proc.returncode == 0, (proc.returncode, "".join(lines)[-800:])
        assert "drained" in "".join(lines)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)
