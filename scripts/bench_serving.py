"""Inference (serving) throughput benchmark at the CelebA-128 shapes.

Measures the InferenceEngine's steady-state reconstruct / decode / generate
rates on the available device — the serving-side companion to bench.py's
training number. Checkpoints are optional (CheckpointManager soft-fails to
random init, same as the reference's restore behaviour, base.py:68-85), so
the measurement runs anywhere.

Usage: python scripts/bench_serving.py [--batch 64] [--iters 50]
       [--dtype bfloat16] [--config codes/celeba_config.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def rate(fn, x, iters, warmup=3):
    """End-to-end rate: includes host<->device transfer of inputs/outputs
    (on a tunneled dev chip this is link-bandwidth-bound; see device_rate)."""
    for _ in range(warmup):
        out = fn(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    del out
    dt = time.perf_counter() - t0
    return iters * x.shape[0] / dt


def device_rate(jitted, params, x, iters, warmup=3):
    """Compute-path rate: outputs stay on device, calls pipeline — the rate
    local PCIe hardware sustains end-to-end."""
    import jax
    import jax.numpy as jnp

    xd = jnp.asarray(x)
    out = None
    for _ in range(warmup):
        out = jitted(params, xd)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(params, xd)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return iters * x.shape[0] / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="codes/celeba_config.json")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--mesh", type=int, default=0)
    ap.add_argument("--bn-stats", default=None,
                    help="bn_stats.npz (scripts/freeze_bn.py): bench "
                         "the frozen-BN per-row-deterministic mode")
    args = ap.parse_args()

    from ladder_tpu.serving import InferenceEngine
    from ladder_tpu.utils.config import (
        enable_compilation_cache,
        process_config,
    )

    enable_compilation_cache()
    cfg = process_config(args.config)
    engine = InferenceEngine(cfg, serve_batch=args.batch, dtype=args.dtype,
                             mesh_devices=args.mesh,
                             allow_uninitialized=True,
                             bn_stats_path=args.bn_stats)
    cfgd = engine.config
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (args.batch, cfgd["dim_input_x"],
                              cfgd["dim_input_y"],
                              cfgd["dim_input_channel"])).astype(np.uint8)
    z = rng.standard_normal((args.batch, cfgd["code_size"])).astype(
        np.float32)

    results = {
        "reconstruct_img_s": round(rate(engine.reconstruct, x, args.iters), 1),
        "decode_img_s": round(rate(engine.decode, z, args.iters), 1),
        "encode_img_s": round(rate(engine.encode, x, args.iters), 1),
        "reconstruct_device_img_s": round(device_rate(
            engine._reconstruct, engine.params, x, args.iters * 2), 1),
        "decode_device_img_s": round(device_rate(
            engine._decode, engine.params, z, args.iters * 2), 1),
        "encode_device_img_s": round(device_rate(
            engine._encode, engine.params, x, args.iters * 2), 1),
    }
    if engine.gm is not None:
        engine.generate(1)  # compile the generate program before timing
        t0 = time.perf_counter()
        engine.generate(args.batch * 10, seed=0)
        results["generate_img_s"] = round(
            args.batch * 10 / (time.perf_counter() - t0), 1)

    # per-bucket request latency: a 1-image request dispatches to the
    # smallest compiled bucket and must measure ~bucket-1 latency, not
    # serve_batch compute (engine latency tiers)
    engine.warmup()
    bucket_latency_ms = {}
    for b in engine.buckets:
        xb = x[:b] if b <= x.shape[0] else np.repeat(
            x, -(-b // x.shape[0]), axis=0)[:b]
        for _ in range(3):
            engine.reconstruct(xb)
        t0 = time.perf_counter()
        for _ in range(max(5, args.iters // 5)):
            engine.reconstruct(xb)
        n = max(5, args.iters // 5)
        bucket_latency_ms[f"reconstruct@b{b}"] = round(
            1000 * (time.perf_counter() - t0) / n, 2)
    results["bucket_latency_ms"] = bucket_latency_ms

    # micro-batching under concurrency: many threads each sending 1-image
    # reconstructs (the HTTP serving shape). The Batcher coalesces them
    # into shared device batches; 'direct' dispatches one bucket-1 call
    # per request.
    import threading

    from ladder_tpu.serving.batcher import Batcher

    def concurrent_rate(target, n_threads=16, reqs_per_thread=8):
        x1 = x[:1]
        barrier = threading.Barrier(n_threads + 1)
        def worker():
            barrier.wait()
            for _ in range(reqs_per_thread):
                target.reconstruct(x1)
        threads = [threading.Thread(target=worker)
                   for _ in range(n_threads)]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        return n_threads * reqs_per_thread / (time.perf_counter() - t0)

    engine.reconstruct(x[:1])  # ensure bucket-1 compiled before timing
    direct_rps = concurrent_rate(engine)
    batcher = Batcher(engine, max_wait_ms=2.0)
    batcher.reconstruct(x[:1])
    batched_rps = concurrent_rate(batcher)
    results["concurrent_1img_req_s"] = {
        "direct": round(direct_rps, 1),
        "micro_batched": round(batched_rps, 1),
        "batches": batcher.stats["batches"],
        "requests": batcher.stats["requests"],
    }
    batcher.close()

    print(json.dumps({"metric": "serving throughput (CelebA-128)",
                      "batch": args.batch, "dtype": args.dtype,
                      "buckets": engine.buckets,
                      **results}))


if __name__ == "__main__":
    main()
