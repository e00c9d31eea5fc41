"""Streamed-training overlap proof (VERDICT r4 item 5).

BENCH_r04 recorded the streamed rate (TFRecord decode + prefetch-thread
device transfer) and INPUT_BENCH_r04 the host decode headroom — two
separate measurements from which "device-bound on real PCIe" was inferred.
This script composes them: it captures a jax.profiler trace of ACTUAL
streamed training on the real chip and accounts the device-idle time
against transfer starvation at the measured link bandwidth, proving the
pipeline overlaps (wall/step ~= max(transfer, compute) + epsilon) instead
of serialising (transfer + compute).

Writes one JSON record (default STREAM_r05.json):
  wall_step_ms        steady-state wall clock per streamed step
  device_busy_ms      XLA-op time per step from the trace
  device_idle_ms      wall - busy inside the traced window
  transfer_ms         steady-state host->device time per batch, measured
                      by timing a pipelined run of device_puts
  serial_bound_ms     transfer + busy (what a NON-overlapped pipeline
                      would cost per step)
  overlap_bound_ms    max(transfer, busy) (a perfectly overlapped one)
  overlap_efficiency  (serial_bound - wall) / (serial_bound -
                      overlap_bound): 1 = perfect overlap, 0 = serial

Run on the real chip: python scripts/stream_trace.py
(the tunnel's ~27 MB/s makes transfer dominate — which is the POINT: the
idle budget is then large and the overlap measurable.)
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def device_window_and_busy(logdir):
    """(window_ms, busy_ms): the traced TPU 'XLA Ops' lane's span and its
    summed op time (same lane profile_step.py's report aggregates)."""
    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, f"no trace.json.gz under {logdir}"
    with gzip.open(max(traces, key=os.path.getmtime)) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    dev_pid = next(e["pid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in e["args"].get("name", ""))
    ops_tid = next(e["tid"] for e in ev
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and e["pid"] == dev_pid
                   and e["args"].get("name") == "XLA Ops")
    xs = [e for e in ev if e.get("ph") == "X" and e.get("pid") == dev_pid
          and e.get("tid") == ops_tid]
    busy = sum(e["dur"] for e in xs)
    start = min(e["ts"] for e in xs)
    end = max(e["ts"] + e["dur"] for e in xs)
    return (end - start) / 1e3, busy / 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--out", default="STREAM_r05.json")
    ap.add_argument("--logdir", default="/tmp/ladder_stream_trace")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils.config import apply_defaults, \
        enable_compilation_cache

    enable_compilation_cache()

    cfg = apply_defaults({
        "exp_name": "celeba", "prior": "ours", "load_dir": "default",
        "num_epochs": 1, "batch_size": args.batch,
        "dim_input_x": 128, "dim_input_y": 128, "dim_input_channel": 3,
        "code_size": 256, "representation_size": 2,
        "num_hidden_units": args.hidden,
        "num_hidden_units_inner_VAE": 512, "n_layers_inner_VAE": 5,
        "n_mixtures": 50, "n_MC_samples": 100, "sigma": 0.5,
        "learning_rate_ae": 2.5e-4,
        "TRAIN_VAE": 1, "TRAIN_sigma": 1, "TRAIN_prior": 1,
        "TRAIN_inner_sigma": 1, "sg_pretraining": 0,
        "dtype": "bfloat16", "fused_train_step": 2,
    })
    model = make_model(cfg)
    state = init_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    lrs = {k: jnp.asarray(2.5e-4, dtype=jnp.float32)
           for k in ["ae", "sigma", "prior", "inner_sigma"]}
    rng = jax.random.PRNGKey(1)

    n_total = args.steps + args.warmup
    with tempfile.TemporaryDirectory() as td:
        data = CelebAData(dict(cfg, synthetic_data=1,
                               synthetic_n_train=args.batch * n_total,
                               synthetic_n_val=args.batch,
                               synthetic_n_test=args.batch,
                               data_path=td + "/"))

        # -- steady-state transfer cost: pipelined device_puts of real
        # decoded batches (the Prefetcher's own fetch path, minus compute)
        host_batches = [np.asarray(b) for b in
                        data.train.epoch(args.batch, seed=1,
                                         to_device=False, prefetch=False)][:20]
        put = jax.device_put(host_batches[0])
        jax.block_until_ready(put)       # warm the transfer path
        t0 = time.perf_counter()
        puts = [jax.device_put(b) for b in host_batches]
        jax.block_until_ready(puts)
        transfer_ms = (time.perf_counter() - t0) * 1e3 / len(host_batches)
        nbytes = host_batches[0].nbytes
        link_mbs = nbytes / (transfer_ms / 1e3) / 1e6

        # -- streamed training, traced after warmup
        batches = data.train.epoch(args.batch, seed=0, to_device=True)
        it = iter(batches)
        for _ in range(args.warmup):
            state, _ = step(state, next(it), rng, gm, flags, lrs, True)
        jax.block_until_ready(state)

        shutil.rmtree(args.logdir, ignore_errors=True)
        n = 0
        t0 = time.perf_counter()
        with jax.profiler.trace(args.logdir):
            for b in it:
                state, _ = step(state, b, rng, gm, flags, lrs, True)
                n += 1
            jax.block_until_ready(state)
        wall_ms = (time.perf_counter() - t0) * 1e3 / n

    window_ms, busy_total_ms = device_window_and_busy(args.logdir)
    busy_ms = busy_total_ms / n
    idle_ms = max(0.0, window_ms / n - busy_ms)
    serial_bound = transfer_ms + busy_ms
    overlap_bound = max(transfer_ms, busy_ms)
    eff = ((serial_bound - wall_ms) / (serial_bound - overlap_bound)
           if serial_bound > overlap_bound else 1.0)

    rec = {
        "what": ("streamed CelebA-128 training (TFRecord decode + "
                 "prefetch-thread device transfer) traced on the real "
                 "chip; overlap accounting of device idle vs transfer "
                 "starvation"),
        "batch": args.batch,
        "steps": n,
        "batch_mb": round(nbytes / 1e6, 2),
        "wall_step_ms": round(wall_ms, 2),
        "device_busy_ms": round(busy_ms, 2),
        "device_idle_ms": round(idle_ms, 2),
        "transfer_ms": round(transfer_ms, 2),
        "link_mbs": round(link_mbs, 1),
        "serial_bound_ms": round(serial_bound, 2),
        "overlap_bound_ms": round(overlap_bound, 2),
        "overlap_efficiency": round(eff, 3),
        "img_per_s": round(args.batch / wall_ms * 1e3, 1),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
