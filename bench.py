"""Benchmark harness: CelebA-128 training throughput (images/sec/chip).

Runs the reference CelebA recipe shape (128x128x3, h=512, z=256, batch from
config or --batch) through the fused 'ours' train step — every optimiser
group, the inner VAE, and the GM cross-entropy MC estimate included — on the
available TPU chip(s), with synthetic on-device data so the input pipeline
does not gate the measurement (pipeline throughput is benchmarked separately
by tests). Prints ONE JSON line with images/sec/chip vs the 5k target
(BASELINE.json).

Usage: python bench.py [--steps N] [--batch B] [--hidden H] [--full-pipeline]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _arm_watchdog(seconds):
    """Fail fast instead of hanging forever when the TPU tunnel is down.

    Device init + first compile over the axon tunnel normally takes
    20-100 s; when the tunnel is unreachable the first jax call blocks
    indefinitely, which would turn the driver's bench run into a silent
    hang. A daemon thread hard-exits (rc 2, one-line error on stderr)
    if the armed phase outlives the deadline, so callers can retry.
    Returns a disarm() callable. LADDER_BENCH_INIT_TIMEOUT overrides the
    deadline (seconds; 0 disables)."""
    import threading

    seconds = float(os.environ.get("LADDER_BENCH_INIT_TIMEOUT", seconds))
    done = threading.Event()
    if seconds <= 0:
        return done.set

    retries = int(os.environ.get("LADDER_BENCH_RETRIES", "3"))

    def bark():
        if done.wait(seconds):
            return
        if retries > 0:
            # a fresh process re-runs backend init from scratch — rides out
            # a transient tunnel outage without the caller having to retry
            print(f"bench: device init/compile exceeded {seconds:.0f}s — "
                  f"restarting ({retries} retries left)", file=sys.stderr)
            sys.stderr.flush()
            env = dict(os.environ, LADDER_BENCH_RETRIES=str(retries - 1))
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        print(f"bench: device init/compile exceeded {seconds:.0f}s — "
              "TPU tunnel down or unreachable; retry "
              "(LADDER_BENCH_INIT_TIMEOUT / LADDER_BENCH_RETRIES override)",
              file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)

    threading.Thread(target=bark, daemon=True, name="bench-watchdog").start()
    return done.set


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--repeats", type=int, default=5,
                    help="timed measurement repeats; the JSON reports the "
                         "median with min/max spread (the tunneled dev chip "
                         "has ~2% run-to-run RPC noise)")
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--code", type=int, default=256)
    ap.add_argument("--full-pipeline", action="store_true",
                    help="stream batches from synthetic TFRecords with host "
                         "prefetch instead of device-resident data")
    ap.add_argument("--streamed-steps", type=int, default=60,
                    help="also measure N streamed (TFRecord+prefetch) steps "
                         "and embed the result as detail.streamed in the "
                         "same JSON line (0 disables)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--steps-per-call", type=int, default=20,
                    help="K>1: run K steps per dispatch via lax.scan "
                         "(amortises host dispatch latency). 600 steps at "
                         "K=20 measures the device's own program rate with "
                         "<0.5%% run-to-run spread on the tunneled chip "
                         "(200 steps at K=10 wanders 3-6%% on bad-RPC days "
                         "because each repeat refills the dispatch pipeline "
                         "and fewer calls amortise the ~40-58 ms/call RPC)")
    ap.add_argument("--pipeline-fill", type=int, default=4,
                    help="K>1 only: untimed calls enqueued before the "
                         "measurement window opens; absorbs the initial "
                         "RPC latency and host enqueue time so the timed "
                         "window measures pure steady-state device rate")
    ap.add_argument("--unroll", type=int, default=2,
                    help="lax.scan unroll factor for the K-step dispatch "
                         "(config['scan_unroll']); N>1 lets XLA overlap "
                         "consecutive steps' schedules (2 measured "
                         "12.44 -> 12.24 ms/step = the op-sum floor)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the [K,B,...] batch stack to the dispatch "
                         "(config['donate_batch_stack']); the master stack "
                         "is copied per call so the loop stays valid")
    ap.add_argument("--fused", type=int, default=2, choices=[1, 2],
                    help="1: reference-sequential fused step, "
                         "2: single-pass (one fwd+bwd for all groups)")
    ap.add_argument("--use-pallas", type=int, default=0,
                    help="1: fused Pallas instnorm+style+leaky kernels in "
                         "the decoder")
    ap.add_argument("--fused-output", type=int, default=0,
                    help="1: fused leaky->Conv_8->loss-sums output stage "
                         "with single-pass backward (ops/pallas_output.py); "
                         "default follows the best measured configuration")
    ap.add_argument("--mesh", type=int, default=0,
                    help="N>0: shard the batch over an N-device data-parallel "
                         "mesh (params replicated; per-chip batch = batch/N)")
    args = ap.parse_args()

    if args.mesh > 0 and args.fused_output:
        # same guard the trainer applies (training/trainer.py): the pallas
        # custom call can't be partitioned by GSPMD — under a mesh XLA
        # would all-gather the 268 MB operand (or fail to shard), so the
        # bench would silently measure gather traffic
        print("fused-output disabled under --mesh (unpartitionable "
              "custom call)", file=sys.stderr)
        args.fused_output = 0

    disarm = _arm_watchdog(600)

    import jax
    import jax.numpy as jnp

    jax.devices()  # blocks here if the tunnel is down
    # device init succeeded — re-arm with a compile-sized deadline: a
    # cold-cache compile of the unroll=2 multi-step program takes ~10 min
    # over the tunnel (server-side compiler), well past the tunnel-down
    # deadline. LADDER_BENCH_INIT_TIMEOUT still overrides both phases.
    disarm()
    disarm = _arm_watchdog(2400)

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils.config import apply_defaults, enable_compilation_cache

    enable_compilation_cache()

    n_chips = len(jax.devices())

    cfg = apply_defaults({
        "exp_name": "celeba",
        "prior": "ours",
        "load_dir": "default",
        "num_epochs": 1,
        "batch_size": args.batch,
        "dim_input_x": 128, "dim_input_y": 128, "dim_input_channel": 3,
        "code_size": args.code,
        "representation_size": 2,
        "num_hidden_units": args.hidden,
        "num_hidden_units_inner_VAE": 512,
        "n_layers_inner_VAE": 5,
        "n_mixtures": 50,
        "n_MC_samples": 100,
        "sigma": 0.5,
        "learning_rate_ae": 2.5e-4,
        "TRAIN_VAE": 1, "TRAIN_sigma": 1, "TRAIN_prior": 1,
        "TRAIN_inner_sigma": 1,
        "sg_pretraining": 0,
        "dtype": args.dtype,
        "scan_unroll": args.unroll,
        "donate_batch_stack": int(args.donate),
        "fused_train_step": args.fused,
        "use_pallas": args.use_pallas,
        "fused_output_stage": args.fused_output,
    })

    model = make_model(cfg)
    state = init_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])

    mesh = None
    if args.mesh > 0:
        from ladder_tpu.parallel.mesh import make_mesh, replicate
        mesh = make_mesh(devices=jax.devices()[:args.mesh])
        state = replicate(state, mesh)
        gm = replicate(gm, mesh)
        n_chips = args.mesh
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    lrs = {k: jnp.asarray(2.5e-4, dtype=jnp.float32)
           for k in ["ae", "sigma", "prior", "inner_sigma"]}

    rng = jax.random.PRNGKey(1)
    batch_host = np.random.default_rng(0).integers(
        0, 256, (args.batch, 128, 128, 3)).astype(np.uint8)

    if args.full_pipeline:
        # device reachable (jax.devices() above returned); dataset synthesis
        # and streaming are host-paced — don't let the watchdog kill them
        disarm()
        import tempfile

        from ladder_tpu.data.celeba import CelebAData
        with tempfile.TemporaryDirectory() as td:
            cfg2 = dict(cfg, synthetic_data=1,
                        synthetic_n_train=args.batch * (args.steps + args.warmup),
                        synthetic_n_val=args.batch, synthetic_n_test=args.batch,
                        data_path=td + "/")
            data = CelebAData(cfg2)
            # device transfer happens inside the prefetch thread so the
            # host->HBM copy of batch k+1 overlaps step k
            batches = data.train.epoch(args.batch, seed=0, to_device=True)
            run_steps(step, state, batches, rng, gm, flags, lrs, args,
                      n_chips, streamed=True)
            return

    if mesh is not None:
        from ladder_tpu.parallel.mesh import shard_batch
        batch = shard_batch(batch_host, mesh)
    else:
        batch = jnp.asarray(batch_host)
    # the step folds its counter into the rng, so one base key serves the
    # whole run — no per-step host split dispatch
    if args.steps_per_call > 1:
        # Steady-state measurement needs a deep dispatch pipeline: on a
        # tunneled dev chip each call carries ~40 ms of RPC round-trip
        # latency that only amortises away once many calls are enqueued
        # ahead of the device (measured: 3 enqueued calls -> 13.7 ms/step,
        # 20 calls -> 12.5 ms/step = the device's own program rate). Local
        # PCIe hardware reaches the device rate at any depth.
        #
        # Timing method: BOTH timestamps come from block_until_ready
        # returns — the completion of the `fill`-th call opens the window,
        # the completion of the last call closes it. Each block return
        # trails the device event by the same constant RPC fetch latency,
        # so the offsets cancel and dt is the device's own steady-state
        # time for n_calls*K steps with the queue never draining. The
        # `fill` prefix absorbs the initial RPC latency + host enqueue
        # time; fill_wait_ms > 0 verifies the opening block actually
        # waited (i.e. the pipeline was still ahead of the host when the
        # window opened — a near-zero wait would mean t0 was stamped late
        # and the fill must be deepened).
        from ladder_tpu.training.step import make_train_multi_step
        multi = make_train_multi_step(model)
        stack = jnp.broadcast_to(batch, (args.steps_per_call,) + batch.shape)
        n_calls = max(1, args.steps // args.steps_per_call)
        args.steps = n_calls * args.steps_per_call
        fill = max(2, args.pipeline_fill)

        def measure(state):
            outs = None
            open_mark = close_mark = None
            for i in range(fill + n_calls):
                # donation invalidates the passed stack; feed a device-side
                # copy each call so the master survives (the copy is ~8 us
                # per step amortised at K=20, inside the timed pipeline)
                s = (stack + 0) if args.donate else stack
                state, outs = multi(state, s, rng, gm, flags, lrs, True)
                if i == fill - 1:
                    open_mark = outs["ae"]["loss_ae"]
            close_mark = outs["ae"]["loss_ae"]
            t_enq = time.perf_counter()
            jax.block_until_ready(open_mark)
            t0 = time.perf_counter()
            jax.block_until_ready(close_mark)
            t1 = time.perf_counter()
            return (state, jax.tree.map(lambda a: a[-1], outs),
                    t1 - t0, t0 - t_enq)

        state, out, _, _ = measure(state)  # compile + warm
        disarm()
    else:
        def measure(state):
            out = None
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, out = step(state, batch, rng, gm, flags, lrs, True)
            jax.block_until_ready(state)
            return state, out, time.perf_counter() - t0, 0.0

        for i in range(args.warmup):  # compile + warm
            state, out = step(state, batch, rng, gm, flags, lrs, True)
        jax.block_until_ready(state)
        disarm()

    # repeated timed runs: the tunnel's RPC jitter makes any single run a
    # lottery draw; report the median with the min/max spread
    rates, step_mss, waits = [], [], []
    for _ in range(max(1, args.repeats)):
        state, out, dt, wait = measure(state)
        rates.append(args.steps * args.batch / dt / n_chips)
        step_mss.append(1000 * dt / args.steps)
        waits.append(1000 * wait)
    per_chip = float(np.median(rates))

    detail = {
        "batch": args.batch, "hidden": args.hidden, "code": args.code,
        "dtype": args.dtype, "fused": args.fused,
        "steps": args.steps, "n_chips": n_chips,
        "repeats": len(rates),
        "median": round(float(np.median(rates)), 1),
        "min": round(float(np.min(rates)), 1),
        "max": round(float(np.max(rates)), 1),
        "step_ms": round(float(np.median(step_mss)), 2),
        "step_ms_min": round(float(np.min(step_mss)), 2),
        "step_ms_max": round(float(np.max(step_mss)), 2),
        "loss_ae": float(out["ae"]["loss_ae"]),
    }
    if args.steps_per_call > 1:
        # fill_wait_ms must be comfortably > 0 in every repeat: it is the
        # time the window-opening block actually waited for the device,
        # proving the dispatch queue was ahead of the host when the timed
        # window opened (see the measure() comment)
        detail["pipeline_fill"] = max(2, args.pipeline_fill)
        detail["fill_wait_ms"] = [round(w, 1) for w in waits]
        if min(waits) < 5.0:
            detail["warning"] = (
                "fill_wait_ms < 5 ms in at least one repeat: the timed "
                "window may have opened late; re-run with a larger "
                "--pipeline-fill")
        # Cross-check the window against the whole-repeat wall clock:
        # (wait + dt) spans enqueue-done -> last completion, i.e. at most
        # the device time for ALL fill+n_calls steps, so the implied
        # whole-run step time is a lower bound on the true per-step time.
        # The window step time can only exceed it (RPC jitter), never
        # undercut it by much — a window markedly FASTER than the whole
        # run means the opening mark's readiness was observed late and
        # the window covered fewer steps than assumed (seen once with
        # --donate: 6.53 ms window vs 12.24 ms whole-run; DESIGN 6f).
        # wall_step_ms also carries the pipeline-fill startup latency
        # (~0.1-0.2 s RPC+enqueue), which only amortises over long runs:
        # at the 600-step default it inflates the bound by <1%, at
        # --steps 40 by ~14%. The 0.8 threshold clears that noise while
        # still catching the donate-class artifact (ratio 0.53).
        total_steps = (fill + n_calls) * args.steps_per_call
        implied = [(w + s * args.steps) / total_steps
                   for w, s in zip(waits, step_mss)]
        detail["wall_step_ms"] = round(float(np.median(implied)), 2)
        if float(np.median(step_mss)) < 0.8 * float(np.median(implied)):
            detail["warning_window"] = (
                "window step time undercuts the whole-run wall-clock "
                "bound by >20%: the timed window opened late and the "
                "reported rate is NOT trustworthy; use wall_step_ms")

    if args.streamed_steps > 0 and mesh is None:
        # second record in the same output: the full-pipeline number
        # (host TFRecord decode + prefetch-thread device transfer). On the
        # tunneled dev chip this measures the ~27 MB/s RPC link, not the
        # device; local PCIe hardware sustains the device-resident rate.
        import tempfile

        from ladder_tpu.data.celeba import CelebAData
        with tempfile.TemporaryDirectory() as td:
            n_streamed = args.streamed_steps + args.warmup
            cfg2 = dict(cfg, synthetic_data=1,
                        synthetic_n_train=args.batch * n_streamed,
                        synthetic_n_val=args.batch,
                        synthetic_n_test=args.batch, data_path=td + "/")
            data = CelebAData(cfg2)
            sargs = argparse.Namespace(**vars(args))
            sargs.steps = args.streamed_steps
            detail["streamed"] = run_steps(
                step, state, data.train.epoch(args.batch, seed=0,
                                              to_device=True),
                rng, gm, flags, lrs, sargs, n_chips, emit=False)

    print(json.dumps({
        "metric": "images/sec/chip (CelebA-128 train)",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / 5000.0, 4),
        "detail": detail,
    }))


def run_steps(step, state, batches, rng, gm, flags, lrs, args, n_chips,
              streamed=False, emit=True):
    import jax
    import jax.numpy as jnp
    import time as _t

    n = 0
    t0 = None
    for i, b in enumerate(batches):
        state, out = step(state, b if isinstance(b, jax.Array)
                          else jnp.asarray(b), rng, gm, flags, lrs, True)
        if i == args.warmup - 1:
            jax.block_until_ready(state)
            t0 = _t.perf_counter()
        elif i >= args.warmup:
            n += 1
    jax.block_until_ready(state)
    dt = _t.perf_counter() - t0
    per_chip = n * args.batch / dt / n_chips
    record = {"batch": args.batch, "steps": n, "n_chips": n_chips,
              "value": round(per_chip, 1),
              "step_ms": round(1000 * dt / max(n, 1), 2),
              "note": "streamed mode is host->device transfer bound on "
                      "the tunneled dev chip (~27 MB/s); real PCIe "
                      "hardware sustains the device-resident rate"}
    if emit:
        print(json.dumps({
            "metric": "images/sec/chip (CelebA-128 train, streamed)",
            "value": round(per_chip, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(per_chip / 5000.0, 4),
            "detail": record,
        }))
    return record


if __name__ == "__main__":
    sys.exit(main())
