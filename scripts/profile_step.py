"""Capture a jax.profiler trace of the production train step and print the
per-HLO-op time breakdown (tensorboard_plugin_profile hlo_stats / op_profile).

Usage: python scripts/profile_step.py [--batch 64] [--steps 8] [--top 40]
Writes the raw trace under /tmp/ladder_profile and prints the top ops.
"""

import argparse
import glob
import json
import os
import shutil


def capture(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils.config import apply_defaults

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
        "dtype": args.dtype, "fused_train_step": args.fused,
        "fused_output_stage": args.fused_output,
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
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (args.batch, 128, 128, 3)).astype(np.uint8))

    for _ in range(3):  # compile + warm
        rng, r = jax.random.split(rng)
        state, out = step(state, batch, r, gm, flags, lrs, True)
    jax.block_until_ready(state)

    logdir = args.logdir
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            rng, r = jax.random.split(rng)
            state, out = step(state, batch, r, gm, flags, lrs, True)
        jax.block_until_ready(state)
    print("trace captured to", logdir)


def report(args):
    """Per-op table parsed straight from the trace.json.gz the profiler
    writes (the tensorboard_plugin_profile converter is broken against the
    installed TF 2.21, so this parses the chrome-trace export directly).
    Aggregates the '/device:TPU:0' 'XLA Ops' lane; each event carries
    bytes_accessed / model_flops in its args for roofline math."""
    import collections
    import gzip

    traces = glob.glob(os.path.join(
        args.logdir, "**", "*.trace.json.gz"), recursive=True)
    assert traces, f"no trace.json.gz under {args.logdir}"
    with gzip.open(max(traces, key=os.path.getmtime)) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    # locate the device pid and its 'XLA Ops' thread
    dev_pid = next((e["pid"] for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in e["args"].get("name", "")), None)
    if dev_pid is None:
        raise SystemExit("trace has no TPU device process — was the "
                         "capture run on CPU? (per-op reporting needs the "
                         "TPU 'XLA Ops' lane)")
    ops_tid = next((e["tid"] for e in ev
                    if e.get("ph") == "M" and e.get("name") == "thread_name"
                    and e["pid"] == dev_pid
                    and e["args"].get("name") == "XLA Ops"), None)
    if ops_tid is None:
        raise SystemExit("no 'XLA Ops' thread in the TPU process — "
                         "unexpected trace layout for this profiler version")
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    extra = {}
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid
                and e.get("tid") == ops_tid):
            durs[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            if e["name"] not in extra:
                a = e.get("args", {})
                extra[e["name"]] = (
                    float(a.get("bytes_accessed", 0) or 0),
                    float(a.get("model_flops", 0) or 0))
    total = sum(durs.values())
    print(f"\ntotal XLA-op time {total / 1e3 / args.steps:.2f} ms/step "
          f"over {args.steps} steps; top {args.top} ops:")
    print(f"{'ms/step':>8} {'x':>4} {'GB/s':>6} {'TF/s':>6}  op")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:args.top]:
        per_call_s = d / cnt[name] / 1e6
        nbytes, flops = extra.get(name, (0.0, 0.0))
        gbs = nbytes / per_call_s / 1e9 if per_call_s else 0.0
        tfs = flops / per_call_s / 1e12 if per_call_s else 0.0
        print(f"{d / 1e3 / args.steps:8.3f} {cnt[name] // args.steps:>4} "
              f"{gbs:6.0f} {tfs:6.1f}  {name[:70]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused", type=int, default=2)
    ap.add_argument("--fused-output", type=int, default=0)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/ladder_profile")
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        capture(args)
    report(args)


if __name__ == "__main__":
    main()
