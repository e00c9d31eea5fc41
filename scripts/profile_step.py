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
    xplanes = glob.glob(os.path.join(
        args.logdir, "**", "*.xplane.pb"), recursive=True)
    assert xplanes, f"no xplane.pb under {args.logdir}"
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # hlo_stats returns a JSON table: {"data": [...]} or list-of-lists; handle
    # the gviz-style format the plugin emits.
    print(type(rows))
    if isinstance(rows, dict):
        print(json.dumps(rows)[:2000])
        return
    print(str(rows)[:2000])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fused", type=int, default=2)
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
