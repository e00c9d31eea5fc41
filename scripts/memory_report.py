"""Compiled-program memory report: what the train step costs in HBM.

Lowers the fused train step (or the K-step dispatch) for a given config
and prints XLA's own CompiledMemoryStats — temp (activation workspace),
argument, output and generated-code bytes — together with the train-state
breakdown (params / Adam m / Adam v). Under a mesh the compiled program is
the GSPMD-partitioned per-device executable, so the numbers are per-device:
this is the tool that shows tensor parallelism's memory win (`--mesh 4,2`
vs `--mesh 8`) and what `jax.checkpoint`-style remat would be trading
against.

Complements the per-op time profile (scripts/profile_step.py) on the
memory axis (SURVEY.md §5 profiling subsystem). Works on any backend:
CPU for layout questions, TPU for real HBM numbers.

Usage:
  python scripts/memory_report.py --config codes/celeba_config.json
  python scripts/memory_report.py --mesh 4,2 --steps-per-call 10
Prints ONE JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype"))


def main(argv=None):
    ap = argparse.ArgumentParser(description="train-step memory report")
    ap.add_argument("--config", default="codes/celeba_config.json")
    ap.add_argument("--batch", type=int, default=None,
                    help="override config batch_size")
    ap.add_argument("--fused", type=int, default=None, choices=[1, 2])
    ap.add_argument("--dtype", default=None,
                    help="override config compute dtype (e.g. bfloat16)")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="K>1 analyses the K-step scan dispatch instead")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--mesh", default=None,
                    help="'N' for an N-device data mesh, 'D,M' for the "
                         "2-D tensor-parallel mesh (parallel/tp.py)")
    args = ap.parse_args(argv)

    from ladder_tpu.utils.config import honor_cpu_platform_request
    honor_cpu_platform_request()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladder_tpu.models.builder import PRIORS_WITH_GM, make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import (
        init_state, make_train_multi_step, make_train_step)
    from ladder_tpu.utils.config import process_config

    cfg = process_config(args.config)
    if args.batch is not None:
        cfg["batch_size"] = args.batch
    if args.fused is not None:
        cfg["fused_train_step"] = args.fused
    if args.dtype is not None:
        cfg["dtype"] = args.dtype
    cfg["steps_per_call"] = args.steps_per_call
    cfg["scan_unroll"] = args.unroll

    model = make_model(cfg)
    state = init_state(model, jax.random.PRNGKey(0))

    b = cfg["batch_size"]
    if cfg["exp_name"] == "celeba":
        batch = np.zeros((b, cfg["dim_input_x"], cfg["dim_input_y"], 3),
                         np.uint8)  # uint8-to-HBM input path
    else:
        batch = np.zeros((b, cfg["dim_input_x"], cfg["dim_input_y"], 1),
                         np.float32)

    prior = cfg["prior"]
    if prior in PRIORS_WITH_GM:
        d = (cfg["representation_size"] if prior == "ours"
             else cfg["code_size"])
        gm = identity_gm(cfg["n_mixtures"], d)
    else:
        gm = None
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    lrs = {k: jnp.asarray(2.5e-4, jnp.float32)
           for k in ["ae", "sigma", "prior", "inner_sigma"]}
    rng = jax.random.PRNGKey(1)

    mesh = None
    if args.mesh:
        from ladder_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch, shard_state)
        shape = [int(x) for x in args.mesh.split(",")]
        mesh = make_mesh({"mesh_shape": shape})
        state = shard_state(state, mesh)
        gm = replicate(gm, mesh) if gm is not None else None
        batch = shard_batch(batch, mesh)
    else:
        batch = jnp.asarray(batch)

    from ladder_tpu.models.builder import PRIORS_WITH_PRIOR_MODEL
    do_prior = prior in PRIORS_WITH_PRIOR_MODEL
    if args.steps_per_call > 1:
        step = make_train_multi_step(model)
        k = args.steps_per_call
        stack = jnp.stack([batch] * k)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            stack = jax.device_put(
                stack, NamedSharding(mesh, P(None, mesh.axis_names[0])))
        lowered = step.lower(state, stack, rng, gm, flags, lrs, do_prior)
    else:
        step = make_train_step(model)
        lowered = step.lower(state, batch, rng, gm, flags, lrs, do_prior)
    ma = lowered.compile().memory_analysis()

    mb = 1e6
    out = {
        "config": args.config,
        "exp_name": cfg["exp_name"],
        "prior": prior,
        "batch_size": b,
        "dtype": cfg["dtype"],
        "fused_train_step": cfg["fused_train_step"],
        "steps_per_call": args.steps_per_call,
        "mesh": args.mesh,
        "backend": jax.default_backend(),
        "n_devices": 1 if mesh is None else mesh.devices.size,
        # logical (unsharded) state sizes from the pytree
        "state_mb": {
            "params": round(_tree_bytes(state["params"]) / mb, 2),
            "adam_m": round(_tree_bytes(
                {g: s["m"] for g, s in state["opt"].items()}) / mb, 2),
            "adam_v": round(_tree_bytes(
                {g: s["v"] for g, s in state["opt"].items()}) / mb, 2),
        },
        "batch_mb": round(np.asarray(batch).nbytes / mb
                          if mesh is None else
                          int(np.prod(batch.shape)) *
                          batch.dtype.itemsize / mb, 2),
        # XLA's per-device compiled accounting (GSPMD-partitioned when
        # a mesh is given)
        "compiled_per_device_mb": {
            "arguments": round(ma.argument_size_in_bytes / mb, 2),
            "outputs": round(ma.output_size_in_bytes / mb, 2),
            "temps": round(ma.temp_size_in_bytes / mb, 2),
            "aliased": round(ma.alias_size_in_bytes / mb, 2),
            "generated_code": round(ma.generated_code_size_in_bytes / mb, 2),
        },
    }
    c = out["compiled_per_device_mb"]
    # donation aliases state buffers (arguments ∩ outputs); peak live ≈
    # arguments + outputs − aliased + temps
    out["peak_estimate_mb"] = round(
        c["arguments"] + c["outputs"] - c["aliased"] + c["temps"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
