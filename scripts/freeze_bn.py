"""Estimate population BN statistics for deterministic CelebA serving.

The CelebA encoder normalises with batch statistics by construction (a
preserved reference parity quirk, /root/reference/codes/models.py:471), so
served outputs depend on the whole compiled batch. This script runs the
"precise BN" recalibration pass (ladder_tpu/serving/bn_freeze.py) over the
training split and writes `bn_stats.npz` next to the checkpoint; serving
then uses fixed statistics:

    python scripts/freeze_bn.py --config codes/celeba_config.json \
        [--batches 32] [--out <checkpoint_dir>/bn_stats.npz]
    python serve.py --config codes/celeba_config.json \
        --bn-stats <checkpoint_dir>/bn_stats.npz --http 8787

Prints one JSON line with the output path and per-layer channel counts.
"""

import argparse
import json
import sys
from itertools import islice

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--batches", type=int, default=32,
                    help="training batches for the recalibration pass")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override config batch_size for the pass")
    ap.add_argument("--out", default=None,
                    help="output npz (default <checkpoint_dir>/bn_stats.npz)")
    args = ap.parse_args(argv)

    from ladder_tpu.utils.config import (
        enable_compilation_cache,
        honor_cpu_platform_request,
        process_config,
    )
    honor_cpu_platform_request()
    enable_compilation_cache()

    import jax

    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.serving.bn_freeze import estimate_bn_stats, save_bn_stats
    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = process_config(args.config)
    if args.checkpoint_dir is not None:
        cfg["checkpoint_dir"] = args.checkpoint_dir
    if args.batch_size is not None:
        cfg["batch_size"] = args.batch_size
    if cfg["exp_name"] != "celeba":
        ap.error("BN freezing applies to CelebA models only")

    model = make_model(cfg)
    state = {"params": model.init(jax.random.PRNGKey(0))}
    state = CheckpointManager(cfg).load(state, "VAE")

    data = CelebAData(cfg)
    batches = islice(
        data.train.epoch(cfg["batch_size"], seed=0, prefetch=False),
        args.batches)
    stats = estimate_bn_stats(cfg, state["params"], batches)

    import os
    out = args.out or os.path.join(cfg["checkpoint_dir"], "bn_stats.npz")
    save_bn_stats(out, stats)
    print(json.dumps({
        "bn_stats": out,
        "layers": {k: int(v["mean"].shape[0]) for k, v in sorted(
            stats.items())},
        "batches": args.batches,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
