"""GMM-component sweep: train the same recipe across a list of n_mixtures
values and report final validation metrics (BASELINE.json scaled-config
study: "larger batch + GMM-component sweep").

Usage:
    python scripts/sweep_gmm.py --config codes/mnist_digit_config.json \
        --mixtures 10 25 50 100 [--epochs 5] [--synthetic]

Each arm trains in its own experiment directory
(suffix `-sweepK{n}`), so runs are resumable and artifacts don't collide.
Prints one summary table and a JSON line for machine consumption.
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--mixtures", type=int, nargs="+",
                    default=[10, 25, 50, 100])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--dtype", default=None)
    args = ap.parse_args()

    from ladder_tpu.utils.config import create_dirs, process_config

    base = process_config(args.config)
    if args.epochs:
        base["num_epochs"] = args.epochs
    if args.synthetic:
        base["synthetic_data"] = 1
    if args.dtype:
        base["dtype"] = args.dtype
    base["enable_plots"] = 0
    base["load_model"] = 0

    results = []
    for k in args.mixtures:
        cfg = copy.deepcopy(base)
        cfg["n_mixtures"] = k
        for key in ("summary_dir", "result_dir", "checkpoint_dir"):
            cfg[key] = cfg[key].rstrip("/") + f"-sweepK{k}/"
        create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])

        from ladder_tpu.models.builder import make_model

        model = make_model(cfg)
        if cfg["exp_name"] == "celeba":
            from ladder_tpu.data.celeba import CelebAData
            from ladder_tpu.training.celeba_trainer import CelebATrainer
            trainer = CelebATrainer(model, CelebAData(cfg), cfg)
        else:
            from ladder_tpu.data.mnist import DataGenerator
            from ladder_tpu.training.trainer import MNISTTrainer
            trainer = MNISTTrainer(model, DataGenerator(cfg), cfg)
        trainer.train()

        rec = trainer.metrics
        active = None
        if trainer.gm_fast is not None:
            import numpy as np
            active = int((np.asarray(trainer.gm_fast[0]) >= 1e-2).sum())
        results.append(dict(
            n_mixtures=k,
            final_val_loss=(rec.val_loss_ave_epoch[-1]
                            if rec.val_loss_ave_epoch else None),
            final_val_elbo=(rec.elbo_val[-1] if rec.elbo_val else None),
            active_mixtures=active,
        ))
        print(f"[sweep] K={k}: {results[-1]}")

    print("\nn_mixtures | final val loss | final val ELBO | active")
    for r in results:
        print(f"{r['n_mixtures']:10d} | {r['final_val_loss']!s:>14} | "
              f"{r['final_val_elbo']!s:>14} | {r['active_mixtures']}")
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
