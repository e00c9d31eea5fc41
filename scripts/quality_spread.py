"""Calibrate the quality gate from measured seed-to-seed spread
(VERDICT r4 item 7): run a recipe at N seeds, compute the per-metric
relative spread, and write it INTO the committed anchor JSON as

  "seed_spread": {"seeds": [...], "rel": {metric: (max-min)/|mean|},
                  "active_mixtures_band": max(2*abs spread, 3),
                  "records": {seed: {metric: value}}}

so quality_baseline.py --check derives per-metric tolerances
(max(2*spread, 0.5%)) instead of one global rtol guess.

Usage (real TPU):
  python scripts/quality_spread.py --anchor QUALITY_r04.json \
      --config codes/mnist_digit_config.json --seeds 0 1 2
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

SCALE_KEYS = ("final_train_neg_elbo", "final_val_neg_elbo",
              "final_train_recons", "final_val_recons", "sigma_final",
              "encoder_fid_generated_vs_test")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--anchor", required=True,
                    help="committed anchor JSON to annotate in place")
    ap.add_argument("--config", default="codes/mnist_digit_config.json")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra quality_baseline.py args, e.g. --n-train "
                         "12800 --override '{...}'")
    args = ap.parse_args(argv)

    here = os.path.dirname(os.path.abspath(__file__))
    records = {}
    for seed in args.seeds:
        out = os.path.join(tempfile.gettempdir(),
                           f"quality_spread_s{seed}.json")
        cmd = [sys.executable, os.path.join(here, "quality_baseline.py"),
               "--config", args.config, "--out", out,
               "--seed", str(seed)] + args.extra
        print("==", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        with open(out) as f:
            records[seed] = json.load(f)

    rel = {}
    for key in SCALE_KEYS:
        vals = [records[s][key] for s in args.seeds
                if records[s].get(key) is not None]
        if len(vals) < 2:
            continue
        mean = sum(vals) / len(vals)
        rel[key] = (max(vals) - min(vals)) / max(abs(mean), 1e-9)
    am = [records[s]["active_mixtures"] for s in args.seeds
          if records[s].get("active_mixtures") is not None]

    with open(args.anchor) as f:
        anchor = json.load(f)
    anchor["seed_spread"] = {
        "seeds": args.seeds,
        "rel": {k: round(v, 5) for k, v in rel.items()},
        "active_mixtures_band": (max(2 * (max(am) - min(am)), 3)
                                 if am else None),
        "records": {str(s): {k: records[s].get(k)
                             for k in SCALE_KEYS + ("active_mixtures",
                                                    "train_wall_s")}
                    for s in args.seeds},
    }
    with open(args.anchor, "w") as f:
        json.dump(anchor, f, indent=1)
    print(json.dumps(anchor["seed_spread"]["rel"], indent=1))
    print("active_mixtures:", am, "-> band",
          anchor["seed_spread"]["active_mixtures_band"])
    print(f"annotated {args.anchor}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
