"""Combine the scripts/mode_parity_celeba.sh sweep into MODE_PARITY_r05.json
(VERDICT r4 item 2): mode-1 (reference-sequential) vs mode-2 (single-pass
simultaneous-update, training/step.py:112-125) CelebA quality at the
flagship shapes, 3 seeds each, with the verdict of whether the mode gap
sits inside the seed-to-seed spread.

Usage: python scripts/mode_parity_combine.py [sweep_dir] [--out FILE]
"""

import argparse
import glob
import json
import os
import re
import sys

KEYS = ("final_val_neg_elbo", "final_train_neg_elbo", "final_val_recons",
        "final_train_recons", "sigma_final", "encoder_fid_generated_vs_test",
        "active_mixtures")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_dir", nargs="?", default="/tmp/mode_parity")
    ap.add_argument("--out", default="MODE_PARITY_r05.json")
    args = ap.parse_args(argv)

    runs = {}
    for path in sorted(glob.glob(os.path.join(args.sweep_dir, "m*_s*.json"))):
        m = re.match(r"m(\d)_s(\d+)\.json", os.path.basename(path))
        with open(path) as f:
            runs[(int(m.group(1)), int(m.group(2)))] = json.load(f)
    modes = sorted({k[0] for k in runs})
    seeds = sorted({k[1] for k in runs})
    assert len(modes) == 2 and len(seeds) >= 3, (
        f"need both modes x >=3 seeds, have {sorted(runs)}")

    summary = {}
    verdicts = {}
    for key in KEYS:
        per_mode = {m: [runs[(m, s)][key] for s in seeds
                        if runs[(m, s)].get(key) is not None]
                    for m in modes}
        if any(not v for v in per_mode.values()):
            continue
        means = {m: sum(v) / len(v) for m, v in per_mode.items()}
        spread = {m: max(v) - min(v) for m, v in per_mode.items()}
        gap = abs(means[1] - means[2])
        max_spread = max(spread.values())
        scale = max(abs(means[1]), abs(means[2]), 1e-9)
        summary[key] = {
            "mode1": {"values": per_mode[1], "mean": means[1],
                      "spread": spread[1]},
            "mode2": {"values": per_mode[2], "mean": means[2],
                      "spread": spread[2]},
            "mode_gap": gap,
            "mode_gap_rel": gap / scale,
            # signed: negative means mode2's mean is LOWER (better for
            # neg-ELBO/recons/FID, where lower = better)
            "mode2_minus_mode1_mean": means[2] - means[1],
            "max_seed_spread": max_spread,
            "gap_within_spread": bool(gap <= max_spread),
        }
        verdicts[key] = summary[key]["gap_within_spread"]

    rec = {
        "what": ("fused_train_step=1 (reference-sequential) vs =2 "
                 "(single-pass simultaneous updates) CelebA quality at "
                 "flagship shapes (h=512, z=256, batch 64), 12-epoch "
                 "abbreviated recipe on the 12.8k-image synthetic set, "
                 "seeds " + ",".join(map(str, seeds))),
        "recipe": {k: runs[(2, seeds[0])]["recipe"][k]
                   for k in runs[(2, seeds[0])]["recipe"]},
        "overrides": runs[(2, seeds[0])].get("overrides"),
        "train_wall_s": {f"mode{m}": [runs[(m, s)]["train_wall_s"]
                                      for s in seeds] for m in modes},
        "metrics": summary,
        "verdict_gap_within_spread": verdicts,
        "all_primary_within_spread": bool(
            verdicts.get("final_val_neg_elbo", False)),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "metrics"},
                     indent=1))
    for key, s in summary.items():
        print(f"{key}: mode1 {s['mode1']['mean']:.4f} (spread "
              f"{s['mode1']['spread']:.4f}) vs mode2 "
              f"{s['mode2']['mean']:.4f} (spread {s['mode2']['spread']:.4f})"
              f" -> gap {s['mode_gap']:.4f} "
              f"{'WITHIN' if s['gap_within_spread'] else 'BEYOND'} spread")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
