#!/bin/bash
# VERDICT r4 item 2: bridge the fused=2 headline to reference semantics on
# the benchmark workload. Runs matched mode-1 (reference-sequential) vs
# mode-2 (single-pass simultaneous-update) CelebA quality experiments at
# the flagship shapes (h=512, z=256, batch 64, the QUALITY_r04_celeba
# 12.8k-image synthetic set), abbreviated to 12 epochs, at 3 seeds each.
# Combine with scripts/mode_parity_combine.py -> MODE_PARITY_r05.json.
set -u
cd /root/repo
OUT=${1:-/tmp/mode_parity}
mkdir -p "$OUT"
for seed in 0 1 2; do
  for fused in 2 1; do
    tag="m${fused}_s${seed}"
    [ -s "$OUT/$tag.json" ] && { echo "== $tag already done"; continue; }
    for attempt in 1 2 3; do
      echo "== $tag attempt $attempt: $(date)"
      timeout 7200 python scripts/quality_baseline.py \
        --config codes/celeba_config.json \
        --out "$OUT/$tag.json" \
        --fused "$fused" --seed "$seed" \
        --epochs 12 --n-train 12800 --fid-samples 512 \
        --workdir "$OUT/work_$tag" \
        --override '{"sg_pretraining": 3, "accurate_fit": 3, "synthetic_n_val": 512}' \
        > "$OUT/$tag.log" 2>&1
      rc=$?
      echo "== $tag attempt $attempt rc=$rc: $(date)"
      [ $rc -eq 0 ] && break
      sleep 30
    done
  done
done
echo "== all done: $(date)"
