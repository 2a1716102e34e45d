#!/usr/bin/env bash
# End-to-end demo: train a victim on the synthetic dataset, then run
# every attack family against it. Usage: scripts/run_attack_sweep.sh [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-runs/sweep}"
MODEL="${MODEL:-PointNet}"
NP="${NUM_POINTS:-256}"
NC="${NUM_CLASSES:-5}"

if [ ! -d "$OUT/${MODEL}_model_on_synthetic" ]; then
  python -m pointcloudattack_tpu.cli train --dataset synthetic \
    --model "$MODEL" --num_points "$NP" --num_classes "$NC" \
    --epochs 30 --batch_size 16 --output_dir "$OUT"
fi

CKPT="$OUT/${MODEL}_model_on_synthetic"
# non-fatal: a transient tunnel error here shouldn't kill the sweep
python -m pointcloudattack_tpu.cli test --dataset synthetic \
  --model "$MODEL" --num_points "$NP" --num_classes "$NC" \
  --checkpoint "$CKPT" || echo "test step failed (non-fatal)"

for FAMILY in cw perturb cw-robust knn geoa3 geoa3-partial aof cta siadv \
              simba simbapp si-query add-points add-clusters iso; do
  echo "=== $FAMILY ==="
  # query attacks keep their reference default budgets (one basis pass /
  # full sensitivity sweep) — a 100-iter cap would starve them
  case "$FAMILY" in
    simba|simbapp|si-query) ITERS=0 ;;
    *) ITERS=100 ;;
  esac
  python -m pointcloudattack_tpu.cli attack "$FAMILY" \
    --dataset synthetic --model "$MODEL" --num_points "$NP" \
    --num_classes "$NC" --checkpoint "$CKPT" --output_dir "$OUT" \
    --binary_step 2 --num_iter "$ITERS" --kappa 0 --budget 0.45 \
    --num_samples 8 || echo "$FAMILY failed"
done

# targeted spectral family (TAOF requires a target class)
echo "=== taof ==="
python -m pointcloudattack_tpu.cli attack taof \
  --dataset synthetic --model "$MODEL" --num_points "$NP" \
  --num_classes "$NC" --checkpoint "$CKPT" --output_dir "$OUT" \
  --attack_method target --binary_step 2 --num_iter 100 --kappa 0 \
  --budget 0.45 --num_samples 8 || echo "taof failed"
echo "summaries in $OUT/attack_*_summary.json"
