#!/bin/bash
# One-command two-sided pipeline validation (round-5 verdict task 1):
#   1. synthesize a BosphorusDB-format dataset (.bnt class dirs)
#   2. reference pipeline: get_dataset_csv.py -> train.py -> test.py ->
#      attack/CW/Eval_CW.py   (torch CPU, shims in pipeline_parity.py)
#   3. our pipeline: cli train -> test -> attack cw on the SAME split
#      csvs and the SAME attack subset
#   4. compare -> scripts/results_pipeline_parity.json
#   5. exercise scripts/real_data_pipeline.sh for real on a second copy
#      of the dataset (its own `cli make-splits` path)
#   6. attempt a ModelNet40 fetch; record open/closed in the artifact
#
# The two sides MUST run sequentially: the reference Eval_CW step swaps
# the hard-coded eval.csv for the attack subset and restores it after.
#
# Usage: scripts/run_pipeline_parity.sh [WORKDIR] (default: mktemp -d)
set -eu
cd "$(dirname "$0")/.."

ROOT="${1:-$(mktemp -d)}"
EPOCHS="${EPOCHS:-15}"
OUT=scripts/results_pipeline_parity.json
mkdir -p "$ROOT"

echo "== gen ($ROOT) ==" >&2
python scripts/pipeline_parity.py gen --root "$ROOT"

echo "== reference pipeline ==" >&2
python scripts/pipeline_parity.py ref --root "$ROOT" \
  --epochs "$EPOCHS" --out "$ROOT/ref_results.json" >&2

echo "== our pipeline ==" >&2
python scripts/pipeline_parity.py ours --root "$ROOT" \
  --epochs "$EPOCHS" --out "$ROOT/ours_results.json" >&2

echo "== real_data_pipeline.sh (our make-splits path, 2nd copy) ==" >&2
cp -r "$ROOT/BosphorusDB" "$ROOT/BosphorusDB_script"
rm -f "$ROOT"/BosphorusDB_script/*.csv
if EPOCHS="$EPOCHS" NUM_POINTS=4000 BATCH=10 \
   OUT="$ROOT/script_run" PLATFORM=cpu \
   ATTACK_ARGS="--binary_step 2 --num_iter 128 --kappa 0 --budget 0.45" \
   scripts/real_data_pipeline.sh "$ROOT/BosphorusDB_script" \
     Bosphorus PointNet cw > "$ROOT/script_run.log" 2>&1; then
  SCRIPT_OK=true
else
  SCRIPT_OK=false
fi
echo "real_data_pipeline.sh ok=$SCRIPT_OK (log: $ROOT/script_run.log)" >&2

echo "== ModelNet40 fetch attempt ==" >&2
FETCH="closed"
if timeout 60 python -c "
import urllib.request
urllib.request.urlopen(
  'https://modelnet.cs.princeton.edu/ModelNet40.zip', timeout=30)
" 2>/dev/null; then FETCH="open"; fi
echo "network: $FETCH" >&2

python scripts/pipeline_parity.py compare \
  --ref "$ROOT/ref_results.json" --ours "$ROOT/ours_results.json" \
  --out "$OUT.tmp"
python - "$OUT.tmp" "$OUT" "$SCRIPT_OK" "$FETCH" <<'EOF'
import json, sys
art = json.load(open(sys.argv[1]))
art["real_data_pipeline_sh"] = {
    "exercised": True, "ok": sys.argv[3] == "true",
    "note": "synthetic BosphorusDB copy through the script's own "
            "make-splits -> train -> test -> attack cw path",
}
art["modelnet40_fetch"] = sys.argv[4]
json.dump(art, open(sys.argv[2], "w"), indent=1)
print(json.dumps({k: art[k] for k in ("checks", "all_pass",
      "real_data_pipeline_sh", "modelnet40_fetch")}, indent=1))
EOF
rm -f "$OUT.tmp"
echo "artifact: $OUT" >&2
