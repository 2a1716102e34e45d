#!/bin/bash
# End-to-end real-data pipeline: split -> train -> test -> attack ->
# report, mirroring the reference flow (get_dataset_csv.py:21-96 ->
# train.py -> test.py -> attack/*/Eval_*.py).  One command reproduces
# the reference pipeline given a dataset path; without one it prints
# what to mount and exits 0 (no real datasets ship in this image —
# see README "Real-data validation status").
#
# Usage:
#   scripts/real_data_pipeline.sh [DATA_ROOT] [DATASET] [MODEL] [FAMILY]
#     DATA_ROOT  dataset root (default ~/BosphorusDB, the reference's
#                layout: class dirs of .bnt scans — get_dataset_csv.py:8)
#     DATASET    Bosphorus | Eurecom | ModelNet | ShapeNet  (default
#                Bosphorus; ModelNet/ShapeNet roots use the official
#                OFF/PLY layouts, no csv step needed)
#     MODEL      victim architecture        (default PointNet)
#     FAMILY     attack family for the demo (default cw)
#   Extra knobs via env: EPOCHS (default 150, reference train.py:33),
#   NUM_POINTS (default 4096 for face data, reference train.py:36),
#   BATCH (default 32), OUT (default runs/real_<dataset>),
#   PLATFORM (cpu|tpu, default: jax default), ATTACK_ARGS (extra flags
#   for the attack step, e.g. "--binary_step 2 --num_iter 100").
#
# ShapeNet part benchmark download (reference scripts/download.sh):
#   wget https://shapenet.cs.stanford.edu/ericyi/shapenetcore_partanno_segmentation_benchmark_v0.zip
# Bosphorus/EURECOM are license-gated face datasets — request access
# from the providers; this script only needs the extracted root.
set -eu
cd "$(dirname "$0")/.."

DATA_ROOT="${1:-$HOME/BosphorusDB}"
DATASET="${2:-Bosphorus}"
MODEL="${3:-PointNet}"
FAMILY="${4:-cw}"
EPOCHS="${EPOCHS:-150}"
NUM_POINTS="${NUM_POINTS:-4096}"
BATCH="${BATCH:-32}"
OUT="${OUT:-runs/real_$(echo "$DATASET" | tr 'A-Z' 'a-z')}"
CLI="python -m pointcloudattack_tpu.cli.main"
PLATFORM_ARGS=""
[ -n "${PLATFORM:-}" ] && PLATFORM_ARGS="--platform $PLATFORM"
ATTACK_ARGS="${ATTACK_ARGS:-}"

if [ ! -d "$DATA_ROOT" ]; then
  cat >&2 <<EOF
dataset root not found: $DATA_ROOT
Nothing to do — mount the data and re-run.  Expected layouts:
  Bosphorus: class dirs (bs000, bs001, ...) of .bnt scans
  Eurecom:   class dirs of .txt/.pts clouds
  ModelNet:  modelnet40_shape_names.txt + class dirs of .off meshes
  ShapeNet:  synsetoffset2category.txt + synset dirs of .pts clouds
             (reference scripts/download.sh URL in the header above)
Until real data is mounted, ASR parity vs reference-trained
checkpoints stays validated on synthetic clouds + ported-weight
forward parity only (README "Real-data validation status").
EOF
  exit 0
fi

mkdir -p "$OUT"
TRAIN_PATH="$DATA_ROOT"
TEST_PATH="$DATA_ROOT"

case "$DATASET" in
  Bosphorus|Eurecom)
    # reference get_dataset_csv.py: 70/30 train/eval csv split over the
    # class dirs (class-105 probe injection is a separate, attack-time
    # concern — data/csvsplit.py::inject_adversarial_rows)
    ext=".bnt"; [ "$DATASET" = Eurecom ] && ext=".txt"
    echo "== make-splits ($DATA_ROOT, ext $ext) ==" >&2
    $CLI make-splits $PLATFORM_ARGS --data_root "$DATA_ROOT" --ext "$ext" --seed 0
    TRAIN_PATH="$DATA_ROOT/train.csv"
    TEST_PATH="$DATA_ROOT/eval.csv"
    ;;
  ModelNet|ShapeNet)
    NUM_POINTS="${NUM_POINTS_OVERRIDE:-1024}"
    ;;
  *) echo "unknown dataset: $DATASET" >&2; exit 2 ;;
esac

echo "== train ($MODEL on $DATASET, $EPOCHS epochs) ==" >&2
$CLI train $PLATFORM_ARGS \
  --dataset "$DATASET" --dataset_path "$TRAIN_PATH" \
  --eval_dataset_path "$TEST_PATH" \
  --model "$MODEL" --num_points "$NUM_POINTS" --batch_size "$BATCH" \
  --epochs "$EPOCHS" --output_dir "$OUT"

CKPT="$OUT/${MODEL}_model_on_${DATASET}"
echo "== test (held-out accuracy) ==" >&2
$CLI test $PLATFORM_ARGS \
  --dataset "$DATASET" --dataset_path "$TEST_PATH" \
  --model "$MODEL" --num_points "$NUM_POINTS" --batch_size "$BATCH" \
  --checkpoint "$CKPT" --output_dir "$OUT"

echo "== attack ($FAMILY sweep over the eval split) ==" >&2
$CLI attack "$FAMILY" $PLATFORM_ARGS \
  --dataset "$DATASET" --dataset_path "$TEST_PATH" \
  --model "$MODEL" --num_points "$NUM_POINTS" --batch_size "$BATCH" \
  --checkpoint "$CKPT" --output_dir "$OUT" \
  --attack_batch "$BATCH" --resume $ATTACK_ARGS

echo "== report ==" >&2
echo "artifacts in $OUT/ (checkpoint, attack_chunks/*.npz, metrics)."
echo "Compare ASR/dist against the reference's Eval_${FAMILY^^}.py on"
echo "the same split to close the real-data parity gap (README"
echo '"Real-data validation status").'
