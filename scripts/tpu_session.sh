#!/bin/bash
# One-shot TPU measurement session for the fused-kernel work.
#
# Run when the axon tunnel is up.  Produces, in order:
#   /tmp/fused_parity.json - scripts/tpu_parity_fused.py hardware numeric
#                            screen (fused vs XLA, fwd + grad, per victim)
#   /tmp/ab_<victim>.json  - scripts/bench_fused_maxpool.py A/B per victim
#                            (chain ON / gather ON / all OFF arms)
#   /tmp/bench_full.json   - python bench.py (all families, one JSON line)
# Each step is independently resumable; pass step names to run a subset:
#   scripts/tpu_session.sh fused bench
#   scripts/tpu_session.sh ab_ssg ab_curvenet
set -u
set -o pipefail  # the parity screen's exit code must survive the tee
cd "$(dirname "$0")/.."
steps="${*:-fused bench}"

for s in $steps; do
  case "$s" in
    fused)
      # hardware numeric parity FIRST: a Mosaic kernel can compile and
      # run while producing wrong numbers — a failing screen ABORTS the
      # session (round-3 verdict: timing arms measured on a failing
      # screen are not decision data)
      echo "== fused hardware parity ==" >&2
      timeout 5400 python scripts/tpu_parity_fused.py \
        | tee /tmp/fused_parity.json
      rc=$?
      if [ "$rc" -ne 0 ]; then
        echo "PARITY SCREEN FAILED (rc=$rc) — aborting session;" \
             "fix numerics before timing" >&2
        exit "$rc"
      fi
      echo "== fused A/B ==" >&2
      timeout 5400 python scripts/bench_fused_maxpool.py | tee /tmp/fused_ab.json
      ;;
    parity)
      echo "== fused hardware parity ==" >&2
      timeout 5400 python scripts/tpu_parity_fused.py | tee /tmp/fused_parity.json
      ;;
    bench)
      echo "== bench.py ==" >&2
      timeout 3600 python bench.py | tee /tmp/bench_full.json
      ;;
    ab_*)
      v="${s#ab_}"
      echo "== fused A/B ($v) ==" >&2
      timeout 4800 python scripts/bench_fused_maxpool.py --victim "$v" \
        | tee "/tmp/ab_$v.json"
      ;;
    *) echo "unknown step: $s" >&2 ;;
  esac
done
