#!/bin/bash
# Round-5 hardware measurement, stage 1 (policy-independent arms):
#   1. fused/ballq/bf16 hardware numeric parity screen (gates everything)
#   2. in-kernel ball query A/B on SSG/MSG        (verdict task 3)
#   3. CurveNet mm_bwd gather-VJP A/B             (verdict task 2 action)
#   4. CW headline iteration anatomy              (verdict task 8)
# Stage 2 (after FUSED_POLICY defaults are set from these numbers) is
# the full bench.py driver sweep — run separately.
set -u
set -o pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] fused hardware parity ==" >&2
timeout 5400 python scripts/tpu_parity_fused.py | tee /tmp/r5_parity.json
rc=$?
if [ "$rc" -ne 0 ]; then
  echo "PARITY SCREEN FAILED (rc=$rc) — aborting stage 1" >&2
  exit "$rc"
fi

echo "== [2/4] ballq A/B (ssg/msg) ==" >&2
timeout 7200 python scripts/bench_ballq_ab.py | tee /tmp/r5_ballq_ab.json || true

echo "== [3/4] curvenet mm_bwd A/B ==" >&2
timeout 7200 python scripts/bench_mm_gather_ab.py | tee /tmp/r5_mm_ab.json || true

echo "== [4/4] CW anatomy ==" >&2
timeout 5400 python scripts/bench_cw_anatomy.py | tee /tmp/r5_cw_anatomy.json || true

echo "== stage 1 done ==" >&2
