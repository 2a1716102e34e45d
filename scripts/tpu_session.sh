#!/bin/bash
# One-shot TPU measurement session for the round-3 fused-kernel work.
#
# Run when the axon tunnel is up.  Produces, in order:
#   /tmp/fused_parity.json - scripts/tpu_parity_fused.py hardware numeric
#                            screen (fused vs XLA, fwd + grad, per victim)
#   /tmp/fused_ab.json   - scripts/bench_fused_maxpool.py A/B (CW headline,
#                          fused chain+pool ON vs OFF, f32 + bf16)
#   /tmp/bench_full.json - python bench.py (all families, one JSON line)
# Each step is independently resumable; pass step names to run a subset:
#   scripts/tpu_session.sh fused bench
set -u
cd "$(dirname "$0")/.."
steps="${*:-fused bench}"

for s in $steps; do
  case "$s" in
    fused)
      # hardware numeric parity FIRST: a Mosaic kernel can compile and
      # run while producing wrong numbers — screen before timing
      echo "== fused hardware parity ==" >&2
      timeout 5400 python scripts/tpu_parity_fused.py \
        | tee /tmp/fused_parity.json \
        || echo "PARITY FAILED — treat A/B below as suspect" >&2
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
    ab_ssg)
      echo "== fused A/B (ssg) ==" >&2
      timeout 4800 python scripts/bench_fused_maxpool.py --victim ssg \
        | tee /tmp/fused_ab_ssg.json
      ;;
    ab_dgcnn)
      echo "== fused A/B (dgcnn) ==" >&2
      timeout 4800 python scripts/bench_fused_maxpool.py --victim dgcnn \
        | tee /tmp/fused_ab_dgcnn.json
      ;;
    *) echo "unknown step: $s" >&2 ;;
  esac
done
