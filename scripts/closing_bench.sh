#!/usr/bin/env bash
# Closing-bench policy, round 19: the main-core-count run PLUS an
# automated low-core control on the same code, then the cross-check
# table (scripts/compare_core_counts.py) flagging every query whose
# main-run min exceeds its low-core min — the contamination signature
# that exonerated all 8 of round 18's phantom "regressions", now emitted
# by the artifact instead of re-derived by hand. Bench itself keeps its
# own gates (85% start gate, stall retries, publishable stamp).
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
MAIN=${SPARK_GRAFT_CPUS:-32}
LOW=${SPARK_GRAFT_CPUS_LOW:-8}

echo "== closing bench: main run at local[$MAIN] =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$MAIN" \
  SPARK_GRAFT_BENCH_OUT="$PWD/BENCH_FULL.json" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | tail -1

echo "== closing bench: low-core control at local[$LOW] =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$LOW" \
  SPARK_GRAFT_BENCH_OUT="$PWD/BENCH_FULL_c$LOW.json" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | tail -1

echo "== core-count cross-check =="
python3 scripts/compare_core_counts.py \
  "$PWD/BENCH_FULL.json" "$PWD/BENCH_FULL_c$LOW.json"
