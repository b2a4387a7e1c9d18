#!/bin/bash
# Round-5 scaling-evidence campaign. Every run is a fresh JVM; one JSON
# line per run appended to BENCH_RUNS_r5.jsonl (the evidence file BENCH.md
# cites — round-4 verdict #4 asked that every table row resolve to a line
# here). Phases:
#   1. driver-contract flagship reps (sf0.1, 32 cores, convert OFF)
#   2. convert-off engine isolation at mirrors=64 (8 vs 32 cores)
#   3. the 4-config AQE sweep at 32 cores (re-run of round-4 Finding 1)
#   4. convert-ON engine 8/32 alternating pairing (north-rule evidence)
set -u
cd /root/repo
OUT=BENCH_RUNS_r5.jsonl
SF=/root/testdata/sf0.1
START=${1:-1}   # first phase to run (resume support)

run_flag() { # label
  SPARK_GRAFT_LABEL="$1" python scripts/flagship_once.py "$SF" 32 "$1" 2>/dev/null >> "$OUT"
}
run_sc() { # label cores mirrors extra-env...
  local label="$1" cores="$2" mirrors="$3"; shift 3
  env "$@" SPARK_GRAFT_LABEL="$label" \
    python scripts/scaling_worker.py "$SF" "$cores" engine "$mirrors" 32 2>/dev/null >> "$OUT"
}

if [ "$START" -le 1 ]; then
echo "== phase 1: flagship reps" >&2
run_flag flagship-r5-rep1
run_flag flagship-r5-rep2
fi

if [ "$START" -le 2 ]; then
echo "== phase 2: convert-off isolation m64" >&2
run_sc conv-off-32 32 64 SPARK_GRAFT_CONVERT=0
run_sc conv-off-8   8 64 SPARK_GRAFT_CONVERT=0
fi

if [ "$START" -le 3 ]; then
echo "== phase 3: AQE 4-config sweep, 32 cores, convert-off m64" >&2
# (a) width-maximizing default (parallelismFirst=true) — overrides the
#     sizing conf scaling_worker applies at mirrors>=8
run_sc sweep-parallelismFirst 32 64 SPARK_GRAFT_CONVERT=0 \
  SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=true;spark.sql.adaptive.advisoryPartitionSizeInBytes=1m"
# (b) wide static shuffle
run_sc sweep-shuffle96 32 64 SPARK_GRAFT_CONVERT=0 SPARK_GRAFT_SHUFFLE=96 \
  SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=true;spark.sql.adaptive.advisoryPartitionSizeInBytes=1m"
# (c) narrow static shuffle
run_sc sweep-shuffle8 32 64 SPARK_GRAFT_CONVERT=0 SPARK_GRAFT_SHUFFLE=8 \
  SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=true;spark.sql.adaptive.advisoryPartitionSizeInBytes=1m"
# (d) sizing-based coalescing (the scaling-path default)
run_sc sweep-sizing 32 64 SPARK_GRAFT_CONVERT=0

fi

if [ "$START" -le 4 ]; then
echo "== phase 4: convert-ON pairing, alternating 8/32" >&2
run_sc pair-8-rep1  8 64
run_sc pair-32-rep1 32 64
run_sc pair-8-rep2  8 64
run_sc pair-32-rep2 32 64

fi

if [ "$START" -le 5 ]; then
echo "== phase 5: 2->8 pairing at HEAD, web-realistic payloads" >&2
# Round-3's headline north-rule config (mirrors=8, payload_scale=64,
# convert ON) re-run on the round-5 engine: the 0.805 standing evidence
# predates the base+delta seen set, adaptive round width and FAIR-scoped
# pools, so the 2->8 criterion needs a fresh measurement at HEAD.
run_sc64() { # label cores
  env SPARK_GRAFT_LABEL="$1" \
    python scripts/scaling_worker.py "$SF" "$2" engine 8 64 2>/dev/null >> "$OUT"
}
run_sc64 pair2-2-rep1 2
run_sc64 pair2-8-rep1 8
run_sc64 pair2-2-rep2 2
run_sc64 pair2-8-rep2 8

fi

echo "== campaign done" >&2
