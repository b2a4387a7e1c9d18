#!/bin/bash
# Round-4 scaling evidence: the pipelined bulk phase (overlap_convert)
# at the round-3 verdict's evidence shape (mirrors=64, payload_scale=32,
# >=1M-row rounds, 4.5M decisions).
#   1. fixed-cores A/B at 32 cores: sequential (overlap off) vs
#      pipelined — the rounds-phase latency is HIDDEN behind the bulk
#      phase rather than added to it.
#   2. the 8->32 pairing with the pipelined engine, two alternating
#      pairs, loadavg logged per run.
OUT=/root/repo/BENCH_RUNS_r4.jsonl
cd /root/repo
run() {
  cores=$1; mirrors=$2; scale=$3; overlap=$4
  l0=$(cut -d' ' -f1 /proc/loadavg)
  line=$(SPARK_GRAFT_OVERLAP=$overlap python scripts/scaling_worker.py /root/testdata/sf0.1 "$cores" engine "$mirrors" "$scale" 2>/dev/null | tail -1)
  l1=$(cut -d' ' -f1 /proc/loadavg)
  echo "{\"load0\": $l0, \"load1\": $l1, \"overlap\": $overlap, \"run\": $line}" >> "$OUT"
}
# fixed-cores A/B at 32 (sequential baseline first)
run 32 64 32 0
# 8->32 pipelined, two alternating pairs
run 8 64 32 1
run 32 64 32 1
run 8 64 32 1
run 32 64 32 1
