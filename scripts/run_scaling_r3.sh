#!/bin/bash
# Round-3 scaling evidence: engine 8->32 at >=1M rows/round (mirrors=64)
# plus the 2->8 headline pairing, alternating, loadavg logged per run.
OUT=/root/repo/BENCH_RUNS_r3.jsonl
cd /root/repo
run() {
  cores=$1; mirrors=$2; scale=$3
  l0=$(cut -d' ' -f1 /proc/loadavg)
  line=$(python scripts/scaling_worker.py /root/testdata/sf0.1 "$cores" engine "$mirrors" "$scale" 2>/dev/null | tail -1)
  l1=$(cut -d' ' -f1 /proc/loadavg)
  echo "{\"load0\": $l0, \"load1\": $l1, \"run\": $line}" >> "$OUT"
}
# 8->32 at 1M+ rows/round, two alternating pairs
run 8 64 32
run 32 64 32
run 8 64 32
run 32 64 32
# 2->8 headline (web-realistic payloads, same config as BENCH.md r2)
run 2 8 64
run 8 8 64
