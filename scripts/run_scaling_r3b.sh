#!/bin/bash
OUT=/root/repo/BENCH_RUNS_r3.jsonl
cd /root/repo
run() {
  cores=$1; mirrors=$2; scale=$3
  l0=$(cut -d' ' -f1 /proc/loadavg)
  line=$(python scripts/scaling_worker.py /root/testdata/sf0.1 "$cores" engine "$mirrors" "$scale" 2>/dev/null | tail -1)
  l1=$(cut -d' ' -f1 /proc/loadavg)
  echo "{\"load0\": $l0, \"load1\": $l1, \"run\": $line}" >> "$OUT"
}
run 2 8 64
run 8 8 64
run 2 8 64
run 8 8 64
