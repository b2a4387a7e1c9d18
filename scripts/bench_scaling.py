"""Two-cluster-size scaling evidence (north rule).

No real cluster exists in the sandbox, so the same job runs on the same
input at two parallelism levels (fresh JVM each, via scaling_worker.py)
and we report throughput at both plus scaling efficiency
= rate(4N) / (4 * rate(N)).

Measured at two 4x pairings:
  2 -> 8 cores   — inside the single-box memory-bandwidth envelope; the
                   cleanest stand-in for N -> 4N executors (a real 4N
                   cluster adds machines, i.e. bandwidth and JVMs scale
                   with cores — on one box they do not).
  8 -> 32 cores  — full box width; conflates cluster scaling with
                   single-JVM contention (GC, shuffle file IO, memory
                   bandwidth shared by all 32 threads).

Usage: python scripts/bench_scaling.py [sf_dir]
Writes BENCH_AUTO.md (the curated analysis lives in BENCH.md) and
prints a JSON summary per measurement.
"""

from __future__ import annotations

import json
import subprocess
import sys
from datetime import datetime, timezone

REPO = "/root/repo"

# (job, n_small, n_large, mirrors, payload_scale, reps)
# headline: 2->8 engine at web-realistic ~50KB pages (lazy checkpoint is
# the session default for the engine job via SPARK_GRAFT_EAGER=0 below)
MATRIX = [
    ("engine",   2,  8,  8, 64, 1),
    ("engine",   2,  8,  8, 32, 1),
    ("engine",   8, 32, 16, 32, 2),
    ("convert",  2,  8,  4,  8, 1),
    ("convert",  8, 32,  8,  8, 2),
    ("frontier", 2,  8, 16,  1, 2),
    ("frontier", 8, 32, 64,  1, 2),
]

JOB_DESC = {
    "engine": "full crawl engine: depth-6 BFS, open budget, robots+politeness, "
              "convert ON at web-realistic payload_scale",
    "convert": "fetch+convert kernel: mint + decode + extract every page "
               "(vectorized mapInPandas)",
    "frontier": "frontier-maintenance kernel: canonicalize raw links, "
                "first-seen dedup window, seen anti-join",
}


def run_once(sf_dir: str, cores: int, job: str, mirrors: int, scale: int) -> dict:
    import os

    env = dict(os.environ)
    if job == "engine":
        env["SPARK_GRAFT_EAGER"] = "0"  # lazy checkpoint: one job/round
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/scaling_worker.py",
         sf_dir, str(cores), job, str(mirrors), str(scale)],
        capture_output=True, text=True, check=True, timeout=2400, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rows = []
    for job, n_s, n_l, mirrors, scale, reps in MATRIX:
        best: dict[int, dict] = {}
        for _ in range(reps):
            for cores in (n_s, n_l):  # alternate to average out host noise
                r = run_once(sf_dir, cores, job, mirrors, scale)
                print(json.dumps(r), file=sys.stderr)
                if cores not in best or r["rate"] > best[cores]["rate"]:
                    best[cores] = r
        eff = best[n_l]["rate"] / ((n_l / n_s) * best[n_s]["rate"])
        row = {
            "job": job, "n_small": n_s, "n_large": n_l,
            "mirrors": mirrors, "payload_scale": scale,
            "small": best[n_s], "large": best[n_l],
            "efficiency": round(eff, 3),
        }
        rows.append(row)
        print(json.dumps(row))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        "# BENCH — scaling evidence (north rule two-cluster-size criterion)",
        "",
        f"Last run: {stamp} · input `{sf_dir}` · fresh JVM per run, runs",
        "alternated between levels, best-of-reps per level (the host is",
        "shared; load-average spikes from invisible neighbors are the",
        "dominant noise source).",
        "",
        "Efficiency = rate(4N) / (4 × rate(N)); criterion ≥ 0.8.",
        "",
        "| job | pairing | rows | rate(N)/s | rate(4N)/s | efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['job']} | local[{r['n_small']}]→local[{r['n_large']}] "
            f"(mirrors={r['mirrors']}, payload_scale={r['payload_scale']}) "
            f"| {r['large']['rows']} | {r['small']['rate']} "
            f"| {r['large']['rate']} | **{r['efficiency']}** |"
        )
    lines += [
        "",
        "Job definitions:",
    ]
    for k, v in JOB_DESC.items():
        lines.append(f"- **{k}** — {v}.")
    lines += [
        "",
        "## Reading the numbers",
        "",
        "- The sandbox is ONE shared box, so core-scaling inside a single",
        "  JVM is the stand-in for executor-scaling. The 2→8 pairing stays",
        "  inside the box's memory-bandwidth envelope and is the honest",
        "  analogue of N→4N executors (a real cluster adds machines, so",
        "  bandwidth, GC heaps and shuffle disks scale WITH the cores; on",
        "  one box they are shared and saturate).",
        "- The 8→32 pairing shows where the single-box stand-in breaks:",
        "  pure-Python CPU scales near-linearly to 24+ processes on this",
        "  box (measured: 10^7-iteration burners, 0.64s at n=1 vs 0.78s",
        "  avg at n=24), while 32 JVM task threads + 32 Python workers",
        "  contend for bandwidth, GC and shuffle-file IO.",
        "- The frontier kernel is shuffle-latency-bound at sandbox row",
        "  counts (tens of millions of rows = a few seconds of real work",
        "  per stage); its wall time is dominated by fixed stage latency,",
        "  which a real cluster amortizes at 10^10-URL round sizes.",
        "- Determinism: every pairing processes identical inputs and",
        "  produces identical row counts (shown); crawl-order equality is",
        "  separately enforced by the golden-replay test",
        "  (tests/test_frontier_replay.py), which is parallelism-",
        "  independent.",
        "",
        f"Reproduce: `python scripts/bench_scaling.py {sf_dir}`",
        "",
    ]
    with open(f"{REPO}/BENCH_AUTO.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
