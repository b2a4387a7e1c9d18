"""Headline benchmark (driver contract).

Runs the flagship crawl engine plus representative operators at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1,
     "fetch_decisions_per_sec": ..., "decisions": ...}

The north-rule metric is frontier fetch-decisions/sec, reported in the
extra ``fetch_decisions_per_sec`` key (the flagship crawl: depth-6 BFS
with an open politeness budget, i.e. the engine saturated with work
rather than throttled by the per-host budget — politeness is still
enforced via robots + crawl-delay slots). The reference's implied
ceiling is ~4-8 pages/s (BASELINE.md: 8 concurrent / 1-2 s per page).

Scaling evidence (local[8] vs local[32]) is produced separately by
``scripts/bench_scaling.py`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.plans import queries as Q
from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine
from volltextextraktion_selenium_md_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# politeness-saturating flagship config: deep BFS, open host budget —
# measures engine throughput, not the budget throttle
FLAGSHIP_CFG = CrawlConfig(max_depth=6, host_budget_per_round=1_000_000, max_rounds=10)


def _materialize(df) -> int:
    """Force full computation of every column (noop sink, no driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    _load0 = os.getloadavg()[0]
    spark = get_spark(app_name="bench")

    # warm-up: JVM/codegen/Arrow init on the ACTUAL engine code paths —
    # a 2-round crawl at the smallest SF compiles every generated class
    # (windows, joins, pandas UDF plumbing) before the measured flagship,
    # so the suite measures steady-state throughput, not first-job JIT
    # (same methodology as scripts/flagship_once.py; warm-up time is
    # excluded from every reported timing)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != SF_DIR:
        CrawlEngine(
            spark, warm_dir, cfg=CrawlConfig(max_rounds=2),
            collect_round_counts=False,
        ).run().fetch_log.count()
        # the warm-up engine persisted the warm-dir pages/links/robots
        # relations; drop them so warm-up data doesn't occupy executor
        # storage memory during the measured runs
        spark.catalog.clearCache()
    else:
        spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- flagship: saturated crawl (north-rule metric) -----------------
    t0 = time.time()
    res = CrawlEngine(
        spark, SF_DIR, cfg=FLAGSHIP_CFG, collect_round_counts=False
    ).run()
    decisions = res.fetch_log.filter(F.col("outcome") != "blocked").count()
    dt = time.time() - t0
    timings["crawl_saturated_e2e"] = round(dt, 3)
    extras["decisions"] = decisions
    extras["fetch_decisions_per_sec"] = round(decisions / dt, 1)
    extras["crawl_rounds"] = res.rounds

    # --- politeness-constrained crawl (golden-replay config) -----------
    t0 = time.time()
    res2 = CrawlEngine(spark, SF_DIR, collect_round_counts=False).run()
    d2 = res2.fetch_log.filter(F.col("outcome") != "blocked").count()
    timings["crawl_replay_cfg"] = round(time.time() - t0, 3)
    extras["replay_cfg_decisions"] = d2

    # --- representative operator suite ---------------------------------
    suite = [
        "crawl_bfs_d1",
        "link_classification",
        "strategy_classifier",
        "preflight_features",
        "fetch_route",
        "llm_postprocess",
        "dedup_exact",
        "token_stats",
        "lang_quality",
        "minhash_lsh_pairs",
        "simhash_dup_pairs",
        "ngram_jaccard",
        "cosine_topk",
        "cosine_topk_lsh",
        "embedding_near_dup",
        "image_features",
        "phash_near_dup",
    ]
    qmap = {
        name: getattr(Q, f"q_{name}")
        for name in suite
    }
    # contention-proofing (round-5 verdict: a noisy shared-host window
    # published 10x numbers as the round's record): each operator runs
    # SUITE_REPS times, the reported timing is the MEDIAN, and the
    # per-query loadavg + rep spread ride along so a contaminated rep
    # is visible in the artifact instead of silently becoming the
    # headline. The flagship crawl stays single-run here — it has
    # committed multi-rep fresh-JVM evidence in BENCH_RUNS_r*.jsonl.
    reps = int(os.environ.get("SPARK_GRAFT_SUITE_REPS", "3"))
    query_loadavg: dict[str, float] = {}
    query_spread: dict[str, list[float]] = {}
    for name, fn in qmap.items():
        query_loadavg[name] = round(os.getloadavg()[0], 1)
        samples = []
        for _ in range(reps):
            t0 = time.time()
            _materialize(fn(spark, SF_DIR))
            samples.append(time.time() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        query_spread[name] = [round(samples[0], 3), round(samples[-1], 3)]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (flagship crawl + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "suite_reps": reps,
        "query_loadavg": query_loadavg,
        "query_spread": query_spread,
        "loadavg_start": round(_load0, 1),
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
