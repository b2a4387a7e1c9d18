"""Eager-vs-lazy fetch-checkpoint bisection on bench.py's exact flagship shape.

Run one flagship crawl in a fresh JVM and print one JSON line:
    python scripts/bisect_ckpt.py {eager|lazy}
Driver loop (alternating reps): scripts/bisect_ckpt.sh
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine
from volltextextraktion_selenium_md_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FLAGSHIP_CFG = CrawlConfig(max_depth=6, host_budget_per_round=1_000_000, max_rounds=10)


def main() -> None:
    mode = sys.argv[1]
    eager = mode == "eager"
    load0 = open("/proc/loadavg").read().split()[0]
    spark = get_spark(app_name=f"bisect-{mode}")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    t0 = time.time()
    res = CrawlEngine(
        spark, SF_DIR, cfg=FLAGSHIP_CFG, collect_round_counts=False,
        eager_fetch_checkpoint=eager,
    ).run()
    decisions = res.fetch_log.filter(F.col("outcome") != "blocked").count()
    dt = time.time() - t0
    load1 = open("/proc/loadavg").read().split()[0]
    print(json.dumps({
        "mode": mode, "wall": round(dt, 2), "decisions": decisions,
        "rate": round(decisions / dt, 1), "rounds": res.rounds,
        "round_walls": res.round_walls, "load0": load0, "load1": load1,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
