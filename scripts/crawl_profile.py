"""Profile bench.py's two crawl queries (flagship + replay-cfg) in one
fresh JVM with the round-phase breakdown on — the bench sequence,
instrumented (guide §1). Does NOT touch bench.py.

Usage: python scripts/crawl_profile.py [sf_dir] [reps]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    extra = dict(
        kv.split("=", 1)
        for kv in os.environ.get("SPARK_GRAFT_CONF", "").split(";")
        if "=" in kv
    )
    spark = get_spark(app_name="crawl-profile", extra_conf=extra)
    warm_dir = "/root/testdata/sf0.001"
    CrawlEngine(
        spark, warm_dir, cfg=CrawlConfig(max_rounds=2),
        collect_round_counts=False,
    ).run().fetch_log.count()
    spark.catalog.clearCache()

    flagship_cfg = CrawlConfig(
        max_depth=6, host_budget_per_round=1_000_000, max_rounds=10
    )
    for rep in range(reps):
        for name, cfg in (("flagship", flagship_cfg), ("replay", None)):
            t0 = time.time()
            print(f"=== {name} rep {rep} ===", flush=True)
            res = CrawlEngine(
                spark, sf_dir, cfg=cfg, collect_round_counts=False
            ).run()
            t_run = time.time() - t0
            n = res.fetch_log.filter(F.col("outcome") != "blocked").count()
            wall = time.time() - t0
            print(json.dumps({
                "q": name, "rep": rep, "wall_s": round(wall, 2),
                "run_s": round(t_run, 2),
                "count_s": round(wall - t_run, 2),
                "post_loop_s": res.post_loop_s,
                "rounds": res.rounds, "decisions": n,
                "round_walls": res.round_walls,
                "loadavg": round(os.getloadavg()[0], 2),
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
