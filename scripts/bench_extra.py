"""Round-7 optimization harness: per-query isolation with the noop sink
(guide §1.4), per-query wall + optional formatted plans. Does NOT touch
bench.py (frozen). Usage:

    python scripts/bench_extra.py [sf_dir] [query ...]   # time queries
    SPARK_GRAFT_EXPLAIN_DIR=plans/r07 SUFFIX=_before \
        python scripts/bench_extra.py sf_dir q...        # also dump plans
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from volltextextraktion_selenium_md_spark.plans import queries as Q
from volltextextraktion_selenium_md_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:] or [
    "crawl_bfs_d1", "link_classification", "strategy_classifier",
    "preflight_features", "fetch_route", "llm_postprocess", "dedup_exact",
    "token_stats", "lang_quality", "minhash_lsh_pairs", "simhash_dup_pairs",
    "ngram_jaccard", "cosine_topk", "cosine_topk_lsh", "embedding_near_dup",
    "image_features", "phash_near_dup",
]
EXPLAIN_DIR = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR")
SUFFIX = os.environ.get("SUFFIX", "")
REPS = int(os.environ.get("REPS", "2"))


def main() -> None:
    spark = get_spark(app_name="bench-extra")
    # warm-up: small full pass so JIT/codegen/Arrow init doesn't land on
    # the first measured query (bench.py warms with a 2-round crawl; here
    # a cheap scan is enough for the operator suite)
    spark.read.parquet(f"{SF}/nation.parquet").count()
    out = {}
    for name in NAMES:
        fn = getattr(Q, f"q_{name}")
        df = fn(spark, SF)
        if EXPLAIN_DIR:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(EXPLAIN_DIR, f"{name}{SUFFIX}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(name, samples, flush=True)
    print(json.dumps({"sf": SF, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
