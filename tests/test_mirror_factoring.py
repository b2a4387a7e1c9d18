"""Factored mirror joins == eagerly materialized mirror corpus.

The scale benchmarks crawl R disjoint copies of the web. The engine's
default path keeps pages/links BASE-sized and strips/re-mints the
mirror id on the probe side of each per-round join; the eager path
(SPARK_GRAFT_MIRROR_MATERIALIZE=1) materializes the R× page corpus.
Both must produce the identical crawl."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from volltextextraktion_selenium_md_spark import graph
from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine

LOG_KEY = ("ordinal", "round", "url", "depth", "lineage", "mode", "attempt",
           "outcome", "page_id", "status_code", "final_url", "content_type",
           "strategy", "route", "elapsed_ms")


def test_strip_extract_invert_insert(spark):
    """strip_mirror/extract_mirror are exact inverses of insert_mirror,
    including the raw-url noise classes (#frag, trailing /, UPPERCASE
    pre-path) after canonicalization lowercases the host."""
    base = [
        "https://host3.example.com/page/7",
        "https://alpha-2.example.com/page/0019?x=1",
        "https://h.example.com/",
    ]
    df = spark.createDataFrame([(u,) for u in base], "url string")
    for m in (0, 5, 63):
        out = (
            df.select(
                graph.insert_mirror(F.col("url"), F.lit(m)).alias("mu")
            )
            .select(
                "mu",
                graph.strip_mirror(F.col("mu")).alias("stripped"),
                graph.extract_mirror(F.col("mu")).alias("mir"),
            )
            .collect()
        )
        for row, orig in zip(out, base):
            assert f".m{m}.example.com" in row["mu"]
            assert row["stripped"] == orig
            assert row["mir"] == m
    # un-mirrored url: no token -> NULL mirror, strip is the identity
    plain = df.select(
        graph.extract_mirror(F.col("url")).alias("mir"),
        graph.strip_mirror(F.col("url")).alias("stripped"),
    ).collect()
    for row, orig in zip(plain, base):
        assert row["mir"] is None
        assert row["stripped"] == orig


def test_canonicalize_commutes_with_insert_mirror(spark):
    """The engine's factored link path substitutes
    canonicalize(insert_mirror(raw, m)) with
    insert_mirror(canonicalize(raw), m) — assert the two agree on EVERY
    raw link and seed url in the graph (all noise classes: #frag,
    trailing /, UPPERCASE scheme+host prefix), for boundary mirrors."""
    from volltextextraktion_selenium_md_spark.functions.urls import (
        canonicalize_url,
    )

    graph.register_graph_views(spark, SF_SMALL)
    raws = (
        graph.links(spark).select("raw_url")
        .unionByName(graph.seeds(spark).select("raw_url"))
    )
    for m in (0, 5, 63):
        mismatches = (
            raws.select(
                canonicalize_url(
                    graph.insert_mirror(F.col("raw_url"), F.lit(m))
                ).alias("a"),
                graph.insert_mirror(
                    canonicalize_url(F.col("raw_url")), F.lit(m)
                ).alias("b"),
            )
            .filter("a IS NULL OR b IS NULL OR a <> b")
            .count()
        )
        assert mismatches == 0, f"mirror {m}: {mismatches} mismatches"


def _run(spark, materialize: bool):
    prev = os.environ.get("SPARK_GRAFT_MIRROR_MATERIALIZE")
    os.environ["SPARK_GRAFT_MIRROR_MATERIALIZE"] = "1" if materialize else "0"
    try:
        res = CrawlEngine(
            spark, SF_SMALL, CrawlConfig(max_depth=3, max_rounds=5),
            mirrors=3,
        ).run()
        rows = (
            res.fetch_log.filter("outcome <> 'blocked'")
            .select(*LOG_KEY)
            .orderBy("ordinal")
            .collect()
        )
        return [tuple(r[k] for k in LOG_KEY) for r in rows]
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_MIRROR_MATERIALIZE", None)
        else:
            os.environ["SPARK_GRAFT_MIRROR_MATERIALIZE"] = prev


def test_factored_mirror_crawl_equals_materialized(spark):
    factored = _run(spark, materialize=False)
    eager = _run(spark, materialize=True)
    assert len(factored) > 0
    assert factored == eager
    # sanity: the crawl really ran in mirrored URL space
    assert all(".m" in r[2] for r in factored)
