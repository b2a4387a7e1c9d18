"""Fetch stage: simulated distributed fetch as a lookup join.

The reference fetches one URL per request over the network
(``app/http_fetcher.py:24-87`` fast path; ``app/js_fetcher.py:715-956``
Selenium path). The sandbox engine resolves fetches against the
deterministic `g_pages` graph with a join (FIXTURES.md §2) — exactly
what makes every downstream decision oracle-checkable. A live deploy
replaces `simulated_fetch` with an httpx `mapInPandas` stage
(`live_fetch`, gated on httpx availability); all scheduling, retry,
strategy, and conversion logic is shared.

Outcome semantics (mirrors reference control flow):
- no page row            -> 'missing' (terminal failure)
- status in retryables   -> 'retry' while attempt < retries
                            (reference retry loop app/http_fetcher.py:64-83),
                            else 'failed'
- status >= 400 (other)  -> 'failed' (e.g. 404; non-retryable)
- else                   -> 'fetched' (incl. 301: httpx follows
                            redirects, final_url differs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.functions.classify import (
    classify_strategy,
    route_fetch,
)
from volltextextraktion_selenium_md_spark.functions.mime import pick_user_agent
from volltextextraktion_selenium_md_spark.functions.urls import redirect_flag


def simulated_fetch(admitted: DataFrame, pages: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Resolve admitted frontier rows against the page corpus.

    Join is equi on the canonical url: at 10^10 scale both sides hash-
    partition on the key; the frontier side is orders of magnitude
    smaller per round, so AQE picks a sensible strategy; no skew
    (url is unique on both sides)."""
    page_cols = pages.select(
        F.col("url"),
        F.col("page_id"),
        F.col("status").alias("page_status"),
        F.col("final_url"),
        F.col("content_type"),
        "text_len", "has_main", "spa_mark", "js_required",
        "consent", "bot_wall", "rss_link", "youtube",
    )
    joined = admitted.join(page_cols, on="url", how="left")

    strategy = classify_strategy(
        F.col("content_type"), F.coalesce(F.col("final_url"), F.col("url")),
        F.col("text_len"), F.col("has_main"), F.col("spa_mark"),
        F.col("js_required"), F.col("consent"), F.col("bot_wall"),
        F.col("rss_link"), F.col("youtube"),
        http_only_text_len=cfg.http_only_text_len,
        js_light_thin_text_len=cfg.js_light_thin_text_len,
    )
    # auto-mode routing (main.py:334-371): the engine crawls in 'auto'
    # mode — preflight always runs; the route decides whether its bytes
    # are served or Selenium refetches (second-chance cut at 700)
    route = route_fetch(
        F.lit("auto"), strategy, F.col("text_len"),
        second_chance_text_len=cfg.second_chance_text_len,
    )

    retryable = F.col("page_status").isin(list(cfg.retryable_statuses))
    outcome = (
        F.when(F.col("page_id").isNull(), "missing")
        .when(retryable & (F.col("attempt") < cfg.retries), "retry")
        .when(retryable, "failed")
        .when(F.col("page_status") >= 400, "failed")
        .otherwise("fetched")
    )

    # cost model: strategy latency midpoints (README.md:223,362-363) +
    # the politeness slot offset; replaces wall-clock with a
    # deterministic charge so throughput is measurable and replayable.
    # A second-chance miss (HTTP_THEN_JS routed to Selenium) pays the
    # JS refetch on top of the preflight it already ran (main.py:351-371)
    cost = F.lit(None).cast("int")
    for strat, ms in cfg.cost_ms.items():
        cost = F.when(strategy == strat, ms).otherwise(cost)
    cost = F.when(
        (strategy == "HTTP_THEN_JS") & (route == "selenium"),
        cfg.cost_ms["HTTP_THEN_JS"] + cfg.cost_ms["JS_LIGHT"],
    ).otherwise(cost)

    return (
        joined.withColumn("strategy", F.when(F.col("page_id").isNotNull(), strategy))
        .withColumn("route", F.when(F.col("page_id").isNotNull(), route))
        .withColumn("outcome", outcome)
        .withColumn("user_agent", pick_user_agent(F.col("url")))
        .withColumn(
            "redirected",
            F.when(
                F.col("final_url").isNotNull(),
                redirect_flag(F.col("url"), F.col("final_url")),
            ),
        )
        .withColumn(
            "elapsed_ms",
            (F.coalesce(cost, F.lit(0)) + F.coalesce(F.col("sched_slot_ms"), F.lit(0))).cast("int"),
        )
    )


def live_fetch(admitted: DataFrame, cfg: CrawlConfig) -> DataFrame:  # pragma: no cover
    """Real network fetch via httpx inside mapInPandas — per-partition
    connection reuse, per-row (status, final_url, bytes, ctype,
    truncated) like the reference's 5-tuple (http_fetcher.py:33-34).
    Not runnable in the sandbox (no network/httpx)."""
    try:
        import httpx  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "live fetching requires httpx + network; the sandbox uses simulated_fetch"
        ) from exc
    raise NotImplementedError("live fetch wiring is deployment-specific")
