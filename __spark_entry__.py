"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end crawl at sf0.001 — the full
  frontier engine (robots, budget, retries, seen-set) returning the
  globally ordered fetch-decision log.
- ``queries()``: one entry per implemented operator (SURVEY.md §2).
- ``oracle_sql()``: DuckDB-runnable ANSI SQL per query (generated from
  the same constants as the Spark side, see
  volltextextraktion_selenium_md_spark/oracles.py). Queries without an
  entry are non-SQL-expressible (full multi-round engine loop with
  budget/retry state; payload decode; xxhash64-seeded UA pick) and are
  covered by the golden-replay pytest instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from volltextextraktion_selenium_md_spark import oracles
from volltextextraktion_selenium_md_spark.plans import queries as Q
from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full crawl of the synthetic graph at sf0.001."""
    res = CrawlEngine(spark, SF0001).run()
    return res.fetch_log.orderBy("ordinal")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # frontier / engine steps (SURVEY §2.3, §2.5)
        "frontier_init": Q.q_frontier_init,
        "canonicalize_urls": Q.q_canonicalize_urls,
        "absolutize_links": Q.q_absolutize_links,
        "surt_form": Q.q_surt_form,
        "seen_anti_join": Q.q_seen_anti_join,
        "link_explode": Q.q_link_explode,
        "extract_links": Q.q_extract_links,
        "robots_filter": Q.q_robots_filter,
        "politeness_slots": Q.q_politeness_slots,
        "host_budget_topk": Q.q_host_budget_topk,
        "retry_requeue": Q.q_retry_requeue,
        "crawl_bfs_d1": Q.q_crawl_bfs_d1,
        # scalar cascades (SURVEY §2.2)
        "link_classification": Q.q_link_classification,
        "strategy_classifier": Q.q_strategy_classifier,
        "preflight_features": Q.q_preflight_features,
        "fetch_route": Q.q_fetch_route,
        "fetch_timeout": Q.q_fetch_timeout,
        "time_budget": Q.q_time_budget,
        "llm_postprocess": Q.q_llm_postprocess,
        "error_page_detect": Q.q_error_page_detect,
        "error_page_html": Q.q_error_page_html,
        "proxy_normalize": Q.q_proxy_normalize,
        "media_policy": Q.q_media_policy,
        "converter_route": Q.q_converter_route,
        "redirect_flag": Q.q_redirect_flag,
        "mime_to_ext": Q.q_mime_to_ext,
        "ua_rotation": Q.q_ua_rotation,
        "truncate_text": Q.q_truncate_text,
        "internal_links": Q.q_internal_links,
        # training-data pipeline: dedup family
        "dedup_exact": Q.q_dedup_exact,
        "doc_fingerprint": Q.q_doc_fingerprint,
        "token_stats": Q.q_token_stats,
        "lang_quality": Q.q_lang_quality,
        "ngram_jaccard": Q.q_ngram_jaccard,
        "minhash_signatures": Q.q_minhash_signatures,
        "minhash_lsh_pairs": Q.q_minhash_lsh_pairs,
        "minhash_lsh_clusters": Q.q_minhash_lsh_clusters,
        "simhash": Q.q_simhash,
        "simhash_dup_pairs": Q.q_simhash_dup_pairs,
        # streaming monitor (batch twins; stream==batch in tests)
        "event_rate_windows": Q.q_event_rate_windows,
        "sessionize": Q.q_sessionize,
        "admission_control": Q.q_admission_control,
        # training-data pipeline: similarity search
        "cosine_topk": Q.q_cosine_topk,
        "cosine_topk_lsh": Q.q_cosine_topk_lsh,
        "ivf_topk": Q.q_ivf_topk,
        "embedding_near_dup": Q.q_embedding_near_dup,
        # end-to-end engine (rows-only; exactness via golden replay test)
        "crawl_full": Q.q_crawl_full,
        "crawl_then_dedup": Q.q_crawl_then_dedup,
        # joint (round, partition, outcome) grouping — covers the
        # outcome AND partition-lineage marginals in one entry so the
        # list stays at 50 (driver correctness cap) with payload_table
        # included
        "crawl_metrics": Q.q_crawl_metrics,
        "payload_table": Q.q_payload_table,
    }


def oracle_sql() -> dict[str, str]:
    return oracles.build_oracles()
