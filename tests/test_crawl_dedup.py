"""crawl -> convert -> near-dup composition: the Spark pipeline's dup
pairs must equal an INDEPENDENT recompute (golden replay crawl set +
pure-Python mint/convert), and must be non-vacuous."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMALL
from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.graph import BASE_TABLES, GRAPH_VIEWS
from volltextextraktion_selenium_md_spark.operators import dedup
from volltextextraktion_selenium_md_spark.plans import queries as Q
from volltextextraktion_selenium_md_spark.plans.convert import (
    _Breaker,
    convert_bytes,
    mint_payload,
)
from volltextextraktion_selenium_md_spark.replay import replay_crawl

PAGE_COLS = [
    "url", "page_id", "content_type", "text_len", "has_main", "spa_mark",
    "js_required", "consent", "bot_wall", "rss_link",
]


def _pages_by_url():
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    for name, body in GRAPH_VIEWS.items():
        con.execute(f"CREATE VIEW {name} AS {body}")
    rows = con.execute(f"SELECT {', '.join(PAGE_COLS)} FROM g_pages").fetchall()
    con.close()
    return {r[0]: dict(zip(PAGE_COLS, r)) for r in rows}


def test_crawl_then_dedup_matches_independent_recompute(spark):
    cfg = CrawlConfig()
    rep = replay_crawl(SF_SMALL, cfg)
    pages = _pages_by_url()
    docs_py = []
    seen_pids = set()
    for row in rep.crawl_order:
        if row["outcome"] != "fetched":
            continue
        p = pages[row["url"]]
        if p["page_id"] in seen_pids:
            continue
        seen_pids.add(p["page_id"])
        # resolve the convert stage with THAT lineage's inherited
        # request settings (html_converter / media_policy / max_bytes /
        # trafilatura_clean ride the frontier from g_seeds), exactly as
        # the engine's convert_stage reads them per row
        mb = row.get("max_bytes")
        md, _, _ = convert_bytes(
            int(p["page_id"]), p["content_type"], mint_payload(p),
            _Breaker(), int(mb) if mb is not None else cfg.max_bytes,
            media_policy=row.get("media_policy") or cfg.media_policy,
            forced_converter=row.get("html_converter"),
            trafilatura_clean=row.get("trafilatura_clean"),
        )
        docs_py.append((int(p["page_id"]), md))

    want_df = spark.createDataFrame(docs_py, "doc_id long, text string")
    want = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            want_df, n=3, num_hashes=Q.MINHASH_H, bands=Q.MINHASH_BANDS,
            threshold=Q.LSH_EST_T,
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in Q.q_crawl_then_dedup(spark, SF_SMALL).collect()
    }
    assert got == want
    assert len(got) > 0  # the composition must actually find near-dups
