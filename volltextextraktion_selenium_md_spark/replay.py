"""Single-threaded golden replay of the implied reference crawl loop.

Independent oracle for the Spark engine (SURVEY §5.3): loads the SAME
synthetic graph through DuckDB (same SQL text as the engine's temp
views), then runs the loop with plain Python dicts/lists — FIFO seeds,
document-order link emission (reference ``app/utils.py:39-55``),
first-seen dedup, per-host budget rank cut, robots prefix rules, retry
re-queue. The Spark engine's (round, depth, lineage)-ordered decisions
and final seen set must match this exactly.

Deliberately shares only `canonicalize_one` (a pure scalar, golden-pair
tested on its own) with the engine; all loop logic is written twice.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

import duckdb

from volltextextraktion_selenium_md_spark.config import CrawlConfig
from volltextextraktion_selenium_md_spark.graph import BASE_TABLES, GRAPH_VIEWS
from volltextextraktion_selenium_md_spark.functions.urls import canonicalize_one


@dataclass
class ReplayResult:
    crawl_order: list[dict]   # ordinal, round, url, depth, lineage, attempt, outcome
    seen: set[str]
    blocked: list[str]
    rounds: int


def _load_graph(sf_dir: str) -> tuple[dict, dict, list, dict]:
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name, body in GRAPH_VIEWS.items():
        con.execute(f"CREATE VIEW {name} AS {body}")

    pages = {
        r[0]: {
            "page_id": r[1], "status": r[2], "final_url": r[3], "content_type": r[4],
        }
        for r in con.execute(
            "SELECT url, page_id, status, final_url, content_type FROM g_pages"
        ).fetchall()
    }
    links: dict[int, list] = {}
    for pid, doc_pos, raw_url, dst_host in con.execute(
        "SELECT src_page_id, doc_pos, raw_url, dst_host FROM g_links "
        "ORDER BY src_page_id, doc_pos"
    ).fetchall():
        links.setdefault(pid, []).append((doc_pos, raw_url, dst_host))
    seeds = con.execute(
        "SELECT seed_idx, priority, raw_url, mode FROM g_seeds ORDER BY seed_idx"
    ).fetchall()
    robots = {
        r[0]: {"disallow_prefix": r[1], "crawl_delay_ms": r[2]}
        for r in con.execute(
            "SELECT host, disallow_prefix, crawl_delay_ms FROM g_robots"
        ).fetchall()
    }
    con.close()
    return pages, links, seeds, robots


def replay_crawl(sf_dir: str, cfg: CrawlConfig | None = None) -> ReplayResult:
    cfg = cfg or CrawlConfig()
    pages, links, seeds, robots = _load_graph(sf_dir)

    # round 0 init: canonicalize seeds, first-seen dedup in seed order
    frontier: list[dict] = []
    seen: set[str] = set()
    for seed_idx, priority, raw_url, mode in seeds:
        url = canonicalize_one(raw_url)
        if url in seen:
            continue
        seen.add(url)
        frontier.append({
            "url": url,
            "host": urlsplit(url).hostname,
            "depth": 0,
            "lineage": f"{seed_idx:06d}",
            "priority": priority,
            "mode": mode,
            "attempt": 0,
        })

    crawl_order: list[dict] = []
    blocked_log: list[str] = []
    rnd = 0
    while frontier and rnd < cfg.max_rounds:
        frontier.sort(key=lambda r: (r["depth"], r["lineage"]))
        next_frontier: list[dict] = []
        children: list[dict] = []
        host_counts: dict[str, int] = {}

        for row in frontier:
            rule = robots.get(row["host"])
            if rule and rule["disallow_prefix"]:
                path = urlsplit(row["url"]).path
                if path.startswith(rule["disallow_prefix"]):
                    blocked_log.append(row["url"])
                    continue

            host_counts[row["host"]] = host_counts.get(row["host"], 0) + 1
            if host_counts[row["host"]] > cfg.host_budget_per_round:
                next_frontier.append(row)  # deferred, unchanged
                continue

            page = pages.get(row["url"])
            if page is None:
                outcome = "missing"
            elif page["status"] in cfg.retryable_statuses:
                outcome = "retry" if row["attempt"] < cfg.retries else "failed"
            elif page["status"] >= 400:
                outcome = "failed"
            else:
                outcome = "fetched"

            crawl_order.append({
                "round": rnd,
                "url": row["url"],
                "depth": row["depth"],
                "lineage": row["lineage"],
                "mode": row["mode"],
                "attempt": row["attempt"],
                "outcome": outcome,
            })

            if outcome == "retry":
                next_frontier.append({**row, "attempt": row["attempt"] + 1})
            elif (
                outcome == "fetched"
                and page["content_type"].startswith("text/html")
                and row["depth"] < cfg.max_depth
            ):
                for doc_pos, raw_url, dst_host in links.get(page["page_id"], []):
                    children.append({
                        "url": canonicalize_one(raw_url),
                        "host": dst_host,
                        "depth": row["depth"] + 1,
                        "lineage": f"{row['lineage']}.{doc_pos:02d}",
                        "priority": row["priority"],
                        "mode": row["mode"],  # children re-POST with the
                        # parent request's settings (reference dispatch
                        # is per-request, schemas.py:85-104)
                        "attempt": 0,
                    })

        # first-seen dedup of this round's children in crawl order,
        # then global seen-set cut
        children.sort(key=lambda r: (r["depth"], r["lineage"]))
        batch_seen: set[str] = set()
        for ch in children:
            if ch["url"] in batch_seen or ch["url"] in seen:
                continue
            batch_seen.add(ch["url"])
            seen.add(ch["url"])
            next_frontier.append(ch)

        frontier = next_frontier
        rnd += 1

    crawl_order.sort(key=lambda r: (r["round"], r["depth"], r["lineage"]))
    for i, row in enumerate(crawl_order, start=1):
        row["ordinal"] = i
    return ReplayResult(
        crawl_order=crawl_order, seen=seen, blocked=blocked_log, rounds=rnd
    )
