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


LIVE_FETCH_SCHEMA = (
    "url string, host string, depth int, lineage string, attempt int, "
    "user_agent string, status_code int, final_url string, payload binary, "
    "content_type string, truncated boolean, attempts_used int, "
    "backoff_ms int, error string, partition_id int"
)


def _httpx_transport_factory():  # pragma: no cover — needs network
    """Default transport: ONE httpx client per partition (connection /
    keep-alive reuse across that partition's rows — the distributed
    analogue of the reference's per-request AsyncClient with
    max_keepalive_connections=4, http_fetcher.py:39-52)."""
    import httpx

    client = httpx.Client(follow_redirects=True, http2=True,
                          cookies=httpx.Cookies())

    def call(url: str, user_agent: str, timeout_s: float, max_bytes: int):
        with client.stream(
            "GET", url, headers={"User-Agent": user_agent}, timeout=timeout_s
        ) as resp:
            buf = bytearray()
            for chunk in resp.iter_bytes():
                buf.extend(chunk)
                if len(buf) > max_bytes:  # stream cut, don't buffer the body
                    break
            return (
                resp.status_code,
                str(resp.url),
                bytes(buf),
                resp.headers.get("content-type"),
            )

    return call


def live_fetch(
    admitted: DataFrame,
    cfg: CrawlConfig,
    transport_factory=None,
    num_partitions: int | None = None,
    timeout_s: float = 10.0,
) -> DataFrame:
    """Real network fetch stage behind the flag: salted repartition ->
    mapInPandas with a per-partition client.

    Faithful to the reference fast path (``http_fetcher.py:24-87``):
    - per-row 5-tuple ``(status, final_url, bytes, ctype, truncated)``
    - retry ONLY on transport exceptions, ``for attempt in
      range(retries+1)`` with ``min(2**attempt, 5)``s backoff
      (``:64-83``) — recorded as a ``backoff_ms`` schedule-slot column,
      never a sleep, so tests and the politeness scheduler stay
      deterministic
    - ``max_bytes`` byte-budget cut + ``truncated`` flag (``:71-79``)
    - retries exhausted -> status NULL + ``error`` (the engine maps it
      to a terminal failure like main.py's 502/504 translation)

    ``transport_factory() -> callable(url, ua, timeout_s, max_bytes) ->
    (status, final_url, bytes, ctype)`` is injectable; the default is
    httpx. Hot hosts are salted across partitions FIRST — this stage,
    unlike the simulated equi-join, really does one network call per
    row, so a Zipf host would otherwise pin one executor."""
    import pandas as pd

    from volltextextraktion_selenium_md_spark.operators.politeness import (
        salted_repartition,
    )

    if transport_factory is None:
        try:
            import httpx  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "live fetching requires httpx (or an injected transport); "
                "the sandbox engine uses simulated_fetch"
            ) from exc
        transport_factory = _httpx_transport_factory

    nparts = num_partitions or int(
        admitted.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    salted = salted_repartition(admitted, nparts)
    salted = salted.withColumn("user_agent", pick_user_agent(F.col("url")))
    retries, max_bytes = cfg.retries, cfg.max_bytes
    keep = ["url", "host", "depth", "lineage", "attempt", "user_agent"]

    def run(batches):
        transport = transport_factory()  # one client per partition
        for pdf in batches:
            out = {k: [] for k in keep + [
                "status_code", "final_url", "payload", "content_type",
                "truncated", "attempts_used", "backoff_ms", "error"]}
            for row in pdf.to_dict("records"):
                status = final_url = ctype = None
                data = b""
                backoff_ms = 0
                used = 0
                err = None
                for attempt in range(retries + 1):
                    used = attempt + 1
                    try:
                        status, final_url, data, ctype = transport(
                            row["url"], row["user_agent"], timeout_s, max_bytes
                        )
                        err = None
                        break
                    except Exception as exc:  # retry on transport errors only
                        err = f"{type(exc).__name__}: {exc}"
                        backoff_ms += min(2 ** attempt, 5) * 1000
                truncated = len(data) > max_bytes
                if truncated:
                    data = data[:max_bytes]
                for k in keep:
                    out[k].append(row[k])
                out["status_code"].append(status)
                out["final_url"].append(final_url)
                out["payload"].append(data if err is None else None)
                out["content_type"].append(ctype)
                out["truncated"].append(truncated)
                out["attempts_used"].append(used)
                out["backoff_ms"].append(backoff_ms)
                out["error"].append(err)
            res = pd.DataFrame(out)
            res["status_code"] = pd.array(out["status_code"], dtype="Int32")
            yield res

    import pyspark.sql.functions as SF

    return salted.select(*keep).mapInPandas(
        run, schema=LIVE_FETCH_SCHEMA.replace(", partition_id int", "")
    ).withColumn("partition_id", SF.spark_partition_id())
