"""live_fetch stage with an injected mock transport (SURVEY §2.1 S1,
reference app/http_fetcher.py:24-87): 5-tuple shape, truncation flag,
exception-only retry with capped-exponential backoff slots, salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.config import CrawlConfig


def _frontier(spark, urls):
    return spark.createDataFrame(
        [(u, u.split("/")[2], 0, f"{i:06d}", 0) for i, u in enumerate(urls)],
        ["url", "host", "depth", "lineage", "attempt"],
    )


def _make_mock_factory():
    """Build the factory as a CLOSURE so cloudpickle ships it by value
    (executors cannot import the tests module by name).

    Deterministic transport: behavior keyed on the url path.
    /ok    -> 200 html; /big -> 200 with a 5000-byte body;
    /redir -> 200 via a different final_url; /flaky -> fails twice,
    then 200; /down  -> always raises."""

    def factory():
        calls = {}  # per-partition client state (connection-reuse analogue)

        def call(url, user_agent, timeout_s, max_bytes, **kw):
            assert user_agent  # UA header always set (http_fetcher.py:36-37)
            path = url.rsplit("/", 1)[-1]
            if path == "down":
                raise ConnectionError("refused")
            if path.startswith("flaky"):
                calls[url] = calls.get(url, 0) + 1
                if calls[url] <= 2:
                    raise TimeoutError("slow")
                return 200, url, b"recovered", "text/html"
            if path == "big":
                return 200, url, b"x" * 5000, "application/octet-stream"
            if path == "redir":
                return 200, url + "/final", b"<html>r</html>", "text/html"
            return 200, url, b"<html>ok</html>", "text/html"

        return call

    return factory


def test_live_fetch_mock_transport(spark):
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    cfg = CrawlConfig(retries=2, max_bytes=1024)
    urls = [
        "https://h0.example.com/ok",
        "https://h0.example.com/big",
        "https://h1.example.com/redir",
        "https://h1.example.com/flaky",
        "https://h2.example.com/down",
    ]
    rows = {
        r["url"]: r
        for r in live_fetch(
            _frontier(spark, urls), cfg,
            transport_factory=_make_mock_factory(), num_partitions=2,
        ).collect()
    }
    ok = rows["https://h0.example.com/ok"]
    assert (ok["status_code"], bytes(ok["payload"]), ok["content_type"],
            ok["truncated"], ok["backoff_ms"]) == (
        200, b"<html>ok</html>", "text/html", False, 0)

    big = rows["https://h0.example.com/big"]   # max_bytes cut + flag
    assert big["truncated"] and len(bytes(big["payload"])) == 1024

    red = rows["https://h1.example.com/redir"]  # final_url differs
    assert red["final_url"].endswith("/redir/final")

    down = rows["https://h2.example.com/down"]  # retries exhausted
    assert down["status_code"] is None and down["payload"] is None
    assert down["attempts_used"] == 3 and "ConnectionError" in down["error"]
    # backoff slots: min(2^0,5)+min(2^1,5)+min(2^2,5) = 1+2+4 s
    assert down["backoff_ms"] == 7000


def test_live_fetch_flaky_retry_backoff(spark):
    """A transport that fails twice then succeeds: 3 attempts, the
    first two failures charge 1s + 2s backoff slots, payload served."""
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    cfg = CrawlConfig(retries=3, max_bytes=1024)
    # single partition so the per-partition transport sees all attempts
    got = live_fetch(
        _frontier(spark, ["https://h9.example.com/flaky"]), cfg,
        transport_factory=_make_mock_factory(), num_partitions=1,
    ).collect()[0]
    assert bytes(got["payload"]) == b"recovered"
    assert got["attempts_used"] == 3
    assert got["backoff_ms"] == 3000
    assert got["error"] is None


def test_live_fetch_concurrent_within_partition(spark):
    """cfg.fetch_concurrency > 1: requests within one partition overlap
    in flight (reference: async httpx under the 8-slot semaphore,
    app/main.py:27-28) while output rows stay per-row correct and in
    frontier order."""
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    def factory():
        import threading

        lock = threading.Lock()
        state = {"in_flight": 0, "max_in_flight": 0}
        gate = threading.Barrier(2, timeout=20)  # needs 2 overlapping calls

        def call(url, user_agent, timeout_s, max_bytes, **kw):
            with lock:
                state["in_flight"] += 1
                state["max_in_flight"] = max(
                    state["max_in_flight"], state["in_flight"]
                )
            try:
                gate.wait()  # blocks until a SECOND request is in flight
            finally:
                with lock:
                    state["in_flight"] -= 1
            return 200, url, f"peak={state['max_in_flight']}".encode(), "text/html"

        return call

    urls = [f"https://conc.example.com/p{i}" for i in range(6)]
    got = live_fetch(
        _frontier(spark, urls), CrawlConfig(fetch_concurrency=3),
        transport_factory=factory, num_partitions=1,
    ).collect()
    assert len(got) == 6
    assert {r["url"] for r in got} == set(urls)  # none dropped/duplicated
    # every call observed >= 2 requests in flight (the barrier released)
    for r in got:
        assert r["status_code"] == 200 and r["error"] is None
        assert int(bytes(r["payload"]).split(b"=")[1]) >= 2


def test_live_fetch_timeout_from_config(spark):
    """Round-3 verdict fix: the transport timeout derives from
    cfg.timeout_ms (reference default 30 s, schemas.py:116-128), not a
    hardcoded 10 s — and a request slower than the configured cap times
    out and re-enters the in-partition retry loop."""
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    def factory():
        def call(url, user_agent, timeout_s, max_bytes, **kw):
            # modeled latency: /slow needs 5 s, /quick needs 1 s; the
            # transport times out iff the cap is below the model
            need_s = 5.0 if url.endswith("/slow") else 1.0
            if timeout_s < need_s:
                raise TimeoutError(f"exceeded {timeout_s}s")
            return 200, url, f"t={timeout_s}".encode(), "text/html"

        return call

    cfg = CrawlConfig(timeout_ms=2500, retries=1)
    rows = {
        r["url"]: r
        for r in live_fetch(
            _frontier(spark, ["https://h0.example.com/quick",
                              "https://h0.example.com/slow"]),
            cfg, transport_factory=factory, num_partitions=1,
        ).collect()
    }
    quick = rows["https://h0.example.com/quick"]
    assert bytes(quick["payload"]) == b"t=2.5"  # cfg-derived cap reached the transport
    slow = rows["https://h0.example.com/slow"]  # timed out, retried, exhausted
    assert slow["status_code"] is None and "TimeoutError" in slow["error"]
    assert slow["attempts_used"] == 2 and slow["backoff_ms"] == 3000
    # default CrawlConfig: the reference's 30 s reaches the transport
    got = live_fetch(
        _frontier(spark, ["https://h0.example.com/slow"]), CrawlConfig(),
        transport_factory=factory, num_partitions=1,
    ).collect()[0]
    assert bytes(got["payload"]) == b"t=30.0"


def test_live_fetch_proxy_and_ssl_reach_transport(spark):
    """Round-3 verdict fix: per-request proxy + allow_insecure_ssl are
    plumbed into the transport (reference app/http_fetcher.py:45-53),
    with the proxy normalized by the P1 operator first; absent columns
    fall back to the config defaults."""
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    def factory():
        def call(url, user_agent, timeout_s, max_bytes, proxy=None, verify=True):
            body = f"proxy={proxy} verify={verify}".encode()
            return 200, url, body, "text/html"

        return call

    f = spark.createDataFrame(
        [
            ("https://h0.example.com/a", "h0.example.com", 0, "000000", 0,
             "socks5://10.0.0.1:1080", True),
            ("https://h0.example.com/b", "h0.example.com", 0, "000001", 0,
             "ftp://not-a-proxy:21", False),   # P1 rejects -> no proxy
            ("https://h0.example.com/c", "h0.example.com", 0, "000002", 0,
             None, False),
        ],
        "url string, host string, depth int, lineage string, attempt int, "
        "proxy string, allow_insecure_ssl boolean",
    )
    rows = {
        r["url"]: bytes(r["payload"]).decode()
        for r in live_fetch(
            f, CrawlConfig(), transport_factory=factory, num_partitions=1
        ).collect()
    }
    assert rows["https://h0.example.com/a"] == "proxy=socks5://10.0.0.1:1080 verify=False"
    assert rows["https://h0.example.com/b"] == "proxy=None verify=True"
    assert rows["https://h0.example.com/c"] == "proxy=None verify=True"

    # no frontier columns -> config defaults flow through
    got = live_fetch(
        _frontier(spark, ["https://h0.example.com/d"]),
        CrawlConfig(proxy="http://proxy.example.com:8080", allow_insecure_ssl=True),
        transport_factory=factory, num_partitions=1,
    ).collect()[0]
    assert bytes(got["payload"]).decode() == (
        "proxy=http://proxy.example.com:8080 verify=False"
    )

    # NULL allow_insecure_ssl in a PRESENT column = "use the global
    # setting" (reference http_fetcher.py:43, README "null nutzt
    # .env") — must coalesce to cfg.allow_insecure_ssl, not to secure
    f_null = spark.createDataFrame(
        [("https://h0.example.com/e", "h0.example.com", 0, "000003", 0,
          None, None)],
        "url string, host string, depth int, lineage string, attempt int, "
        "proxy string, allow_insecure_ssl boolean",
    )
    got = live_fetch(
        f_null, CrawlConfig(allow_insecure_ssl=True),
        transport_factory=factory, num_partitions=1,
    ).collect()[0]
    assert bytes(got["payload"]).decode() == "proxy=None verify=False"


def test_live_fetch_salts_hot_host(spark):
    """A Zipf-hot host must spread across partitions before the fetch
    (salted_repartition is part of the stage)."""
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    urls = [f"https://hot.example.com/ok{i}" for i in range(64)]
    got = live_fetch(
        _frontier(spark, urls), CrawlConfig(),
        transport_factory=_make_mock_factory(), num_partitions=8,
    )
    nparts = got.select("partition_id").distinct().count()
    assert nparts >= 4  # one host, many partitions


def test_live_fetch_per_row_timeout_and_max_bytes(spark):
    """Per-request timeout_ms / max_bytes columns reach the transport
    ROW-WISE (reference schemas.py:116-128, 156-170): NULL rows fall
    back to the config values, non-NULL rows override them — both the
    transport's read cap and the stage's stream cut."""
    from volltextextraktion_selenium_md_spark.plans.fetch import live_fetch

    def factory():
        def call(url, user_agent, timeout_s, max_bytes, **kw):
            # echo the per-call caps so the test can assert them
            body = f"t={timeout_s:.1f};m={max_bytes}".encode() + b"x" * 200
            return 200, url, body[:max_bytes + 100], "text/html"

        return call

    rows = [
        ("https://h0.example.com/a", "h0.example.com", 0, "000000", 0, 500, 64),
        ("https://h0.example.com/b", "h0.example.com", 0, "000001", 0, None, None),
    ]
    f = spark.createDataFrame(
        rows,
        "url string, host string, depth int, lineage string, attempt int, "
        "timeout_ms int, max_bytes int",
    )
    cfg = CrawlConfig(timeout_ms=2000, max_bytes=1024)
    out = {
        r["url"].rsplit("/", 1)[-1]: r
        for r in live_fetch(f, cfg, transport_factory=factory,
                            num_partitions=1).collect()
    }
    a, b = out["a"], out["b"]
    # row a: overrides reached the transport and the stream cut
    assert bytes(a["payload"]).startswith(b"t=0.5;m=64")
    assert len(a["payload"]) == 64 and a["truncated"]
    # row b: NULLs coalesced to the config values
    assert bytes(b["payload"]).startswith(b"t=2.0;m=1024")
    assert not b["truncated"]  # body (~210 B) under the 1024 cap
