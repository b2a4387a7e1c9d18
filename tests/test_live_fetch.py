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

        def call(url, user_agent, timeout_s, max_bytes):
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

        def call(url, user_agent, timeout_s, max_bytes):
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
