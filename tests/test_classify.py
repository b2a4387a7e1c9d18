"""Cascade-order tests for the three classifiers (SURVEY §5.1: 'rule
order matters' cases from app/utils.py:79-123 / preflight.py:113-124)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.functions.classify import (
    classify_link,
    classify_strategy,
    error_page_detected,
    error_page_detected_html,
)

LINK_CASES = [
    ("javascript:void(0)", None, "anchor"),
    ("#top", None, "anchor"),
    # social beats auth: a twitter /login URL is social (cascade order)
    ("https://twitter.com/login", None, "social"),
    ("https://sub.github.com/x", None, "social"),  # endswith matching
    ("https://a.com/impressum/", None, "legal"),
    ("https://a.com/privacy", None, "legal"),
    # legal beats auth when both match: /datenschutz/login -> legal
    ("https://a.com/datenschutz/login", None, "legal"),
    ("https://a.com/signup/", None, "auth"),
    ("https://a.com/search?q=x", None, "search"),
    ("https://a.com/page?query=x", None, "search"),
    ("https://a.com/kontakt", None, "contact"),
    ("https://a.com/file.pdf", None, "download"),
    ("https://a.com/data.csv", None, "download"),
    # download beats nav text
    ("https://a.com/x.zip", "Home", "download"),
    ("https://a.com/x", "Home", "nav"),
    ("https://a.com/x", "  STARTSEITE ", "nav"),
    ("https://a.com/x", "read more", "content"),
    ("https://a.com/x", None, "content"),
]


def test_link_classification_cascade(spark):
    df = spark.createDataFrame(
        [(u, t, e) for u, t, e in LINK_CASES], ["url", "text", "expected"]
    )
    rows = df.select(
        "url", "expected",
        classify_link(F.col("url"), F.col("text")).alias("got"),
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"], r["url"]


# (ctype, final_url, text_len, has_main, spa, js_req, consent, bot, rss, yt) -> strategy
STRATEGY_CASES = [
    # ctype guards run first (preflight.py:66-87)
    (("application/pdf", "u", 2000, True, False, False, False, False, False, False), "PDF"),
    (("text/html", "https://x/report.PDF", 2000, True, False, False, False, False, False, False), "PDF"),
    (("application/rss+xml", "u", 0, False, False, False, False, False, False, False), "RSS"),
    # bot_wall beats everything else (":113-114")
    (("text/html", "u", 2000, True, False, False, False, True, False, True), "BLOCKED"),
    # youtube beats rss_link (":115-117")
    (("text/html", "u", 2000, True, False, False, False, False, True, True), "YOUTUBE"),
    (("text/html", "u", 2000, True, False, False, False, False, True, False), "RSS"),
    # HTTP_ONLY cut: >=800 and (main or not spa) and clean (":119-120")
    (("text/html", "u", 800, True, False, False, False, False, False, False), "HTTP_ONLY"),
    (("text/html", "u", 799, True, False, False, False, False, False, False), "HTTP_THEN_JS"),
    (("text/html", "u", 900, False, True, False, False, False, False, False), "JS_LIGHT"),
    # consent variant (":121-122")
    (("text/html", "u", 900, True, False, False, True, False, False, False), "JS_LIGHT_CONSENT"),
    (("text/html", "u", 400, True, False, False, False, False, False, False), "JS_LIGHT"),
    (("text/html", "u", 500, False, False, False, False, False, False, False), "HTTP_THEN_JS"),
    (("text/html", "u", 900, True, False, True, False, False, False, False), "JS_LIGHT"),
]


def test_strategy_cascade(spark):
    rows_in = [(i,) + c for i, (c, _) in enumerate(STRATEGY_CASES)]
    df = spark.createDataFrame(
        rows_in,
        ["i", "ctype", "final_url", "text_len", "has_main", "spa", "js", "consent",
         "bot", "rss", "yt"],
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i",
            classify_strategy(
                F.col("ctype"), F.col("final_url"), F.col("text_len"),
                F.col("has_main"), F.col("spa"), F.col("js"), F.col("consent"),
                F.col("bot"), F.col("rss"), F.col("yt"),
            ).alias("s"),
        ).collect()
    }
    for i, (_, expected) in enumerate(STRATEGY_CASES):
        assert got[i] == expected, f"case {i}"


ERROR_MD_CASES = [
    ("all fine here", 200, False),
    ("all fine here", 404, True),          # status wins
    ("page not found", 200, True),
    ("Seite NICHT gefunden", 200, True),   # case-insensitive
    ("subtle 404 inside text", 200, True),
    ("vorübergehend nicht verfügbar", 200, True),
    ("zero problems", None, False),
]


def test_error_page_md_variant(spark):
    df = spark.createDataFrame(ERROR_MD_CASES, ["text", "status", "expected"])
    rows = df.select(
        "expected",
        error_page_detected(F.col("text"), F.col("status")).alias("got"),
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"]


def test_error_page_html_variant_is_distinct(spark):
    # 'loading...' is only in the JS/html variant (js_fetcher.py:645-686);
    # 'wartung' is only in the markdown variant (utils.py:18-36)
    df = spark.createDataFrame(
        [("page loading...",), ("wartung läuft",)], ["text"]
    )
    rows = df.select(
        "text",
        error_page_detected_html(F.col("text")).alias("html_det"),
        error_page_detected(F.col("text"), F.lit(None)).alias("md_det"),
    ).collect()
    by_text = {r["text"]: r for r in rows}
    assert by_text["page loading..."]["html_det"] is True
    assert by_text["page loading..."]["md_det"] is False
    assert by_text["wartung läuft"]["html_det"] is False
    assert by_text["wartung läuft"]["md_det"] is True
