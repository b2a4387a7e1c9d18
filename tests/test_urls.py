"""Canonicalization / SURT / host helpers — golden pairs (SURVEY §5.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.functions.urls import (
    canonicalize_one,
    canonicalize_url,
    redirect_flag,
    surt_one,
)

GOLDEN = [
    # lowercase scheme + host
    ("HTTPS://EXAMPLE.com/Path", "https://example.com/Path"),
    # strip fragment
    ("https://a.com/x#frag", "https://a.com/x"),
    # sort query params
    ("https://a.com/x?b=2&a=1", "https://a.com/x?a=1&b=2"),
    # strip trailing slashes (reference main.py:473 rstrip semantics)
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/x///", "https://a.com/x"),
    # default port dropped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # blank query values kept
    ("https://a.com/x?a=", "https://a.com/x?a="),
    # path case preserved, host case folded
    ("https://A.com/CaseKept", "https://a.com/CaseKept"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_canonicalize_golden(raw, expected):
    assert canonicalize_one(raw) == expected


def test_canonicalize_idempotent():
    for raw, expected in GOLDEN:
        assert canonicalize_one(expected) == expected


def test_surt():
    assert surt_one("https://host0.example.com/page/1") == "com,example,host0)/page/1"
    assert surt_one("https://a.b.c/x?k=v") == "c,b,a)/x?k=v"


def test_canonicalize_udf_matches_scalar(spark):
    raws = [r for r, _ in GOLDEN]
    df = spark.createDataFrame([(r,) for r in raws], ["raw"])
    got = {
        r["raw"]: r["canon"]
        for r in df.select("raw", canonicalize_url(F.col("raw")).alias("canon")).collect()
    }
    for raw, expected in GOLDEN:
        assert got[raw] == expected


def test_redirect_flag(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/x", "https://a.com/x/", False),   # rstrip-equal
            ("https://a.com/x", "https://a.com/y", True),
            ("https://a.com/x/", "https://a.com/x", False),
        ],
        ["req", "fin", "expected"],
    )
    rows = df.select(
        redirect_flag(F.col("req"), F.col("fin")).alias("got"), "expected"
    ).collect()
    for r in rows:
        assert r["got"] == r["expected"]
