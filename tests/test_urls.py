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


def test_extract_links_one_edge_cases():
    """Reference extract_links_detailed parity cases (app/utils.py:
    126-155): document order, quote styles, empty/missing href skipped,
    nested markup stripped from text, whitespace collapsed, urljoin
    against the base, duplicate anchors preserved (first-seen dedup is
    downstream)."""
    from volltextextraktion_selenium_md_spark.functions.urls import (
        extract_links_one,
    )

    html = (
        "<html><body>"
        "<a href='https://x.com/a'>One</a>"
        '<a class="z" href="/rel">  Two\n  words </a>'
        "<a href=bare-quotes>Three</a>"
        "<a href=''>skipped-empty</a>"
        "<a name='anchor-no-href'>skipped-no-href</a>"
        "<a href='https://x.com/a'><b>Nested</b> <i>text</i></a>"
        "<A HREF='#frag'>Upper</A>"
        "</body></html>"
    )
    got = extract_links_one(html, "https://base.example.com/dir/page")
    assert got == [
        (1, "https://x.com/a", "One"),
        (2, "https://base.example.com/rel", "Two words"),
        (3, "https://base.example.com/dir/bare-quotes", "Three"),
        (4, "https://x.com/a", "Nested text"),
        (5, "https://base.example.com/dir/page#frag", "Upper"),
    ]
    # anchors with markup-only bodies yield text=None (reference:
    # get_text() or None)
    assert extract_links_one("<a href='/x'><img src='i.png'/></a>", None) == [
        (1, "/x", None)
    ]


def test_extract_links_one_ignores_dead_regions():
    """Round-3 ADVICE: anchor literals inside <script>, <style>, or
    <!-- comments --> are raw text to an HTML parser (BS4 parity) and
    must not feed the frontier; live anchors around them keep their
    document positions."""
    from volltextextraktion_selenium_md_spark.functions.urls import (
        extract_links_one,
    )

    html = (
        "<html><head>"
        "<script>var tpl = \"<a href='/from-script'>x</a>\";</script>"
        "<style>a::after { content: \"<a href='/from-style'>y</a>\"; }</style>"
        "</head><body>"
        "<a href='/live-1'>First</a>"
        "<!-- <a href='/from-comment'>z</a> -->"
        "<SCRIPT type='text/javascript'>document.write('<a href=/w>w</a>')</SCRIPT>"
        "<a href='/live-2'>Second</a>"
        "</body></html>"
    )
    got = extract_links_one(html, "https://base.example.com")
    assert got == [
        (1, "https://base.example.com/live-1", "First"),
        (2, "https://base.example.com/live-2", "Second"),
    ]


def test_extract_links_one_gt_inside_quoted_attr():
    """A '>' inside a QUOTED attribute value must not end the tag — a
    real HTML tokenizer only closes on an unquoted '>' (was a
    documented divergence through round 4; fixed by letting the
    attribute region consume quoted strings)."""
    from volltextextraktion_selenium_md_spark.functions.urls import (
        extract_links_one,
    )

    html = (
        '<a href="/x" title="a>b">X</a>'
        "<a title='c>d' href='/y'>Y</a>"
        '<a href="/z" data-q="1>2" class=plain>Z <b>bold</b></a>'
    )
    got = extract_links_one(html, "http://e.com/base/")
    assert got == [
        (1, "http://e.com/x", "X"),
        (2, "http://e.com/y", "Y"),
        (3, "http://e.com/z", "Z bold"),
    ]
