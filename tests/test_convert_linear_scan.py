"""Equivalence + perf pins for the convert chain's linear tag-span
scanner (`plans/convert.py:_tag_spans`).

The lazy one-regex forms (`<tag ...>(.*?)</tag>`) re-scan from every
close-less open to end-of-string — O(n^2) on broken HTML, measured ~4x
wall per 2x input at tens of KB. The convert kernel runs these over
EVERY html payload, so the rewrite must match the regex semantics
exactly; hypothesis drives the equivalence over tag-fragment soup.
"""

from __future__ import annotations

import re
import string
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from volltextextraktion_selenium_md_spark.plans import convert as C

# the pre-rewrite regexes, kept as equivalence oracles
_LEGACY_NOSCRIPT = re.compile(r"<noscript\b.*?</noscript>", re.S | re.I)
_LEGACY_KMAP = re.compile(
    r"<script[^>]*id=['\"]embedded-topic['\"][^>]*>(.*?)</script>", re.S | re.I
)
_LEGACY_SCRIPT = re.compile(r"<script([^>]*)>(.*?)</script>", re.S | re.I)
_LEGACY_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.S | re.I)
_LEGACY_RSS = re.compile(r"<title>(.*?)</title>")

_atoms = st.one_of(
    st.sampled_from(
        [
            "<noscript>", "<noscript data-x>", "</noscript>", "</NOSCRIPT>",
            "<script>", "<script type='application/json'>",
            "<script id='embedded-topic'>", '<script id="embedded-topic" a=b>',
            "</script>", "</SCRIPT>", "<title>", "<title lang=de>",
            "</title>", "text", " ", "\n", "{", "}", '"d"', "<", ">",
            "<scripx>", "<titl>", "<noscrip>",
        ]
    ),
    st.text(alphabet=string.printable, max_size=6),
)
_soup = st.lists(_atoms, max_size=50).map("".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_noscript_strip_matches_legacy(html):
    assert C._strip_tag_spans(
        html, C._NOSCRIPT_OPEN_RE, C._NOSCRIPT_CLOSE_RE
    ) == _LEGACY_NOSCRIPT.sub("", html)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_script_spans_match_legacy_findall(html):
    got = [
        (m.group(1), html[bs:be])
        for m, bs, be, _e in C._tag_spans(
            html, C._SCRIPT_OPEN_RE, C._SCRIPT_CLOSE_RE
        )
    ]
    assert got == _LEGACY_SCRIPT.findall(html)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_kmap_first_span_matches_legacy_search(html):
    got = None
    for _m, bs, be, _e in C._tag_spans(html, C._KMAP_OPEN_RE, C._SCRIPT_CLOSE_RE):
        got = html[bs:be]
        break
    m = _LEGACY_KMAP.search(html)
    assert got == (m.group(1) if m else None)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_title_first_span_matches_legacy_search(html):
    got = None
    for _m, bs, be, _e in C._tag_spans(html, C._TITLE_OPEN_RE, C._TITLE_CLOSE_RE):
        got = html[bs:be]
        break
    m = _LEGACY_TITLE.search(html)
    assert got == (m.group(1) if m else None)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_rss_titles_match_legacy_findall(html):
    assert C._rss_titles(html) == _LEGACY_RSS.findall(html)


def test_linear_on_closeless_tags():
    """O(n^2) regression pin: 96 KB of close-less opens must scan fast
    (the lazy regexes took 2.8-5.1 s on these exact inputs)."""
    for frag, open_re, close_re in [
        ("<noscript>", C._NOSCRIPT_OPEN_RE, C._NOSCRIPT_CLOSE_RE),
        ("<script>", C._SCRIPT_OPEN_RE, C._SCRIPT_CLOSE_RE),
        ("<title>", C._TITLE_OPEN_RE, C._TITLE_CLOSE_RE),
    ]:
        html = frag * (96_000 // len(frag))
        t0 = time.time()
        assert list(C._tag_spans(html, open_re, close_re)) == []
        assert time.time() - t0 < 0.5, frag
    t0 = time.time()
    assert C._rss_titles("<title>x" * 12_000) == []
    assert time.time() - t0 < 0.5
