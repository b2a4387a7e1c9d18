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


from volltextextraktion_selenium_md_spark.functions import features as FF
from volltextextraktion_selenium_md_spark.functions.text import strip_spans, strip_tags

_LEGACY_TAG = re.compile(r"<[^>]+>")
_LEGACY_SKIP = re.compile(r"<(script|style|noscript)\b.*?</\1\s*>", re.S | re.I)
_LEGACY_DEAD = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->", re.S | re.I
)
_LEGACY_JS_HINT = re.compile(
    r"<[^>]+(?:id|class)=['\"]?[^'\">]*(?:no-?js|js-disabled|enable-js|javascript)[^'\">]*['\"]?[^>]*>.{0,200}?</[^>]+>",
    re.S | re.I,
)

_tag_atoms = st.one_of(
    st.sampled_from(
        [
            "<", ">", "<>", "<a>", "<a", "a>", "</div>", "text", " ", "\n",
            "<style>", "</style>", "<STYLE >", "<!--", "-->", "<!-- c -->",
            "<script>", "</script >", "<noscript>", "</noscript>",
            '<div id="no-js">', "<p class='enable-js x'>", "<i id=javascript>",
            '<q class="js-disabled">', "</p>", "</i>", "</q>", "</>",
        ]
    ),
    st.text(alphabet=string.printable, max_size=6),
)
_tag_soup = st.lists(_tag_atoms, max_size=50).map("".join)


@settings(max_examples=300, deadline=None)
@given(_tag_soup)
def test_strip_tags_matches_legacy(s):
    assert strip_tags(s) == _LEGACY_TAG.sub(" ", s)


@settings(max_examples=300, deadline=None)
@given(_tag_soup)
def test_skip_block_strip_matches_legacy_backref(s):
    got = strip_spans(
        s, FF._SKIP_OPEN_RE, FF._SKIP_CLOSE_RES, lambda m: m.group(1).lower()
    )
    assert got == _LEGACY_SKIP.sub(" ", s)


@settings(max_examples=300, deadline=None)
@given(_tag_soup)
def test_dead_region_strip_matches_legacy_alternation(s):
    import volltextextraktion_selenium_md_spark.functions.urls as U

    U.extract_links_one("", "")  # force _A_TAG_RE init
    _, _, dead_open_re, dead_close_res, _ = U._A_TAG_RE

    def kind(m):
        t = m.group(0).lower()
        return "script" if t == "<script" else (
            "style" if t == "<style" else "comment"
        )

    got = strip_spans(s, dead_open_re, dead_close_res, kind)
    assert got == _LEGACY_DEAD.sub(" ", s)


@settings(max_examples=400, deadline=None)
@given(_tag_soup)
def test_js_hint_strip_matches_legacy(s):
    assert C._strip_js_hints(s) == _LEGACY_JS_HINT.sub("", s)


def test_math_bound_golden():
    """The {0,300} argument bound changes nothing for real formulas and
    keeps adversarial 'a(a(a(' markdown linear; the oracle imports this
    exact pattern so the two engines stay aligned by construction."""
    assert C._MATH_EXPR_RE.sub(r"`\1`", "E = mc2 and f(x) applies") == (
        "`E = mc2` and `f(x)` applies"
    )
    big = "a(" * 30_000
    t0 = time.time()
    C._MATH_EXPR_RE.sub(r"`\1`", big)
    assert time.time() - t0 < 1.0


def test_js_hint_linear_on_gtless_html():
    """The old _JS_HINT_RE took 21 s on 60 KB of '<a ' repeats (no '>'
    anywhere: every '<' re-scanned to end-of-string)."""
    html = "<a " * 20_000  # 60 KB
    t0 = time.time()
    assert C._strip_js_hints(html) == html
    assert time.time() - t0 < 0.5


def test_visible_text_linear_on_closeless_scripts():
    html = "<script>" * 12_000  # 96 KB
    t0 = time.time()
    assert FF.visible_text(html) == ""
    assert time.time() - t0 < 0.5


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


def test_linear_on_close_before_closeless_opens():
    """One close tag AHEAD of '>'-less open soup passes the
    empty-closes guard, so every failed open attempt used to rescan
    toward end-of-string (unbounded [^>]* in the OPEN patterns:
    measured 19 s / 200 KB, 79 s / 400 KB). The last-close scan bound
    plus the {0,4096} attr caps make it linear; the yielded spans are
    unchanged (none — no close at/after any open)."""
    for close, soup, open_re, close_re in [
        ("</script>", "<script x ", C._SCRIPT_OPEN_RE, C._SCRIPT_CLOSE_RE),
        ("</script>", "<script x ", C._KMAP_OPEN_RE, C._SCRIPT_CLOSE_RE),
        ("</title>", "<title x ", C._TITLE_OPEN_RE, C._TITLE_CLOSE_RE),
        ("</noscript>", "<noscript x ", C._NOSCRIPT_OPEN_RE, C._NOSCRIPT_CLOSE_RE),
    ]:
        html = close + soup * 20_000  # ~200 KB
        t0 = time.time()
        assert list(C._tag_spans(html, open_re, close_re)) == []
        assert time.time() - t0 < 0.5, (close, soup)


def test_base_href_linear_on_gtless_soup():
    """_BASE_HREF_RE.search over '<base x '-soup with no '>' was the
    same unbounded-[^>]* class; the attr cap bounds each attempt."""
    html = "<base x " * 20_000  # 160 KB, no href, no '>'
    t0 = time.time()
    assert C._BASE_HREF_RE.search(html) is None
    assert time.time() - t0 < 2.0


def test_js_hint_requires_char_between_lt_and_attr():
    """Legacy _JS_HINT_RE required >=1 char between '<' and id|class=
    ('<[^>]+(?:id|class)='); a hint attribute starting immediately
    after '<' must NOT strip."""
    assert C._strip_js_hints("<id=no-js>x</p>") == "<id=no-js>x</p>"
    assert C._strip_js_hints("<class=no-js>x</p>") == "<class=no-js>x</p>"
    # ...while a real hint container one char later still strips
    assert C._strip_js_hints("<p id=no-js>x</p>") == ""
