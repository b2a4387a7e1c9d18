"""URL canonicalization / host helpers.

The reference compares URLs only loosely — ``rstrip('/')`` equality for
the redirect flag (``app/main.py:473``) and hostname equality for
internal/external (``app/utils.py:70-77``). The north rule upgrades
this to a real canonical form: lowercase scheme+host, strip fragment,
sort query params, drop default ports, strip trailing slashes, plus a
SURT form for prefix-ordered storage.

Canonicalization and urljoin run as Arrow-vectorized pandas UDFs (no
JVM equivalent exists); everything else is a native Column expression
so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize_one(url: str | None) -> str | None:
    """RFC3986-style canonical form (pure-Python scalar; shared by the
    pandas UDF and the golden replay crawler so both sides agree)."""
    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
        netloc = host
        if port is not None and _DEFAULT_PORTS.get(scheme) != port:
            netloc = f"{host}:{port}"
        # the canonical form must be a FIXED POINT: a stored canonical
        # URL that re-canonicalizes to a different string hashes
        # differently and defeats the seen set on the service/resume
        # path. Three re-parse asymmetries found by property fuzzing
        # (pinned in tests/test_url_properties.py):
        # 1. trailing '/'+whitespace mixes in the path — dropping the
        #    fragment exposes them at end-of-string where the NEXT
        #    parse's input strip would eat them ('http://h/p/ #f');
        #    strip the mix here, not just trailing slashes
        path = parts.path
        while path and (path[-1] == "/" or path[-1].isspace()):
            path = path[:-1]
        # 2. empty netloc with a path starting '//' ('http:////x',
        #    'http://user@//x'): urlunsplit's '//' re-prefix makes the
        #    next parse read the path head as a netloc — collapse the
        #    leading run to one '/'
        if not netloc and path.startswith("//"):
            path = "/" + path.lstrip("/")
        query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
        # 3. dropping the fragment/query can expose whitespace at the
        #    end of the reassembled string that the input-side strip
        #    could not see — strip the OUTPUT too
        return urlunsplit((scheme, netloc, path, query, "")).strip()
    except (ValueError, AttributeError):
        return url


def surt_one(url: str | None) -> str | None:
    """SURT (Sort-friendly URI Reordering Transform) of the canonical
    form: reversed host labels + path, e.g.
    ``https://host0.example.com/page/1`` -> ``com,example,host0)/page/1``."""
    if url is None:
        return None
    canon = canonicalize_one(url)
    try:
        parts = urlsplit(canon)
        host = ",".join(reversed((parts.hostname or "").split(".")))
        tail = parts.path or ""
        if parts.query:
            tail += "?" + parts.query
        return f"{host}){tail}"
    except (ValueError, AttributeError):
        return canon


@pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_one)


@pandas_udf(StringType())
def surt_url(urls: pd.Series) -> pd.Series:
    return urls.map(surt_one)


@pandas_udf(StringType())
def url_join(base: pd.Series, href: pd.Series) -> pd.Series:
    """Absolutize hrefs against their page URL (reference
    ``app/utils.py:46``: ``urljoin(base_url, href)`` per anchor)."""
    return pd.Series(
        [urljoin(b, h) if (b and h) else h for b, h in zip(base, href)]
    )


_A_TAG_RE = None  # compiled lazily (module import stays regex-free)


def extract_links_one(html: str, base_url: str) -> list[tuple[int, str, str | None]]:
    """Anchor extraction from HTML bytes in DOCUMENT ORDER, mirroring
    the reference's ``extract_links_detailed_from_html``
    (``app/utils.py:126-155``: BS4 ``find_all('a', href=True)``, href
    stripped, text collapsed, ``urljoin(base_url, href)``). Returns
    1-based ``(doc_pos, absolute_url, text)`` — doc_pos is the anchor's
    ORIGINAL document position; per-page dedup is NOT done here (the
    engine's first-seen dedup downstream keeps the first occurrence,
    which is exactly the reference's order-preserving set walk).

    Script/style/comment regions are stripped FIRST (round-3 ADVICE):
    BS4 treats their contents as raw text, so an ``<a href>`` literal
    inside ``<script>``, ``<style>``, or ``<!-- -->`` is NOT a live
    link and must not feed the frontier. The attribute region accepts
    quoted strings containing ``>`` (``title="a>b"``) — matching how a
    real HTML tokenizer only ends the tag on an unquoted ``>``."""
    global _A_TAG_RE
    import re
    from bisect import bisect_left

    if _A_TAG_RE is None:
        _A_TAG_RE = (
            # open tag only — a single anchor's body is NOT spanned by
            # the regex. The old one-regex form
            # (<a ...>(.*?)</a\s*>) re-scanned from every unclosed
            # anchor to end-of-string: O(n^2) on broken HTML (measured
            # 1.2 s at 48 KB, 5.1 s at 96 KB of close-less <a> tags —
            # a multi-minute executor stall per ~1 MB page on the live
            # path). Open tags + one linear close-tag sweep + bisect
            # keeps identical matches in linear time.
            re.compile(r"""<a\b((?:[^>"']|"[^"]*"|'[^']*')*)>""", re.S | re.I),
            re.compile(r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I),
            re.compile(r"<[^>]+>"),
            re.compile(
                r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
                re.S | re.I,
            ),
            re.compile(r"</a\s*>", re.I),
        )
    a_open_re, href_re, tag_re, dead_re, a_close_re = _A_TAG_RE
    html = dead_re.sub(" ", html)
    # all close-tag positions up front (linear), consumed in order via
    # bisect — mirrors the old lazy match exactly: an anchor's body
    # runs to the FIRST close tag at/after its open tag's '>', the
    # matched span is consumed (opens inside a matched body do not
    # start a new match), and an open with no remaining close emits
    # nothing
    closes = [(m.start(), m.end()) for m in a_close_re.finditer(html)]
    out = []
    pos = 0
    cursor = 0
    for m in a_open_re.finditer(html):
        if m.start() < cursor:
            continue  # inside a previously matched anchor span
        i = bisect_left(closes, (m.end(), -1))
        if i == len(closes):
            break  # no close tag left: nothing further can match
        body_end, cursor = closes[i]
        hm = href_re.search(m.group(1))
        if hm is None:
            continue
        href = (hm.group(1) or hm.group(2) or hm.group(3) or "").strip()
        if not href:
            continue
        pos += 1
        text = " ".join(tag_re.sub(" ", html[m.end():body_end]).split()) or None
        out.append((pos, urljoin(base_url, href) if base_url else href, text))
    return out


def url_host(col: Column | str) -> Column:
    """Hostname of a URL, lowercased (reference uses
    ``urlparse(...).hostname``, which lowercases)."""
    return F.lower(F.parse_url(F.col(col) if isinstance(col, str) else col, F.lit("HOST")))


def url_path(col: Column | str) -> Column:
    return F.parse_url(F.col(col) if isinstance(col, str) else col, F.lit("PATH"))


def is_internal(link: Column, base: Column) -> Column:
    """Hostname equality (reference ``app/utils.py:70-77``)."""
    return url_host(link) == url_host(base)


def redirect_flag(requested: Column, final: Column) -> Column:
    """``final_url.rstrip('/') != requested_url.rstrip('/')``
    (reference ``app/main.py:473``)."""
    return (
        F.regexp_replace(final, r"/+$", "") != F.regexp_replace(requested, r"/+$", "")
    )


def url_hash(col: Column | str) -> Column:
    """xxhash64 of the canonical URL — seen-set / bloom key.

    Computed JVM-side (vectorized, no Python); pair with
    ``url_hash2`` for the bloom filter's double-hashing scheme."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)


def url_hash2(col: Column | str) -> Column:
    return F.xxhash64(F.col(col) if isinstance(col, str) else col, F.lit(0x9E3779B9))
