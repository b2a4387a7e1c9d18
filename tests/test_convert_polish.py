"""C4 math / C5 table polish golden strings (reference
app/converter.py:45-114) + C8 circuit-breaker trip through the real
convert_stage."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from volltextextraktion_selenium_md_spark.functions.text import (
    enhance_table_structure_py,
    preserve_math,
)
from volltextextraktion_selenium_md_spark.plans.convert import _polish


def test_math_polish_golden():
    """converter.py:76-84: backtick function-call expressions; the
    formula pass then bolds from the first letter-equals to the end of
    line — INCLUDING backticks the first pass already inserted (the
    reference applies the same two subs in the same order, so the
    nesting artifact is part of the contract)."""
    assert _polish("velocity v(t) changes") == "velocity `v(t)` changes"
    assert _polish("E = mc2 and more") == "`**E = mc2` and more**"
    assert _polish("x₁ = 7") == "`**x₁ = 7`**"
    assert _polish("no math here at all") == "no math here at all"


def test_math_polish_column_matches_python(spark):
    """The Column variant (functions/text.py:preserve_math) must agree
    with the in-stage Python regexes on every golden case — closes the
    'Column variant unused' gap."""
    cases = [
        "velocity v(t) changes",
        "E = mc2 and more",
        "x₁ = 7",
        "no math here at all",
        "mix f(y) then a = b",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["t"]).select(
        "t", preserve_math(F.col("t")).alias("m")
    )
    got = {r["t"]: r["m"] for r in df.collect()}
    from volltextextraktion_selenium_md_spark.plans.convert import (
        _FORMULA_RE,
        _MATH_EXPR_RE,
    )

    for c in cases:
        want = _FORMULA_RE.sub(r"**\1**", _MATH_EXPR_RE.sub(r"`\1`", c))
        assert got[c] == want


def test_table_polish_golden():
    """converter.py:87-114: inject |---| separator after the first row
    of a run of |-lines; blank line closes the table."""
    got = enhance_table_structure_py("intro\n| a | b |\n| 1 | 2 |\nafter")
    assert got == "intro\n| a | b |\n|---|---|---|\n| 1 | 2 |\n\nafter"
    # table at end of document: no trailing blank line
    assert enhance_table_structure_py("| x | y |") == "| x | y |\n|---|---|---|"
    # single pipe is NOT a table row
    assert enhance_table_structure_py("a | b") == "a | b"
    # two separate tables each get their own separator
    got2 = enhance_table_structure_py("| a | b |\ntext\n| c | d |")
    assert got2 == "| a | b |\n|---|---|---|\n\ntext\n| c | d |\n|---|---|---|"


def test_breaker_trips_through_convert_stage(spark):
    """C8 (converter.py:32-36, 316-334): >=5 unexpected heavy-tier
    failures disable that tier for the REST OF THE PARTITION. Six
    poison pages raise inside tier 1; after the fifth failure the
    breaker opens, so later GOOD pages (which a fresh breaker converts
    via 'main') must come out as 'full'."""
    from volltextextraktion_selenium_md_spark.plans.convert import (
        _extract,
        convert_stage,
    )

    def poison_extractor(html, main_only):
        m = re.search(r"<title>page (\d+)</title>", html)
        if main_only and m and 1 <= int(m.group(1)) <= 6:
            raise RuntimeError("poison")
        return _extract(html, main_only)

    rows = [
        # six poison rows first (pids 1-6; 0 is a kmap page), then good rows with plenty
        # of main text
        (f"u{pid}", pid, "text/html; charset=utf-8", 600, True,
         False, False, False, False, False)
        for pid in list(range(1, 7)) + list(range(1000, 1010))
    ]
    cols = ["url", "page_id", "content_type", "text_len", "has_main",
            "spa_mark", "js_required", "consent", "bot_wall", "rss_link"]
    df = spark.createDataFrame(rows, cols).coalesce(1)

    clean = {r["page_id"]: r["converter_used"]
             for r in convert_stage(df).collect()}
    assert all(v == "main" for v in clean.values())  # sanity: all convert fine

    poisoned = {r["page_id"]: r["converter_used"]
                for r in convert_stage(df, extractor=poison_extractor).collect()}
    # poison rows fall through to the 'full' tier (error isolated, C9)
    assert all(poisoned[p] == "full" for p in range(1, 7))
    # breaker opened after 5 failures: good pages no longer reach tier 1
    assert all(poisoned[p] == "full" for p in range(1000, 1010))


def test_kmap_attachments_golden():
    """C3 attachment parity (reference _extract_kmap_markdown,
    app/converter.py:416-641): headers from subject/chapter/title,
    inline: refs (attr + bare) rewritten through the attachments map
    against <base>, tag-based sections in fixed order, Anhänge for
    untagged attachments unless already linked in the description."""
    import json

    from volltextextraktion_selenium_md_spark.plans.convert import _kmap_markdown

    topic = {
        "title": "Kraftbegriff",
        "chapter": "Mechanik",
        "subject": "Physik",
        "description": (
            "<p>Die Kraft <img src=\"inline:kraft.png\"> wirkt. "
            "Siehe inline:skizze.png und inline:unknown.png.</p>"
        ),
        "attachments": [
            {"file": "kraft.png", "href": "files/kraft.png",
             "name": "Kraftdiagramm", "tag": "explanation"},
            {"file": "skizze.png", "href": "files/skizze.png",
             "name": "Skizze", "tag": "idea"},
            {"file": "versuch.mp4", "href": "files/versuch.mp4",
             "name": "Versuchsvideo", "tag": "usage"},
            {"file": "linked.pdf", "href": "files/linked.pdf",
             "name": "Verlinkt", "tag": ""},  # skipped: href in desc? no
            {"file": "extra.pdf", "href": "files/extra.pdf",
             "name": "Extra", "tag": "misc"},  # unknown tag -> Anhänge
        ],
    }
    # make the 4th attachment's file appear quoted in the description so
    # the skip rule fires for it
    topic["description"] += ' <span data-f="linked.pdf"></span>'
    html = (
        "<html><head><title>ignored</title><base href='/app/'></head>"
        "<body><script id='embedded-topic' type='application/json'>"
        + json.dumps(topic)
        + "</script><main>x</main></body></html>"
    )
    md = _kmap_markdown(html)
    assert md is not None
    # headers: subject as H1, chapter–title as H2 (en dash)
    assert md.startswith("# Physik\n## Mechanik – Kraftbegriff")
    # inline attr + bare refs rewritten against <base href='/app/'>
    assert "inline:kraft.png" not in md.split("**")[0]
    assert "/app/files/skizze.png" in md
    # unknown file keeps its inline: marker
    assert "inline:unknown.png" in md
    # tagged sections, reference order and titles
    i_erk = md.index("**Erklärungen**")
    i_vor = md.index("**Vorstellung**")
    i_anw = md.index("**Anwendungen**")
    i_anh = md.index("**Anhänge**")
    assert i_erk < i_vor < i_anw < i_anh
    assert "- [Kraftdiagramm](/app/files/kraft.png)" in md
    assert "- [Skizze](/app/files/skizze.png)" in md
    assert "- [Versuchsvideo](/app/files/versuch.mp4)" in md
    # 'linked.pdf' appears quoted in the description -> skipped from
    # Anhänge; unknown-tag 'extra.pdf' lands there
    assert "- [Extra](/app/files/extra.pdf)" in md
    assert "Verlinkt" not in md


def test_kmap_no_base_defaults_to_root():
    import json

    from volltextextraktion_selenium_md_spark.plans.convert import _kmap_markdown

    topic = {
        "title": "T",
        "description": "<p>d <img src=\"inline:a.png\"></p>",
        "attachments": [
            {"file": "a.png", "href": "files/a.png", "name": "A",
             "tag": "usage"},
        ],
    }
    html = (
        "<html><body><script id='embedded-topic' type='json'>"
        + json.dumps(topic) + "</script></body></html>"
    )
    md = _kmap_markdown(html)
    assert "- [A](/files/a.png)" in md


def test_kmap_ldjson_scan_and_salvage():
    """Universal scan: ld+json mainEntity payloads qualify; the
    embedded-topic tag tolerates CDATA/comment wrappers via the
    balanced-object salvage (converter.py:432-446)."""
    import json

    from volltextextraktion_selenium_md_spark.plans.convert import _kmap_payload

    ld = {"mainEntity": {"articleBody": "body text", "headline": "H"}}
    html = (
        "<html><script type='application/ld+json'>" + json.dumps(ld)
        + "</script></html>"
    )
    got = _kmap_payload(html)
    assert got == ld["mainEntity"]

    wrapped = (
        "<html><script id='embedded-topic' type='json'>/*<![CDATA[*/ "
        + json.dumps({"description": "x"}) + " /*]]>*/</script></html>"
    )
    assert _kmap_payload(wrapped) == {"description": "x"}


def test_kmap_small_fragment_forces_full_tier():
    """converter.py:199-204: a parsed-but-tiny embedded payload forces
    the full-DOM tier, overriding a per-request html_converter."""
    import json

    from volltextextraktion_selenium_md_spark.plans.convert import (
        _Breaker,
        convert_bytes,
    )

    html = (
        "<html><head><title>t</title></head><body>"
        "<script id='embedded-topic' type='json'>"
        + json.dumps({"description": "<p>tiny</p>"})
        + "</script><main><p>"
        + ("content " * 30)
        + "</p></main></body></html>"
    ).encode()
    _, conv, _ = convert_bytes(3, "text/html", html, _Breaker(), 1 << 20)
    assert conv == "full"  # not 'main', despite a qualifying <main>
    _, conv, _ = convert_bytes(
        3, "text/html", html, _Breaker(), 1 << 20, forced_converter="strip"
    )
    assert conv == "full"  # the tiny-fragment override beats forced


def test_body_text_cycle_equals_word_loop():
    """_body_text's precomputed-cycle fast path (round-6: the word loop
    was 62% of the scale-64 convert profile) must equal the reference
    word-by-word construction exactly — including the sliced-trailing-
    space -> 'x' fix and the L=0 empty case."""
    from volltextextraktion_selenium_md_spark.plans.convert import (
        _WORDS,
        _body_text,
    )

    def loop_body(page_id: int, text_len: int) -> str:
        words, total, i = [], 0, 0
        while total <= text_len:
            w = _WORDS[(page_id + i * 7) % len(_WORDS)]
            words.append(w)
            total += len(w) + 1
            i += 1
        body = " ".join(words)[:text_len] if text_len > 0 else ""
        if body.endswith(" "):
            body = body[:-1] + "x"
        return body

    for pid in (0, 1, 7, 15, 16, 31, 434, 99991):
        for L in (0, 1, 3, 4, 5, 99, 100, 101, 200, 900, 1599, 1600 * 64):
            assert _body_text(pid, L) == loop_body(pid, L), (pid, L)


def test_polish_gate_is_exact():
    """The [=+-*/(] pre-gate and the '|' table gate skip work only when
    the subs/enhancer are identities — outputs must match the ungated
    composition on gated AND non-gated inputs."""
    from volltextextraktion_selenium_md_spark.functions.text import (
        enhance_table_structure_py,
    )
    from volltextextraktion_selenium_md_spark.plans.convert import (
        _FORMULA_RE,
        _MATH_EXPR_RE,
        _polish,
    )

    def ungated(t: str) -> str:
        t = _MATH_EXPR_RE.sub(r"`\1`", t)
        t = _FORMULA_RE.sub(r"**\1**", t)
        return enhance_table_structure_py(t)

    cases = [
        "",
        "plain lowercase words only",
        "E = mc2 and f(x) applies",
        "| a | b |\n| 1 | 2 |",
        "x\n\n| a | b |\n| 1 | 2 |\n\nE = mc2 and f(x) applies",
        "- [Att 310-0](/files/310_0.png)",
        "window.__NEXT_DATA__={}",
        "a+b then c/d then e*f",
        "pipe | once",
    ]
    for t in cases:
        assert _polish(t) == ungated(t), repr(t)


def test_live_image_rows_emit_payload_table_rows(spark):
    """Live mode (payload_col set) decodes the REAL fetched bytes into
    the payload-table columns: bytes verbatim, w/h/fmt/phash from the
    decoded pixels, deterministic caption stand-in; undecodable bytes
    (corrupt or max_bytes-truncated) emit markdown via the containment
    path but NO payload row. page_id is NULL live -> md5 surrogate."""
    import hashlib

    from volltextextraktion_selenium_md_spark import codec
    from volltextextraktion_selenium_md_spark.plans.convert import convert_stage

    arr = codec.synth_image(5, w=48, h=32)
    good = codec.encode(arr, "png")
    rows = [
        ("http://a.example.com/i.png", None, "image/png", bytearray(good)),
        ("http://a.example.com/bad.png", None, "image/png", bytearray(b"nope")),
        ("http://a.example.com/p.html", None, "text/html; charset=utf-8",
         bytearray(b"<html><body><main><p>hello world</p></main></body></html>")),
    ]
    df = spark.createDataFrame(
        rows, "url string, page_id long, content_type string, payload binary"
    )
    got = {r["url"].rsplit("/", 1)[1]: r
           for r in convert_stage(df, payload_col="payload").collect()}

    surrogate = int.from_bytes(
        hashlib.md5(b"http://a.example.com/i.png").digest()[:8], "big"
    ) >> 1
    live = got["i.png"]
    assert live["image_id"] == f"img-{surrogate}"
    assert bytes(live["image_bytes"]) == good  # fetched bytes verbatim
    assert (live["w"], live["h"], live["fmt"]) == (48, 32, "png")
    assert live["phash"] == codec.average_hash(arr)
    assert live["caption"] == codec.synth_caption(surrogate)
    assert live["converter_used"] == "image"

    # corrupt image: contained, no payload row
    assert got["bad.png"]["image_id"] is None
    assert got["bad.png"]["converter_used"] == "error"
    # non-image live rows never get payload columns
    assert got["p.html"]["image_id"] is None
