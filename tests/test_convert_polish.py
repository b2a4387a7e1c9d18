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
