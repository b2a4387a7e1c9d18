"""LLM postprocess: JSON-salvage parsing golden cases + never-fail
containment (reference app/llm.py:26-90, 143-162; app/main.py:461-464)."""

from __future__ import annotations

import json

from volltextextraktion_selenium_md_spark.plans.llm import (
    CLS_META,
    extract_json_object,
    flatten_cleaned_markdown,
    postprocess_one,
    salvage,
    strip_code_fences,
)

PAYLOAD = {"cleaned_markdown": "# Clean", "classification": "Bildungsinhalt",
           "anonymized": True}
RAW = json.dumps(PAYLOAD)


def test_strip_code_fences_golden():
    assert strip_code_fences("```json\n{\"a\": 1}```") == '{"a": 1}'
    assert strip_code_fences("```\nplain```  ") == "plain"
    assert strip_code_fences("no fences here") == "no fences here"
    assert strip_code_fences("```python\nx=1\n```") == "x=1"


def test_extract_json_object_variants():
    assert extract_json_object(RAW) == PAYLOAD                       # direct
    assert extract_json_object(f"```json\n{RAW}```") == PAYLOAD      # fenced
    assert extract_json_object(f"Sure!\n{RAW}\nbye") == PAYLOAD      # chatter
    assert extract_json_object("not json at all") == {}
    assert extract_json_object("") == {}
    # brace block without the key falls through to the outer-span parse
    assert extract_json_object('x {"other": 1} y') == {"other": 1}


def test_flatten_cleaned_markdown_nested():
    # fenced value unwraps
    assert flatten_cleaned_markdown("```\n# T\n```") == "# T"
    # nested JSON with cleaned_markdown unwraps recursively once
    nested = json.dumps({"cleaned_markdown": "# Inner"})
    assert flatten_cleaned_markdown(nested) == "# Inner"
    assert flatten_cleaned_markdown("plain **md**") == "plain **md**"


def test_salvage_defaults_on_non_json():
    cleaned, cls, anon = salvage("ORIG", "free-form model text", True)
    assert cleaned == "free-form model text"   # content kept as markdown
    assert cls == CLS_META and anon is True    # defaults survive
    cleaned, cls, anon = salvage("ORIG", "", False)
    assert (cleaned, cls, anon) == ("ORIG", CLS_META, False)


def test_postprocess_never_fails_on_adversarial_markdown():
    """main.py:461-464: LLM errors never escalate. Brace-laden, fenced,
    and empty markdown must all produce a well-formed LLMResult."""
    adversarial = [
        "{not balanced",
        '{"cleaned_markdown": "trap"}',
        "``` fenced\nstuff\n```",
        "",
        "x" * 10000,
    ]
    for md in adversarial:
        for pid in range(5):
            out = postprocess_one(md, pid, error_page=False, anonymize=False)
            assert set(out) == {"cleaned_markdown", "classification",
                                "anonymized", "tokens_used"}
            assert isinstance(out["cleaned_markdown"], str)
            assert out["classification"] in (
                "Bildungsinhalt", "Metabeschreibung", "Fehler/Infoseite")


def test_llm_prompt_override():
    """Per-request llm_clean_prompt (reference schemas.py:194-226): a
    custom template steers the transport's transformation — its leading
    token replaces the default CLEANED marker; NULL/blank keeps the
    default; the salvage pipeline is unchanged."""
    from volltextextraktion_selenium_md_spark.plans.llm import prompt_tag

    assert prompt_tag(None) == "CLEANED"
    assert prompt_tag("   ") == "CLEANED"
    assert prompt_tag("SUMMARIZE the following") == "SUMMARIZE"
    out = postprocess_one("body text", 0, False, False,
                          prompt="SUMMARIZE the following")
    assert out["cleaned_markdown"] == "SUMMARIZE body text"
    out = postprocess_one("body text", 3, False, False, prompt="TRANSLATE x")
    assert out["cleaned_markdown"] == (
        "Here is the cleaned text:\nTRANSLATE body text"
    )
    out = postprocess_one("body text", 4, False, False, prompt="TRANSLATE x")
    assert out["cleaned_markdown"] == "body text"  # empty response: default
    out = postprocess_one("body text", 1, False, False)
    assert out["cleaned_markdown"] == "CLEANED body text"


def test_llm_postprocess_oracle_small(spark):
    """Spark stage == DuckDB oracle at sf0.001 (the gate re-runs at
    sf0.01)."""
    import duckdb

    from tests.conftest import SF_SMALL
    from volltextextraktion_selenium_md_spark import oracles
    from volltextextraktion_selenium_md_spark.graph import BASE_TABLES
    from volltextextraktion_selenium_md_spark.plans import queries as Q

    got = {
        r["page_id"]: (r["cleaned_markdown"], r["classification"],
                       r["anonymized"], r["tokens_used"])
        for r in Q.q_llm_postprocess(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(oracles.sql_llm_postprocess()).fetchall()
    }
    assert got == want and len(got) > 0


def test_engine_with_llm_struct_column(spark):
    """with_llm: the engine's conversions carry the LLMResult struct
    (CrawlResponse.llm shape) for every converted page; the cleaned
    markdown for parse-ok shapes is 'CLEANED ' + markdown."""
    from tests.conftest import SF_SMALL
    from volltextextraktion_selenium_md_spark.plans.frontier import CrawlEngine

    res = CrawlEngine(spark, SF_SMALL, with_convert=True, with_llm=True).run()
    rows = res.conversions.select(
        "page_id", "markdown", "llm_anonymize", "llm_postprocess", "llm.*"
    ).collect()
    assert len(rows) > 0
    anon_vals = set()
    gated = 0
    for r in rows:
        if not r["llm_postprocess"]:
            # per-request llm_postprocess gate (reference schemas.py:
            # 194-204, main.py:437-454): the request didn't ask for the
            # LLM, so the whole struct is NULL
            assert r["classification"] is None
            assert r["cleaned_markdown"] is None
            gated += 1
            continue
        assert r["classification"] in (
            "Bildungsinhalt", "Metabeschreibung", "Fehler/Infoseite")
        if r["page_id"] % 5 in (0, 1, 2):
            assert r["cleaned_markdown"] == "CLEANED " + r["markdown"]
            # per-request llm_anonymize (reference schemas.py:205,
            # main.py:445-457) rides the frontier -> convert -> LLM
            # chain: the parse-ok shapes echo the request flag back
            assert r["anonymized"] == bool(r["llm_anonymize"])
            anon_vals.add(bool(r["llm_anonymize"]))
        if r["page_id"] % 5 == 4:
            assert r["cleaned_markdown"] == r["markdown"]
            assert r["tokens_used"] is None
    # the seed graph mints MIXED anonymize AND llm_postprocess requests
    # (seed_idx % 3 = 1 / % 5 <> 2), so both branches really run
    assert anon_vals == {True, False}
    assert gated > 0
