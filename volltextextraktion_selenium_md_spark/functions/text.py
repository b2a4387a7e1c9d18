"""Text/markdown operators.

Two groups:
1. Conversion polish from the reference (`preserve_mathematical_content`
   / `enhance_table_structure`, ``app/converter.py:45-114``) — the math
   char map is an identity (no-op by construction); only its two regex
   rewrites have effect, so they become two `regexp_replace` columns.
2. Training-data text analysis (language-ID, quality scoring, token
   counting, fingerprinting) — native Column expressions so a 100 TB
   documents table never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- reference conversion polish -------------------------------------------

_MATH_EXPR_RE = r"\b([a-zA-Z]\([^)]*\)|[a-zA-Z][₀-₉⁰-⁹]*\s*[=+\-*/]\s*[^\s]+)"
_FORMULA_RE = r"([a-zA-Z][₀-₉⁰-⁹]*\s*=\s*[^\n]+)"


def preserve_math(text: Column) -> Column:
    """Backtick-wrap expressions, bold `lhs = rhs` formulas
    (``app/converter.py:76-84``; the ~70-entry symbol map at :48-70 maps
    every char to itself, so it is deliberately not materialized)."""
    out = F.regexp_replace(text, _MATH_EXPR_RE, r"`$1`")
    return F.regexp_replace(out, _FORMULA_RE, r"**$1**")


def enhance_table_structure_py(text: str) -> str:
    """Line-wise table separator injection (``app/converter.py:87-114``),
    used inside the convert `mapInPandas` stage (string ops on whole
    documents batch fine in Arrow; a higher-order-function rewrite would
    need posexplode + windows for no gain)."""
    lines = text.split("\n")
    enhanced: list[str] = []
    in_table = False
    for line in lines:
        if "|" in line and line.count("|") >= 2:
            if not in_table:
                in_table = True
                enhanced.append(line)
                cells = line.split("|")
                enhanced.append("|" + "|".join("---" for _ in range(len(cells) - 1)) + "|")
            else:
                enhanced.append(line)
        else:
            if in_table:
                in_table = False
                enhanced.append("")
            enhanced.append(line)
    return "\n".join(enhanced)


# --- training-pipeline text analysis ----------------------------------------

def token_count(text: Column) -> Column:
    """Whitespace tokenization; empty/blank string counts 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def distinct_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(t, r"\s+")))
    )


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def quality_score(text: Column) -> Column:
    """Structural quality in [0,1]: mixes length saturation, lexical
    diversity, and punctuation sanity. Deterministic double arithmetic,
    rounded to 4 dp so the DuckDB oracle hashes identically."""
    n = token_count(text).cast("double")
    d = distinct_token_count(text).cast("double")
    chars = F.length(text).cast("double")
    length_sat = F.least(chars / F.lit(500.0), F.lit(1.0))
    diversity = F.when(n > 0, d / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(chars > 0, punct_count(text) / chars).otherwise(F.lit(0.0))
    punct_sanity = F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_sat + F.lit(0.4) * diversity + F.lit(0.2) * punct_sanity, 4
    )


# tiny per-language stopword marker lists for the n-gram/stopword
# heuristic language ID (SURVEY-mandated training op; markers chosen to
# be disjoint across languages)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "for", "that"],
    "de": ["der", "die", "und", "nicht", "mit"],
    "fr": ["le", "la", "et", "les", "pour"],
    "es": ["el", "los", "que", "por", "una"],
}


def lang_score(text: Column, lang: str) -> Column:
    """Number of marker hits for `lang` as whole words."""
    t = F.lower(text)
    score = F.lit(0)
    for w in LANG_MARKERS[lang]:
        score = score + F.when(t.rlike(rf"\b{w}\b"), 1).otherwise(0)
    return score


def lang_id(text: Column) -> Column:
    """argmax over marker-hit scores; ties break in fixed language
    order (en, de, fr, es); zero hits -> 'unknown'."""
    scores = {lang: lang_score(text, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, "unknown")
    for lang in LANG_MARKERS:  # insertion order = tiebreak order
        expr = expr.when(scores[lang] == best, lang)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased whitespace-collapsed
    text — the exact-dedup key (md5 agrees between Spark and DuckDB)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
