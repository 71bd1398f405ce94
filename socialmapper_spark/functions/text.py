"""Text-analysis functions for training-data pipelines — pure Catalyst.

These extend the engine beyond the reference's operator set (per the
build mandate: language-ID, quality scoring, token counting, document
fingerprinting over a ``documents`` table). Every function is a column
expression with an exact ANSI-SQL twin, so each gets a DuckDB oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword inventories for the n-gram language heuristic. Matched as
# ' word '-padded substrings so both Spark and DuckDB evaluate identically.
EN_MARKERS = ["the", "and", "of", "to", "is", "in"]
ES_MARKERS = ["el", "la", "de", "que", "los", "una"]

# BPE-ish token regex: letter runs, digit runs, or single non-space symbol.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def token_count(text: Column) -> Column:
    """Whitespace token count: tokens in trim(text) split on /\\s+/."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via TOKEN_RE (letter/digit runs + symbols)."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def _marker_hits(text: Column, markers: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = [F.when(F.contains(padded, F.lit(f" {m} ")), 1).otherwise(0) for m in markers]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def language_id(text: Column) -> Column:
    """Heuristic language ID: 'en' vs 'es' by distinct marker-word presence,
    ties → 'en', no markers at all → 'und'."""
    en = _marker_hits(text, EN_MARKERS)
    es = _marker_hits(text, ES_MARKERS)
    return (
        F.when((en == 0) & (es == 0), F.lit("und"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Quality heuristics: char/word counts, alpha & punct ratios, and a
    composite [0,1] score. All double-typed for oracle hashing stability."""
    n_chars = F.length(text).cast("double")
    n_words = token_count(text).cast("double")
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    avg_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    score = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            alpha_ratio * F.lit(0.7)
            + F.least(n_words / F.lit(100.0), F.lit(1.0)) * F.lit(0.3)
            - punct_ratio * F.lit(0.5),
        ),
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "avg_word_len": avg_word_len,
        "quality_score": score,
    }


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint: md5 of the
    whitespace-normalized lowercased text. md5 exists in both Spark and
    DuckDB, so exact-dup detection has a direct SQL oracle."""
    norm = F.lower(F.regexp_replace(F.trim(text), "\\s+", " "))
    return F.md5(norm)
