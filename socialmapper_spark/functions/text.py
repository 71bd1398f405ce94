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

# Stopword inventories for the language heuristic. Matched as ' word '-
# padded substrings so both Spark and DuckDB evaluate identically.
EN_MARKERS = ["the", "and", "of", "to", "is", "in"]
ES_MARKERS = ["el", "la", "de", "que", "los", "una"]

# --- deterministic ≥10-language classifier tables ---------------------------
# Latin-script languages: distinctive high-frequency stopwords per language
# (shared words like 'de' deliberately avoided where possible; residual
# overlaps resolve by the documented priority order). Non-Latin languages:
# Unicode script ranges counted per character.
LATIN_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "was", "that", "with", "this"],
    "es": ["que", "los", "las", "una", "para", "como"],
    "fr": ["les", "des", "est", "dans", "pour", "une"],
    "de": ["der", "und", "nicht", "das", "ein", "ist"],
    "it": ["che", "della", "per", "sono", "anche", "gli"],
    "pt": ["não", "uma", "com", "mais", "são", "você"],
    "nl": ["het", "van", "een", "niet", "met", "voor"],
}
LATIN_PRIORITY = ["en", "es", "fr", "de", "it", "pt", "nl"]

SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "ja": [(0x3040, 0x309F), (0x30A0, 0x30FF)],  # hiragana + katakana
    "ko": [(0xAC00, 0xD7AF)],  # hangul syllables
    "zh": [(0x4E00, 0x9FFF)],  # CJK unified (after the kana test — Japanese
    #                            text contains kanji, so kana wins first)
    "ru": [(0x0400, 0x04FF)],  # cyrillic
    "el": [(0x0370, 0x03FF)],  # greek
    "he": [(0x0590, 0x05FF)],  # hebrew
    "ar": [(0x0600, 0x06FF)],  # arabic
    "hi": [(0x0900, 0x097F)],  # devanagari
}
SCRIPT_PRIORITY = ["ja", "ko", "zh", "ru", "el", "he", "ar", "hi"]
SCRIPT_MIN_CHARS = 2  # one stray char must not flip a Latin document


def script_char_class(lang: str) -> str:
    """Regex char class for a script language — literal range characters,
    valid in BOTH Java regex (Spark) and RE2 (DuckDB)."""
    return "[" + "".join(
        f"{chr(a)}-{chr(b)}" for a, b in SCRIPT_RANGES[lang]
    ) + "]"

# BPE-ish token regex: letter runs, digit runs, or single non-space symbol.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def token_count(text: Column) -> Column:
    """Whitespace token count: tokens in trim(text) split on /\\s+/."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, "\\s+")))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via TOKEN_RE (letter/digit runs + symbols).

    PROXY DIVERGENCE NOTE: this is a pre-tokenization segment count, not
    a vocab-driven BPE merge count. Relative to a real BPE tokenizer
    (tiktoken/sentencepiece — no wheel ships in this container, so the
    real count can't be wired behind this API here) it UNDERCOUNTS long
    or rare words (one letter-run here, several subword merges there)
    and matches exactly on text whose words are all in-vocab single
    tokens; digits count one-per-run here vs per-digit-ish under e.g.
    cl100k_base. Directionally: proxy_count ≤ real_BPE_count on natural
    text. Sizing corpora by this proxy is fine for RELATIVE comparisons
    (the bias is text-uniform); absolute token budgets need the real
    tokenizer. ``tests/test_round4_ops.py::test_bpe_proxy_divergence``
    pins known proxy-vs-real counts so the documented bias can't drift.
    """
    return F.regexp_count(text, F.lit(TOKEN_RE))


def _marker_hits(text: Column, markers: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = [F.when(F.contains(padded, F.lit(f" {m} ")), 1).otherwise(0) for m in markers]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def language_id(text: Column) -> Column:
    """Deterministic 15-language classifier (training-data language gate),
    pure Catalyst with an exact DuckDB SQL twin:

    1. Script pass — count characters per Unicode script range; the first
       script in SCRIPT_PRIORITY with ≥ SCRIPT_MIN_CHARS wins (kana
       before CJK so Japanese beats the kanji it shares with Chinese).
    2. Latin pass — per-language distinct-stopword hits; winner = the
       FIRST language in LATIN_PRIORITY achieving the maximum hit count
       (argmax with earlier-priority tie-break), provided the max > 0.
       Expressed as array_max + array_position over ONE hits array so
       each language's hit count appears once — the pairwise-comparison
       form duplicates every count O(L²) times and blows whole-stage
       codegen past janino's 64KB method limit (silent fallback to
       interpreted eval, a real throughput cliff on a corpus-scale gate).
    3. Nothing matched → 'und'.
    """
    out = None
    for lang in SCRIPT_PRIORITY:
        cnt = F.regexp_count(text, F.lit(script_char_class(lang)))
        cond = cnt >= SCRIPT_MIN_CHARS
        out = F.when(cond, F.lit(lang)) if out is None else out.when(cond, F.lit(lang))
    hits_arr = F.array(*[_marker_hits(text, LATIN_MARKERS[lang]) for lang in LATIN_PRIORITY])
    mx = F.array_max(hits_arr)
    pick = F.element_at(
        F.array(*[F.lit(lang) for lang in LATIN_PRIORITY]),
        F.array_position(hits_arr, mx).cast("int"),
    )
    return out.when(mx > 0, pick).otherwise(F.lit("und"))


def language_id_sql(text_expr: str = "text") -> str:
    """The DuckDB twin of :func:`language_id`, generated from the SAME
    marker/range tables so the two dialects cannot drift."""
    branches = []
    for lang in SCRIPT_PRIORITY:
        pat = script_char_class(lang).replace("'", "''")
        branches.append(
            f"when len(regexp_extract_all({text_expr}, '{pat}')) >= "
            f"{SCRIPT_MIN_CHARS} then '{lang}'"
        )

    def hits_sql(lang: str) -> str:
        parts = [
            "(case when contains(' ' || lower(" + text_expr + ") || ' ', ' "
            + m.replace("'", "''")
            + " ') then 1 else 0 end)"
            for m in LATIN_MARKERS[lang]
        ]
        return "(" + " + ".join(parts) + ")"

    arr = "[" + ", ".join(hits_sql(lang) for lang in LATIN_PRIORITY) + "]"
    names = "[" + ", ".join(f"'{lang}'" for lang in LATIN_PRIORITY) + "]"
    # same array-argmax as the Spark side: list_position returns the FIRST
    # 1-based index of the max (= earlier-priority tie-break), [] is 1-based
    branches.append(
        f"when list_max({arr}) > 0 then ({names})[list_position({arr}, list_max({arr}))]"
    )
    return "case " + " ".join(branches) + " else 'und' end"


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


def repetition_cols(text: Column) -> dict[str, Column]:
    """Gopher/MassiveText-style repetition signals: the fraction of
    duplicate word unigrams / 2-grams / 3-grams inside a document
    (1 − distinct/total; 0.0 when the doc has too few words to form the
    gram). High values mark boilerplate and degenerate generations.

    Pure Catalyst: n-grams are built by slice + array_join over a 1-based
    index sequence (in bounds by construction — ANSI-safe; one intrinsic
    per gram instead of width× bound-checked element_at probes, the same
    4× win measured on decontaminate's word_ngrams_col), distinct
    counting is array_distinct, everything stays in whole-stage codegen.
    The DuckDB twin uses the same integer sizes, so the double division
    is bit-identical across engines.
    """
    words = F.split(text, " ")
    n = F.size(words)

    def gram_dup_ratio(width: int) -> Column:
        cnt = n - (width - 1)
        grams = (
            words
            if width == 1
            else F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_join(F.slice(words, i, width), " "),
            )
        )
        return F.when(
            cnt >= 1,
            F.lit(1.0) - F.size(F.array_distinct(grams)) / cnt.cast("double"),
        ).otherwise(F.lit(0.0))

    return {
        "dup_word_ratio": gram_dup_ratio(1),
        "dup_2gram_ratio": gram_dup_ratio(2),
        "dup_3gram_ratio": gram_dup_ratio(3),
    }


def repetition_cols_sql(expr: str = "text") -> str:
    """DuckDB twin of :func:`repetition_cols` — returns the three
    projection expressions as SQL text (same sizes, same division)."""
    parts = []
    for width, name in ((1, "dup_word_ratio"), (2, "dup_2gram_ratio"), (3, "dup_3gram_ratio")):
        sp = f"string_split({expr}, ' ')"
        cnt = f"(len({sp}) - {width - 1})"
        gram = " || ' ' || ".join(f"{sp}[i+{j}]" for j in range(width))
        grams = f"list_transform(range(1, {cnt} + 1), i -> {gram})"
        ratio = (
            f"case when {cnt} >= 1 then 1.0 - len(list_distinct({grams}))"
            f" / cast({cnt} as double) else 0.0 end"
        )
        parts.append(f"{ratio} as {name}")
    return ", ".join(parts)


# PII patterns — simple-regex family (no lookaround, no possessive
# quantifiers) so Spark's Java regex and DuckDB's RE2 match identically
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d\s()\-]{7,}\d"


def pii_cols(text: Column) -> dict[str, Column]:
    """PII scrubbing for training text: emails, IPv4s, and phone-shaped
    number runs are replaced by typed placeholder tokens, with per-doc
    audit counts. Each count is taken on the PROGRESSIVELY scrubbed text
    (emails on the original, IPs after the email scrub, phones after the
    IP scrub) — exactly the stage inputs of the replace chain — so every
    count equals the number of placeholders that stage actually wrote
    and one substring can never be double-counted across categories
    (e.g. a ≥9-digit run inside an email local part is scrubbed as
    <EMAIL> and no longer counted as a phone).
    Pure Catalyst regexp — scan-side projection, no shuffle, no Python.
    """
    after_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>")
    return {
        "text_scrubbed": scrubbed,
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("long"),
        "n_ips": F.regexp_count(after_email, F.lit(PII_IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(after_ip, F.lit(PII_PHONE_RE)).cast("long"),
    }


def pii_cols_sql(expr: str = "text") -> str:
    """DuckDB twin of :func:`pii_cols` — projection expressions as SQL
    (same progressive-scrub stage inputs for the counts)."""
    after_email = f"regexp_replace({expr}, '{PII_EMAIL_RE}', '<EMAIL>', 'g')"
    after_ip = f"regexp_replace({after_email}, '{PII_IPV4_RE}', '<IP>', 'g')"
    scrub = f"regexp_replace({after_ip}, '{PII_PHONE_RE}', '<PHONE>', 'g')"
    return (
        f"{scrub} as text_scrubbed, "
        f"cast(len(regexp_extract_all({expr}, '{PII_EMAIL_RE}')) as bigint) as n_emails, "
        f"cast(len(regexp_extract_all({after_email}, '{PII_IPV4_RE}')) as bigint) as n_ips, "
        f"cast(len(regexp_extract_all({after_ip}, '{PII_PHONE_RE}')) as bigint) as n_phones"
    )


def _rate_threshold_hex(rate: float) -> str:
    """8-hex-char md5-prefix threshold for a keep rate in [0, 1)."""
    return format(max(0, min(int(rate * 16**8), 16**8 - 1)), "08x")


def stratified_keep(
    stratum: Column, key: Column, rates: dict[str, float]
) -> Column:
    """Deterministic per-stratum sampling decision: keep a row iff the
    first 8 hex chars of md5(key) fall under its stratum's rate
    threshold. Content-keyed (never partition- or order-dependent), so
    the kept subset is reproducible across runs, engines, and cluster
    sizes — the language-rebalancing sampler of a training-data
    pipeline. Strata missing from ``rates`` are dropped (keep=false);
    rate ≥ 1.0 keeps everything in the stratum.
    """
    h = F.substring(F.md5(key), 1, 8)
    out = F.lit(False)
    for s, r in sorted(rates.items()):
        keep = F.lit(True) if r >= 1.0 else (h < F.lit(_rate_threshold_hex(r)))
        out = F.when(stratum == F.lit(s), keep).otherwise(out)
    return out


def stratified_keep_sql(
    stratum_expr: str, key_expr: str, rates: dict[str, float]
) -> str:
    """DuckDB twin of :func:`stratified_keep` (same thresholds, same
    string comparison on the md5 hex prefix)."""
    h = f"substr(md5({key_expr}), 1, 8)"
    branches = []
    for s, r in sorted(rates.items()):
        keep = "true" if r >= 1.0 else f"{h} < '{_rate_threshold_hex(r)}'"
        branches.append(f"when {stratum_expr} = '{s}' then {keep}")
    return "case " + " ".join(branches) + " else false end"


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint: md5 of the
    whitespace-normalized lowercased text. md5 exists in both Spark and
    DuckDB, so exact-dup detection has a direct SQL oracle."""
    norm = F.lower(F.regexp_replace(F.trim(text), "\\s+", " "))
    return F.md5(norm)
