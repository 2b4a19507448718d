"""Text analysis operators for web-scale document tables.

All pure JVM-side column expressions (no UDFs): language-ID by stopword
n-gram hits, quality scoring, token counting, and word-shingle document
fingerprinting. Designed for the ``documents`` table shape
(doc_id, text, lang, source, n_chars) and the Common-Crawl-style ``pages``
table (url, warc_ts, html, text, lang).

Every function appends columns and returns the frame — composable, fully
pushdown-friendly, and expressible 1:1 in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small deterministic stopword sets per language (public common words)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count via space counting — byte-deterministic and
    identical across engines: n_spaces + 1 for non-empty text."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    )


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    n_tok = token_count(t)
    return (
        df.withColumn("n_chars_calc", F.length(t).cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "avg_token_len",
            F.when(
                n_tok > 0,
                (F.length(t) - (n_tok - 1)).cast("double") / n_tok,
            ).otherwise(F.lit(0.0)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0, 1]: length band, punctuation density,
    uppercase ratio, digit ratio. Deterministic closed-form expressions."""
    t = F.col(text_col)
    n = F.length(t).cast("double")
    punct = n - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    digits = n - F.length(F.regexp_replace(t, r"[0-9]", ""))
    upper = n - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    safe_n = F.when(n > 0, n).otherwise(F.lit(1.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct / safe_n
    digit_ratio = digits / safe_n
    upper_ratio = upper / safe_n
    score = (
        0.4 * len_score
        + 0.2 * F.least(punct_ratio * 20.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(digit_ratio * 5.0, F.lit(1.0)))
        + 0.2 * (1.0 - F.least(upper_ratio * 5.0, F.lit(1.0)))
    )
    return (
        df.withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("upper_ratio", upper_ratio)
        .withColumn("quality_score", score)
    )


def lang_stopword_hits(text: Column, lang: str) -> Column:
    """Count of stopword occurrences (space-delimited) for a language."""
    words = LANG_STOPWORDS[lang]
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0).cast("long")
    for w in words:
        needle = f" {w} "
        # non-overlapping occurrence count via length difference
        cnt = (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))
        ).cast("long")
        total = total + cnt
    return total


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Naive stopword-vote language ID: argmax of per-language hit counts;
    'und' when no stopword hits at all. Ties break alphabetically (stable)."""
    t = F.col(text_col)
    hits = {lang: lang_stopword_hits(t, lang) for lang in sorted(LANG_STOPWORDS)}
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    # iterate in reverse-alphabetical order so that the final expression
    # prefers the alphabetically-first language on ties (> comparison)
    for lang in sorted(hits, reverse=True):
        h = hits[lang]
        take = h > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, h).otherwise(best_hits)
    out = df
    for lang in sorted(hits):
        out = out.withColumn(f"hits_{lang}", hits[lang])
    return out.withColumn("lang_pred", best_lang)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-3-gram document fingerprint: min md5 over token shingles
    (winnowing-style min-hash fingerprint; md5 chosen because Spark and
    DuckDB produce identical hex digests). Docs with <3 tokens hash the
    whole text."""
    t = F.col(text_col)
    toks = F.split(t, " ")
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0))),
        lambda i: F.md5(
            F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1), F.get(toks, i + 2))
        ),
    )
    fp = F.when(n >= 3, F.array_min(shingles)).otherwise(F.md5(t))
    return df.withColumn("fingerprint", fp)


# BPE-ish pre-tokenizer pattern: letter runs, single digits, single
# non-alphanumeric marks — the shape GPT-2-style byte-pair pre-splits use,
# restricted to constructs RE2 and Java regex evaluate identically (no
# lookarounds), so the count is SQL-oracle-able cross-engine.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Approximate LLM token count: BPE-style pre-split matches (letter
    runs count 1 each; digits and punctuation marks count singly) —
    a cheap, deterministic stand-in for tokenizer-exact counts at data-
    pipeline scale. Pure JVM regexp_count."""
    return df.withColumn(
        "n_bpe_tokens",
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN)).cast("long"),
    )
