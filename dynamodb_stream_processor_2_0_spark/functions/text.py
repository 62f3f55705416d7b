"""Text-analysis scalar functions (LLM-pipeline extension): token
stats, language-ID heuristic, quality scoring, fingerprinting.

All JVM built-ins (split/regexp/md5/conv) — no Python in the hot path.
Formulas are written as fixed-shape arithmetic so the DuckDB oracle
computes bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny stopword lists for the language-ID heuristic. Public-knowledge
# function words; the heuristic is n-gram/stopword voting, the classic
# cheap lang-ID approach.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "des"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (single-space split, oracle-identical)."""
    return F.size(F.split(text, " "))


def word_count_regex(text: Column) -> Column:
    """BPE-ish regex token count: alphabetic runs."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+"), 0))


def _filter_count(tokens_sql: str, words: tuple[str, ...]) -> F.Column:
    in_list = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({tokens_sql}, t -> t IN ({in_list})))")


def lang_scores(tokens_sql: str = "toks") -> dict[str, F.Column]:
    """Stopword-vote score per language over a tokens array column."""
    return {lang: _filter_count(tokens_sql, words) for lang, words in STOPWORDS.items()}


def non_ascii_count(text: Column) -> Column:
    """Characters outside printable ASCII — the CJK signal."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[^\x20-\x7e]", ""))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (reference P3 normalization idea, index.js:117 applied to
    content hashing)."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def fingerprint_bucket(fp: Column) -> Column:
    """First 8 hex chars of the fingerprint as a BIGINT shard key —
    uniform, reproducible partitioning handle for a 100 TB dedup run."""
    return F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint")
