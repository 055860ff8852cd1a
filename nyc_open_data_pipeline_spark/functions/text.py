"""Text-analysis functions for training-data pipelines.

All hot-path functions are built from ``pyspark.sql.functions`` intrinsics
(whole-stage-codegen'd, no Python in the loop): tokenization, token stats,
quality scoring, n-gram-stopword language ID, rolling-hash fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nyc_open_data_pipeline_spark.operators.dedup import (
    MINHASH_P,
    _hash64,
    normalized_text,
)

# Small public stopword seed lists (heads of standard stopword sets) for the
# n-gram-heuristic language scorer. Deterministic, dependency-free.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "los", "las", "y", "en", "que", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"),
    "fr": ("le", "la", "les", "et", "un", "une", "est", "dans", "pour", "que"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization over the normalized text."""
    return F.split(normalized_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count_no_ws(col: Column) -> Column:
    """Character count excluding whitespace (code points, engine-portable)."""
    return F.length(F.regexp_replace(col, r"\s", "")).cast("long")


def punct_count(col: Column) -> Column:
    """ASCII punctuation count (Java \\p{Punct} == POSIX [[:punct:]])."""
    return (F.length(col) - F.length(F.regexp_replace(col, r"\p{Punct}", ""))).cast("long")


def stopword_hits(col: Column, lang: str) -> Column:
    """Occurrences (not distinct) of the language's stopwords in the text."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda x: x.isin(*sw))).cast("long")


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    n = token_count(col)
    return F.when(n > 0, stopword_hits(col, lang).cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation x (stopword
    presence) x (punctuation sanity). A stand-in for classifier-based
    quality filters, exercising the same plumbing."""
    n = token_count(col).cast("double")
    len_term = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_term = F.lit(0.5) + F.lit(0.5) * F.least(
        stopword_ratio(col, "en") * F.lit(5.0), F.lit(1.0)
    )
    punct_term = F.when(
        punct_count(col).cast("double") / F.greatest(F.length(col), F.lit(1)).cast("double")
        > 0.2,
        F.lit(0.5),
    ).otherwise(F.lit(1.0))
    return len_term * stop_term * punct_term


def language_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(col, lang) for lang in STOPWORDS}


def language_id(col: Column) -> Column:
    """Argmax language by stopword hits; fixed priority order en>es>de>fr
    breaks ties; 'und' (undetermined) when no stopword matches."""
    s = language_scores(col)
    best = F.greatest(*s.values())
    out = F.lit("und")
    # build reversed so earlier langs win ties via later .when precedence
    expr = F.when(best == 0, F.lit("und"))
    for lang in STOPWORDS:  # insertion order = priority order
        expr = expr.when(s[lang] == best, F.lit(lang))
    return expr


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes, mod
    2^31-1 (overflow-free in int64): fold(acc*31 + h) — the classic
    Rabin-Karp document fingerprint, as one JVM aggregate expression."""
    hashed = F.transform(tokens(col), lambda s: _hash64(s))
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h % F.lit(MINHASH_P)) % F.lit(MINHASH_P),
    )
