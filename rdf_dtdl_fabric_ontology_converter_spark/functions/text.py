"""Text-analysis column functions for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized md5 + rolling hash). All JVM-side built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that", "it",
                "for")


def ws_tokens(text) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def bpe_ish_tokens(text) -> Column:
    """Subword-ish tokenization: letter runs, digit runs, single punct."""
    return F.expr(
        f"regexp_extract_all({text}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
    ) if isinstance(text, str) else F.regexp_extract_all(
        text, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))


def token_count(text) -> Column:
    return F.size(ws_tokens(text))


def stopword_ratio(text, stopwords=EN_STOPWORDS) -> Column:
    toks = ws_tokens(text)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text) -> Column:
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def lang_guess(text, threshold: float = 0.05) -> Column:
    """n-gram/stopword heuristic language id (en vs other)."""
    return F.when(stopword_ratio(text) > threshold, F.lit("en")) \
        .otherwise(F.lit("other"))


def quality_score(text) -> Column:
    """[0,1] composite: token count band + distinct ratio − punct excess."""
    toks = ws_tokens(text)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
    return F.round(len_ok + 0.5 * distinct_ratio - punct_ratio(text), 4)


def fingerprint(text) -> Column:
    """md5 of whitespace-normalized lowercase text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def rolling_fingerprint(text, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min md5 over token n-gram windows —
    robust to local edits (used for fuzzy doc identity)."""
    toks = ws_tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0)))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(
        " ", F.slice(toks, i + 1, window))))
    return F.array_min(grams)


def text_profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection with the full signal set."""
    t = F.col(text_col)
    return documents.select(
        "*",
        token_count(t).alias("n_tokens"),
        lang_guess(t).alias("lang_guess"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
