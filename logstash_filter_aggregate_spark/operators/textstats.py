"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting. Pure Catalyst
expressions (regexp/length/aggregate) so every one of them is
SQL-oracle-checkable and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.operators.dedup import normalized_text

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "la", "de", "que", "los", "es", "una"],
}


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count; BPE-ish subword estimate ≈ chars/4 is
    provided by :func:`bpe_token_estimate`."""
    c = normalized_text(col)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def bpe_token_estimate(col: str | Column = "text") -> Column:
    """Regex-based BPE-ish token estimate: split on word boundaries,
    digits, and punctuation runs (≈ GPT-style pre-tokenizer) — an upper
    bound of whitespace tokens, cheap and deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)))


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def stopword_hits(col: str | Column, lang: str) -> Column:
    c = F.concat(F.lit(" "), normalized_text(col), F.lit(" "))
    pattern = r"\s(?:" + "|".join(STOPWORDS[lang]) + r")\s"
    # overlapping ' the the ' matches need two passes of non-overlap regex;
    # good enough as a heuristic signal, identical in Spark and DuckDB.
    return _count_matches(c, pattern)


def lang_id(col: str | Column = "text") -> Column:
    """Argmax of per-language stopword hit counts; 'und' (undetermined)
    when nothing matched."""
    c = F.col(col) if isinstance(col, str) else col
    scores = [(lang, stopword_hits(c, lang)) for lang in STOPWORDS]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword ratios + a composite score
    in [0,1] — the standard cheap quality filter for pretraining corpora."""
    from logstash_filter_aggregate_spark.operators.spread import spread_input

    # regex-heavy per-row stats: widen a one-row-group input so the scan
    # stage uses every core (identity at scale)
    df = spread_input(df)
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = token_count(c)
    punct = _count_matches(c, r"[^\w\s]")
    digits = _count_matches(c, r"[0-9]")
    stops = stopword_hits(c, "en")
    mean_tok_len = F.when(toks > 0, n_chars.cast("double") / toks).otherwise(F.lit(0.0))
    score = (
        F.when(toks >= 5, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct.cast("double") < 0.2 * F.greatest(n_chars, F.lit(1)), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stops > 0, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.withColumns(
        {
            "n_chars2": n_chars.cast("long"),
            "n_tokens": toks.cast("long"),
            "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)).cast("double"), 6),
            "digit_ratio": F.round(digits / F.greatest(n_chars, F.lit(1)).cast("double"), 6),
            "stopword_hits": stops.cast("long"),
            "quality_score": F.round(score, 2),
        }
    )


def fingerprint(col: str | Column = "text") -> Column:
    """Content fingerprint: md5 of the normalized text (case/punct
    insensitive). Rolling-hash variant: :func:`rolling_min_fingerprint`."""
    return F.md5(normalized_text(col))


def rolling_min_fingerprint(col: str | Column = "text", k: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum xxhash64 over character
    k-grams of the normalized text — stable under small edits."""
    c = normalized_text(col)
    n = F.length(c)
    grams = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.xxhash64(F.substr(c, i, F.lit(k))),
    )).otherwise(F.array(F.xxhash64(c)))
    return F.array_min(grams)
