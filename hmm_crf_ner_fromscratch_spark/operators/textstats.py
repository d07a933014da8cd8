"""Text-analysis operators for training-data curation: quality stats,
language-ID heuristic, and tokenizer-style counting. Pure Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "big", "small", "fast", "slow"]

# marker-word lists for the n-gram-free language-ID heuristic; extend per
# corpus. (The synthetic testdata's text does not vary by language -- the
# operator is exercised for mechanics, the lang column provides truth.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "with"],
    "de": ["der", "die", "das", "und", "mit"],
    "fr": ["le", "la", "les", "et", "avec"],
    "es": ["el", "la", "los", "y", "con"],
    "zh": [],
}

# word / number / single punctuation -- a BPE-ish pre-tokenization split
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def quality_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document curation signals: token counts, type/token ratio,
    stopword ratio, average token length, and a combined quality score
    (all integer-derived -> engine-deterministic doubles)."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
    n_distinct = F.size(F.array_distinct(toks))
    total_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    ttr = n_distinct.cast("double") / n_tok.cast("double")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct"),
        n_stop.cast("long").alias("n_stopwords"),
        stop_ratio.alias("stop_ratio"),
        ttr.alias("type_token_ratio"),
        (total_chars.cast("double") / n_tok.cast("double")).alias("avg_token_len"),
        # quality: long enough, diverse, not stopword-soup
        (
            F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * ttr * (1.0 - stop_ratio)
        ).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word-ratio language guess: argmax over LANG_MARKERS hit
    counts (ties -> lexicographically smallest language code, then 'und'
    when no marker hits at all)."""
    toks = F.split(F.col(text_col), " ")
    scores = [
        (lang, F.size(F.filter(toks, lambda w: w.isin(markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
        if markers
    ]
    best = None
    best_lang = F.lit("und")
    for lang, score in scores:
        if best is None:
            best, best_lang = score, F.when(score > 0, lang).otherwise("und")
        else:
            improved = score > best
            best_lang = F.when(improved & (score > 0), lang).otherwise(best_lang)
            best = F.when(improved, score).otherwise(best)
    return df.select(
        F.col(id_col).alias("doc_id"),
        best_lang.alias("predicted_lang"),
    )


def bpe_token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tokenizer-style counting: whitespace tokens vs BPE-ish regex
    pieces vs punctuation -- the size accounting a training pipeline
    budgets by."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long").alias("n_bpe_pieces"),
        F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]")).cast("long").alias("n_punct"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
