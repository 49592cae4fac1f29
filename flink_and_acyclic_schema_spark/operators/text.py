"""Text-analysis operators for LLM data pipelines (documents table).

All pure built-in expressions: regexp token counting, ratio statistics,
stopword-list language scoring, md5 shingle fingerprinting. Regex patterns are
restricted to ASCII classes that behave identically under Java regex (Spark)
and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation marks
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# marker-token lists per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "de", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}


def _words(col):
    return F.split(F.trim(col), r"\s+")


def text_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, punct_ratio, stopword_ratio, upper_ratio):
    quality-scoring signals; all ratios are int/int double divisions so both
    engines produce bit-identical doubles."""
    w = _words(F.col("text"))
    n_tokens = F.size(w)
    total_chars = F.length(F.col("text"))
    # characters that survive removing punctuation-ish marks
    no_punct = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", ""))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    upper_chars = total_chars - F.length(F.regexp_replace(F.col("text"), r"[A-Z]", ""))
    token_chars = total_chars - (n_tokens - 1)  # chars excluding single separators
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (token_chars.cast("double") / n_tokens).alias("avg_token_len"),
        ((total_chars - no_punct).cast("double") / total_chars).alias("punct_ratio"),
        (stop_hits.cast("double") / n_tokens).alias("stopword_ratio"),
        (upper_chars.cast("double") / total_chars).alias("upper_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, quality, quality_band): composite document-quality
    score in [0,1] from length / punctuation / stopword / uppercase signals —
    the standard pre-training filter shape (Gopher/C4-style rules). Every term
    is a fixed-order IEEE double expression over int counts, so the score is
    bit-identical in the DuckDB oracle. Pure narrow scan+project: no shuffle,
    fully codegen'd, trivially scalable."""
    stats = text_stats(docs)
    len_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - F.lit(4.0) * F.col("punct_ratio"), F.lit(0.0))
    stop_score = F.least(F.lit(5.0) * F.col("stopword_ratio"), F.lit(1.0))
    upper_score = F.greatest(F.lit(1.0) - F.lit(2.0) * F.col("upper_ratio"), F.lit(0.0))
    quality = (len_score + punct_score + stop_score + upper_score) / F.lit(4.0)
    return stats.select(
        "doc_id",
        "n_tokens",
        quality.alias("quality"),
        F.when(quality >= 0.75, "high")
        .when(quality >= 0.5, "medium")
        .otherwise("low")
        .alias("quality_band"),
    )


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace tokens vs BPE-ish
    pre-tokenizer units (letter runs / digit runs / punctuation singles)."""
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)).alias("n_bpe_tokens"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, lang_pred): deterministic marker-token language guess;
    argmax over per-language stopword hit counts, fixed priority tie-break."""
    w = _words(F.lower(F.col("text")))

    def _hits(markers: tuple[str, ...]):
        return F.size(F.filter(w, lambda x: x.isin(*markers)))

    scores = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    doc = docs
    for lang, s in scores.items():
        doc = doc.withColumn(f"s_{lang}", s)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = fixed priority
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return doc.select("doc_id", "lang", pred.alias("lang_pred"))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, n_shingles): winnowing-style document fingerprint —
    lexicographic-min md5 over word 3-gram shingles + distinct shingle count."""
    from .dedup import word_shingles

    sh = word_shingles(docs)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5("sh")).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_shingles"),
    )
