"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting.  All pure Column/SQL expressions (zero Python in
the hot path); outputs are integer/string typed so the DuckDB oracle can
replay them hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmquadtree_rust_bindings_spark.operators.dedup import WORD_HASH

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbol
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "on", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "des", "que", "pour", "dans", "sur"],
}
LANG_PRIORITY = ["en", "es", "fr"]  # deterministic tie-break order


def with_token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """whitespace token count + BPE-ish regex token count (both ints)."""
    return df.withColumns({
        "n_ws_tokens": F.size(F.split(F.col(text), " ")),
        "n_bpe_tokens": F.size(
            F.regexp_extract_all(F.col(text), F.lit(BPE_PATTERN), 0)),
    })


def _stop_hits(text_col, lang: str):
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(
        F.array_distinct(F.split(text_col, " ")), arr))


def with_quality(df: DataFrame, text: str = "text",
                 min_tokens: int = 5, max_tokens: int = 100_000,
                 min_stop_hits: int = 1) -> DataFrame:
    """Quality signals: token count bounds + stopword evidence + symbol
    ratio, combined into an integer-thresholded boolean (C4-style filters).
    """
    df = with_token_counts(df, text)
    stop_any = None
    for lang in LANG_PRIORITY:
        h = _stop_hits(F.col(text), lang)
        stop_any = h if stop_any is None else F.greatest(stop_any, h)
    df = df.withColumn("stop_hits", stop_any)
    # symbol ratio as integers: 10 * symbols <= 3 * tokens (i.e. <= 30%)
    n_sym = F.col("n_bpe_tokens") - F.size(F.regexp_extract_all(
        F.col(text), F.lit("[a-zA-Z]+|[0-9]+"), 0))
    return df.withColumn("n_symbols", n_sym).withColumn(
        "is_quality",
        (F.col("n_ws_tokens") >= min_tokens)
        & (F.col("n_ws_tokens") <= max_tokens)
        & (F.col("stop_hits") >= min_stop_hits)
        & (F.col("n_symbols") * 10 <= F.col("n_bpe_tokens") * 3),
    )


def with_langid(df: DataFrame, text: str = "text",
                out: str = "lang_pred") -> DataFrame:
    """Heuristic language id: distinct-stopword hits per language, argmax
    with fixed priority tie-break; 'und' when nothing matches."""
    for lang in LANG_PRIORITY:
        df = df.withColumn(f"__hits_{lang}", _stop_hits(F.col(text), lang))
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in LANG_PRIORITY:  # earlier langs win ties via strict >
        cond = F.col(f"__hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"__hits_{lang}")).otherwise(best_hits)
    return df.withColumn(out, best).drop(
        *[f"__hits_{lang}" for lang in LANG_PRIORITY])


def with_fingerprint(df: DataFrame, text: str = "text",
                     out: str = "fingerprint") -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    word hashes, fold left with h = (h*31 + word_hash) mod 2^31-1.
    ``aggregate`` folds sequentially (deterministic); the 31-bit modulus
    keeps every intermediate inside int64 (acc*31 + h < 2^36)."""
    p = 2147483647  # 2^31 - 1
    words = F.split(F.col(text), " ")
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (
            acc * 31
            + F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long") % p
        ) % p,
    )
    return df.withColumn(out, fp)
