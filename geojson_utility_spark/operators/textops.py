"""Text-analysis operators for training-data pipelines — all pure column expressions.

Language-ID (stopword-hit heuristic), quality scoring (length/punct/stopword ratios),
token counting (whitespace + BPE-ish regex), and document fingerprinting.  Everything
stays in whole-stage codegen; designed to run over trillions of document rows with
map-side-only cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny built-in stopword profiles (public common-word lists)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "et", "les", "des", "est", "pour", "dans", "que", "une"],
    "es": ["el", "la", "de", "que", "los", "por", "con", "para", "una", "del"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.regexp_replace(t, r"\s+", " "), " "))
    )


def token_count_bpe(col: Column) -> Column:
    """BPE-ish subword proxy: count of word pieces + digits + punctuation marks
    (the GPT-2 pre-tokenizer word/number/punct split, approximated as a regex)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def _stopword_hits(col: Column, words: list[str]) -> Column:
    toks = _tokens(col)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(col: Column) -> list[tuple[str, Column]]:
    return [(lang, _stopword_hits(col, words)) for lang, words in LANG_PROFILES.items()]


def lang_id(col: Column) -> Column:
    """argmax over stopword-hit counts; 'und' (undetermined) when all zero.
    Ties broken by profile order (en > de > fr > es) — deterministic."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # forward order + strict '>' means the FIRST profile reaching the max wins ties
    for lang, score in scores:
        cond = score > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Adds n_chars/n_tokens/mean_token_len/punct_ratio/stopword_ratio/digit_ratio/
    quality_score columns — the standard pretraining quality heuristics."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0))
    n_stop = _stopword_hits(c, LANG_PROFILES["en"])
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_tokens, F.lit(1)).cast("double")
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    stop_ratio = n_stop / safe_toks
    mean_tok = safe_chars / safe_toks
    score = (
        F.lit(1.0)
        - F.least(F.lit(1.0), punct_ratio * 4)
        - F.least(F.lit(1.0), digit_ratio * 2)
    ) * F.least(F.lit(1.0), stop_ratio * 5) * F.when(
        (mean_tok >= 3) & (mean_tok <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", mean_tok)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", F.greatest(F.lit(0.0), score))
    )


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the case/punct/whitespace-normalized text — the
    canonical near-exact-dup key (word-level normalization, order preserved)."""
    norm = F.regexp_replace(F.lower(col), r"[^\w]+", " ")
    return F.md5(F.trim(norm))


def rolling_fingerprint(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, fingerprint): winnowing-style document fingerprint — min over the
    rolling hash of every ``window``-char substring of the normalized text.

    Physical shape: normalize once -> explode a position sequence -> codegen
    substring + hash -> ONE groupBy(doc_id) min (map-side partial agg).  The
    array-lambda formulation (transform + array_min) is interpreted per element
    and ~100x slower — same lesson as minhash_signatures; do not regress to it.

    hash_family: 'xxhash64' (production) or 'md5' (60-bit via conv of md5 hex,
    reproducible in ANSI SQL — the ``rolling_fingerprint`` oracle entry uses it).
    """
    norm = df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("_norm"),
    )
    exploded = norm.select(
        "doc_id",
        "_norm",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("_norm") - (window - 1), F.lit(1))
            )
        ).alias("_i"),
    ).select(
        "doc_id",
        F.substring(F.col("_norm"), F.col("_i"), F.lit(window)).alias("_gram"),
    )
    if hash_family == "xxhash64":
        h = F.xxhash64("_gram")
    elif hash_family == "md5":
        h = F.conv(F.substring(F.md5(F.col("_gram")), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return (
        exploded.select("doc_id", h.alias("_h"))
        .groupBy("doc_id")
        .agg(F.min("_h").alias("fingerprint"))
    )
