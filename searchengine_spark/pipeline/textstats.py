"""Text analysis over document tables: stats, quality, lang-id,
fingerprints, token counting.

All operators are single-pass column expressions / one groupBy — no
Python UDFs, no extra shuffles beyond the aggregation they define.
They scale linearly with the corpus: each is a map-side expression or
a partial+final aggregation Catalyst handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.functions.hashing import shingles, tokens

# Language marker words (tiny, deterministic n-gram-free heuristic;
# real lang-id would plug a model in here — the *pipeline shape* is
# what matters: pure column exprs, no UDF).
LANG_MARKERS: dict[str, tuple] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "los", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}

STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation
BPE_PATTERN = "([a-z]+|[0-9]|[^a-z0-9 ])"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("__toks", tokens(text_col))


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: n_tokens, n_unique, avg token length."""
    t = with_tokens(df, text_col)
    return t.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_unique"),
        F.round(
            F.expr("aggregate(__toks, 0L, (acc, x) -> acc + length(x))")
            / F.greatest(F.size("__toks"), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score from stopword ratio, diversity, length.

    quality = 0.4*(1-stop_ratio) + 0.3*uniq_ratio + 0.3*min(n,200)/200
    (fixed formula so an ANSI-SQL oracle reproduces it bit-for-bit).
    """
    t = with_tokens(df, text_col)
    n = F.greatest(F.size("__toks"), F.lit(1)).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.expr(
        "filter(__toks, x -> array_contains(%s, x))" % _sql_array(STOPWORDS)
    )).cast("double")
    uniq = F.size(F.array_distinct("__toks")).cast("double")
    stop_ratio = n_stop / n
    uniq_ratio = uniq / n
    len_score = F.least(F.size("__toks"), F.lit(200)).cast("double") / F.lit(200.0)
    _ = stop_arr
    return t.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(
            F.lit(0.4) * (F.lit(1.0) - stop_ratio)
            + F.lit(0.3) * uniq_ratio
            + F.lit(0.3) * len_score,
            6,
        ).alias("quality"),
    )


def _sql_array(words) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"array({inner})"


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language guess with deterministic tie-break.

    Counts marker-token occurrences per language; argmax wins, ties
    resolve in the fixed language order en > es > de > fr.
    """
    t = with_tokens(df, text_col)
    counts = {
        lang: F.size(
            F.expr(f"filter(__toks, x -> array_contains({_sql_array(m)}, x))")
        ).cast("long")
        for lang, m in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = counts[langs[0]]
    for lg in langs[1:]:
        best = F.greatest(best, counts[lg])
    pred = F.lit(langs[-1])
    for lg in reversed(langs[:-1]):
        pred = F.when(counts[lg] == best, F.lit(lg)).otherwise(pred)
    out_cols = [F.col(id_col).cast("long").alias(id_col)]
    out_cols += [counts[lg].alias(f"n_{lg}") for lg in langs]
    out_cols.append(pred.alias("pred_lang"))
    return t.select(*out_cols)


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5 + min 3-gram-shingle md5.

    The shingle-min fingerprint is a 1-hash MinHash — equal values are
    strong near-duplicate evidence; used as a cheap blocking key.
    """
    t = with_tokens(df, text_col)
    t = t.withColumn("__sh", shingles("__toks", 3))
    return t.select(
        F.col(id_col).cast("long").alias(id_col),
        F.md5(F.col(text_col)).alias("text_md5"),
        F.array_min(F.transform("__sh", F.md5)).alias("min_shingle_md5"),
    )


def bpe_token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish-pretokenizer token counts."""
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(text_col), F.lit(BPE_PATTERN), F.lit(1))
        ).cast("long").alias("n_bpe_tokens"),
    )
