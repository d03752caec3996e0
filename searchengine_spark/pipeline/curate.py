"""Corpus curation: the composition layer of a training-data pipeline.

Individual signals (quality, language, dedup clusters) live in
``textstats`` / ``dedup``; this module composes them into the two
policies every large-scale corpus build ends with:

- ``keep_representatives`` — near-dup dedup: one surviving document
  (min doc id) per MinHash-LSH cluster, singletons untouched;
- ``corpus_filter`` — the classic keep-predicate: right language AND
  quality above threshold AND not a redundant exact duplicate.

Both are anti-joins against small "loser" sets, so the corpus itself
streams through one broadcast-able join — no full-text shuffle at
100 TB (the loser side is bounded by the duplicate mass, not corpus
size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.pipeline.dedup import near_dup_clusters
from searchengine_spark.pipeline.textstats import lang_id, quality_scores


def keep_representatives(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every near-duplicate except the cluster representative
    (min doc id). Singletons (no near-dup) pass through unchanged."""
    clusters = near_dup_clusters(df, threshold=threshold, id_col=id_col, text_col=text_col)
    losers = clusters.where(F.col(id_col) != F.col("component")).select(id_col)
    return df.join(losers, on=id_col, how="left_anti")


def corpus_filter(
    df: DataFrame,
    min_quality: float = 0.5,
    lang: str = "en",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-corpus keep-filter: language match AND quality >=
    threshold AND not a non-representative exact duplicate.

    Returns (doc_id, pred_lang, quality) for the surviving docs — the
    id set a downstream tokenization/packing stage would consume.
    """
    q = quality_scores(df).select(id_col, "quality")
    lg = lang_id(df).select(id_col, "pred_lang")
    reps = (
        df.select(F.md5("text").alias("__k"), F.col(id_col))
        .groupBy("__k")
        .agg(F.min(id_col).alias("__rep"))
    )
    losers = (
        df.select(F.md5("text").alias("__k"), F.col(id_col))
        .join(reps, on="__k")
        .where(F.col(id_col) != F.col("__rep"))
        .select(id_col)
    )
    return (
        df.select(id_col)
        .join(losers, on=id_col, how="left_anti")
        .join(q, on=id_col)
        .join(lg, on=id_col)
        .where((F.col("pred_lang") == lang) & (F.col("quality") >= min_quality))
        .select(id_col, "pred_lang", F.col("quality"))
    )
