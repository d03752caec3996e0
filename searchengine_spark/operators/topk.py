"""Top-k ranking with the reference tie-break (ScoreList.java:85-113).

The reference sorts by (score desc, external id asc) and truncates.
Here doc ids are assigned by ``row_number`` over the external id
(index.build.assign_doc_ids), so ascending doc_id IS ascending external
id — the tie-break runs on the cheap numeric column and external ids
are joined back only for the k surviving rows.

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each
partition keeps a local k-heap and only k rows per partition reach the
driver-side merge — no global sort, no full shuffle, scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk(scores: DataFrame, k: int) -> DataFrame:
    """scores (doc_id, score) -> top-k with rank 1..k."""
    limited = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return limited.withColumn("rank", F.row_number().over(w))


def topk_grouped(scores: DataFrame, k: int, group: str = "qid") -> DataFrame:
    """Per-group top-k for multi-query batches (one shuffle on qid)."""
    w = Window.partitionBy(group).orderBy(F.desc("score"), F.asc("doc_id"))
    return scores.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def attach_ext_ids(ranked: DataFrame, docs: DataFrame) -> DataFrame:
    """Join external ids for the (tiny) ranked frame against the docs table.

    Broadcasts the ranked side so the big docs table streams through a
    broadcast hash join instead of shuffling.
    """
    return docs.select("doc_id", "ext_id").join(F.broadcast(ranked), on="doc_id")
