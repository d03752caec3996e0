"""Distributed IR evaluation metrics (the engine-side trec_eval).

The reference scores its ``.teIn`` run files by piping them into NIST
trec_eval externally (every homework's ``test.py`` upload flow, e.g.
Homeworks/HW2/test.py:24-63); queries x metrics never touch the engine.
Here the same standard metrics compute AS a DataFrame plan over
(run, qrels) frames — one join + windows + one groupBy per side — so a
million-query evaluation sweep is just another distributed job, and a
run produced by ``engine.run_batch`` can be scored without leaving
Spark. Input column contract matches ``sources.trec``:
run = (qid, ext_id, rank[, score...]), qrels = (qid, ext_id, rel).

Metric definitions (trec_eval conventions):

- ``p_at_k``      precision at cutoff k
- ``recall_at_k`` relevant retrieved in top k / total relevant
- ``rr``          1/rank of the first relevant result (MRR numerator)
- ``ap``          sum over relevant retrieved of P@rank, / total
                  relevant (MAP numerator)
- ``ndcg_at_k``   DCG@k / ideal-DCG@k with linear gain rel/log2(rank+1), computed as rel*ln(2)/ln(rank+1)
                  (Jarvelin-Kekalainen, trec_eval ``ndcg_cut``)

Queries with zero relevant docs score 0.0 (they stay in the frame so
the caller decides whether to exclude them from means). Inputs are
expected unique per (qid, ext_id) — the trec file contract; duplicate
qrels rows would fan out the join (trec_eval errors on them, this
module does not check).

Float discipline (repo invariant): every cross-row sum of doubles runs
as an order-fixed fold over a rank-sorted list — same element order in
the DuckDB oracle's ``list_reduce(list(... ORDER BY rank))`` — and
exposed metrics are ``round(x, 6)``. Counts and cum-rel prefixes are
integers (exact); only the final divisions and log2 terms are floats,
computed in the same operand order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# order-fixed fold: Spark side of the idiom paired with DuckDB's
# COALESCE(list_reduce(list(v ORDER BY key), fold), 0.0) — init 0.0
# then left-to-right adds produce the identical double sequence
_FOLD = (
    "aggregate(array_sort(collect_list(struct({key}, {val}))), "
    "cast(0.0 as double), (acc, x) -> acc + x.{val})"
)


def ir_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metric row: (qid, n_ret, n_rel, n_rel_ret, p_at_k,
    recall_at_k, rr, ap, ndcg_at_k)."""
    qr = qrels.select(
        "qid", "ext_id", F.col("rel").cast("int").alias("rel")
    )

    w = Window.partitionBy("qid").orderBy("rank")
    j = (
        run.select("qid", "ext_id", F.col("rank").cast("int").alias("rank"))
        .join(qr, on=["qid", "ext_id"], how="left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("__isrel", (F.col("rel") > 0).cast("int"))
        .withColumn("__cum", F.sum("__isrel").over(w))
    )
    # per-row contributions (each a single deterministic division)
    j = j.withColumn(
        "__apc",
        F.when(
            F.col("__isrel") == 1,
            F.col("__cum").cast("double") / F.col("rank").cast("double"),
        ).otherwise(F.lit(0.0)),
    ).withColumn(
        "__gain",
        F.when(
            F.col("rank") <= k,
            # ln-composite instead of F.log2: the DuckDB oracle replays
            # (rel * ln(2)) / ln(rank+1) term-for-term, and Spark-ln ==
            # DuckDB-ln bit-for-bit is already load-bearing in the BM25
            # gates; log2's dedicated C implementation is not
            (F.col("rel").cast("double") * F.log(F.lit(2.0)))
            / F.log(F.col("rank").cast("double") + 1.0),
        ).otherwise(F.lit(0.0)),
    )
    ret = j.groupBy("qid").agg(
        F.count(F.lit(1)).cast("int").alias("n_ret"),
        F.sum("__isrel").cast("int").alias("n_rel_ret"),
        F.sum(F.when(F.col("rank") <= k, F.col("__isrel")).otherwise(F.lit(0)))
        .cast("int")
        .alias("__relk"),
        F.min(F.when(F.col("__isrel") == 1, F.col("rank"))).alias("__frank"),
        F.expr(_FOLD.format(key="rank", val="__apc")).alias("__apsum"),
        F.expr(_FOLD.format(key="rank", val="__gain")).alias("__dcg"),
    )

    # qrels side: total relevant + ideal DCG@k (rel sorted descending,
    # ext_id tie-break fixes the collect order; equal rels make the
    # value order-independent anyway)
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("ext_id"))
    qi = (
        qr.where(F.col("rel") > 0)
        .withColumn("__i", F.row_number().over(wi))
        .withColumn(
            "__ig",
            F.when(
                F.col("__i") <= k,
                (F.col("rel").cast("double") * F.log(F.lit(2.0)))
                / F.log(F.col("__i").cast("double") + 1.0),
            ).otherwise(F.lit(0.0)),
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_rel"),
            F.expr(_FOLD.format(key="__i", val="__ig")).alias("__idcg"),
        )
    )

    out = ret.join(qi, on="qid", how="left")
    zero = F.lit(0.0)
    n_rel_d = F.col("n_rel").cast("double")
    return out.select(
        "qid",
        "n_ret",
        F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
        "n_rel_ret",
        F.round(F.col("__relk").cast("double") / F.lit(float(k)), 6).alias("p_at_k"),
        F.round(
            F.coalesce(F.col("__relk").cast("double") / n_rel_d, zero), 6
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__frank").cast("double"), zero), 6
        ).alias("rr"),
        F.round(F.coalesce(F.col("__apsum") / n_rel_d, zero), 6).alias("ap"),
        F.round(
            F.coalesce(
                F.when(F.col("__idcg") > 0.0, F.col("__dcg") / F.col("__idcg")),
                zero,
            ),
            6,
        ).alias("ndcg_at_k"),
    )


def mean_metrics(per_query: DataFrame) -> DataFrame:
    """One-row summary: (n_queries, map, mrr, mean_p_at_k,
    mean_recall_at_k, mean_ndcg_at_k) — order-fixed folds over
    qid-sorted per-query rows, so the means are parallelism-invariant.
    """
    folds = {
        "map": "ap",
        "mrr": "rr",
        "mean_p_at_k": "p_at_k",
        "mean_recall_at_k": "recall_at_k",
        "mean_ndcg_at_k": "ndcg_at_k",
    }
    n = F.count(F.lit(1)).cast("int")
    aggs = [n.alias("n_queries")] + [
        F.round(
            F.expr(_FOLD.format(key="qid", val=src)) / n.cast("double"), 6
        ).alias(dst)
        for dst, src in folds.items()
    ]
    return per_query.agg(*aggs)
