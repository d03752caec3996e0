"""Block-max WAND-style top-k pruning for bag-of-words BM25.

The reference scores every matching document exhaustively and sorts
(QryEval.java:133-138); at 10^12 docs that is the dominant cost. This
module prunes exactly — the returned top-k is rank-identical to
exhaustive scoring — using the ``block_stats`` table the index build
maintains (index/build.py): per (term, field, doc-id-range block),
``max_tf`` and ``min_len``.

Algorithm (two distributed phases, two tiny driver actions):

1. Per block, an upper bound on any member doc's score:
   ``ub(block) = Σ_t idf_t * max_tf/(max_tf + k1*(1-b+b*min_len/avg))``
   (monotone ↑ in tf, ↓ in len, so max_tf/min_len bound the block).
2. *Seed phase*: exactly score the few highest-ub blocks (enough to
   cover ~2k docs) -> threshold θ = k-th best exact score.
3. *Prune phase*: only blocks with ``ub >= θ`` can contain a top-k doc
   (any doc's score <= its block ub < θ otherwise). Exactly score just
   those blocks and take top-k.

Everything stays DataFrame-side: the posting table is only read for
candidate blocks (block_id is derived from doc_id, so with doc-id-range
file layout this becomes partition pruning); only θ (a scalar) and the
seed block ids cross the driver boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.functions.xxh64 import term_bucket
from searchengine_spark.index.build import BLOCK_RANGE, InvertedIndex


def _idfs(index: InvertedIndex, terms: list[str], field: str) -> dict[str, float]:
    fr = index.term_stats
    cond = F.col("term").isin(list(terms)) & (F.col("field") == field)
    if "bucket" in fr.columns and index.n_buckets:
        cond = F.col("bucket").isin(
            sorted({term_bucket(t, index.n_buckets) for t in terms})
        ) & cond
    rows = fr.where(cond).select("term", "df").collect()
    dfs = {r["term"]: int(r["df"]) for r in rows}
    n = float(index.n_docs)
    return {
        t: max(0.0, math.log((n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5)))
        for t in terms
    }


def _term_scans(index: InvertedIndex, terms: list[str], field: str):
    """ONE postings scan for all terms. The literal bucket-IN (ids from
    the driver-side XXH64) prunes partitions to the union of the terms'
    bucket directories (pinned by tests/test_pruning.py), so the single
    scan reads the same files as the per-term union did — once instead
    of k times."""
    cond = (F.col("field") == field) & F.col("term").isin(list(terms))
    if index.n_buckets:
        cond = cond & F.col("bucket").isin(
            sorted({term_bucket(t, index.n_buckets) for t in terms})
        )
    return index.postings.where(cond).select("term", "doc_id", "tf", "doc_len")


def _idf_col(idfs: dict[str, float]):
    expr = F.lit(0.0)
    for t, v in idfs.items():
        expr = F.when(F.col("term") == t, F.lit(v)).otherwise(expr)
    return expr


def _exact_scores(
    postings: DataFrame, terms: list[str], idfs: dict[str, float],
    k1: float, b: float, avg: float,
) -> DataFrame:
    """(doc_id, score) BM25 #SUM; per-term columns summed in term order
    so floats reproduce the compiler/oracle exactly."""
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avg))
    scored = postings.select(
        "doc_id", "term", (_idf_col(idfs) * tf / denom).alias("s")
    )
    aggs = [
        F.max(F.when(F.col("term") == t, F.col("s"))).alias(f"s{i}")
        for i, t in enumerate(terms)
    ]
    pv = scored.groupBy("doc_id").agg(*aggs)
    total = F.coalesce(F.col("s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
    return pv.select("doc_id", total.alias("score"))


def bm25_topk_pruned(
    index: InvertedIndex,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    field: str = "body",
    block_range: int | None = None,
) -> DataFrame:
    """Exact BM25 #SUM top-k via block-max pruning -> (doc_id, score).

    Returns at least the exact top-k (possibly more rows); callers
    rank/cut. Falls back to exhaustive scoring when the index carries
    no block stats.
    """
    terms = list(terms)
    block_range = block_range or index.block_range
    avg = index.avg_len(field)
    idfs = _idfs(index, terms, field)
    base = _term_scans(index, terms, field)
    if index.block_stats is None or avg <= 0:
        return _exact_scores(base, terms, idfs, k1, b, avg or 1.0)

    bs = index.block_stats.where(
        (F.col("field") == field) & F.col("term").isin(terms)
    )
    mtf = F.col("max_tf").cast("double")
    ub_t = _idf_col(idfs) * mtf / (
        mtf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("min_len") / F.lit(avg))
    )
    block_ub = bs.groupBy("block_id").agg(
        F.sum(ub_t).alias("ub"), F.sum("n").alias("n_post")
    )

    # seed: cheapest blocks that plausibly hold >= 2k docs
    seed_rows = block_ub.orderBy(F.desc("ub")).limit(256).collect()
    seed_ids, cum = [], 0
    for r in seed_rows:
        seed_ids.append(int(r["block_id"]))
        cum += int(r["n_post"])
        if cum >= 2 * k:
            break
    if not seed_ids:
        return _exact_scores(base, terms, idfs, k1, b, avg)

    blk = (F.col("doc_id") / block_range).cast("long")
    seed_scores = _exact_scores(
        base.where(blk.isin(seed_ids)), terms, idfs, k1, b, avg
    )
    kth = (
        seed_scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    )
    if len(kth) < k:
        # not enough docs to prune safely -> exhaustive
        return _exact_scores(base, terms, idfs, k1, b, avg)
    theta = float(kth[-1]["score"])

    cand_blocks = block_ub.where(F.col("ub") >= F.lit(theta)).select("block_id")
    cand = base.join(
        F.broadcast(cand_blocks), on=blk == F.col("block_id"), how="inner"
    ).drop("block_id")
    return _exact_scores(cand, terms, idfs, k1, b, avg)


def ranked_positional_topk_pruned(
    index: InvertedIndex,
    iop,
    k: int = 10,
    seed_docs: int = 4096,
) -> DataFrame:
    """Exact RankedBoolean top-k for a flat #NEAR/n / #WINDOW/n
    -> driver-local (doc_id, score) frame of exactly the ranked top-k.

    RankedBoolean scores a positional op by its merged tf
    (compiler._leaf: QrySopScore.getScoreRankedBoolean), and every
    match the merge emits consumes one position from EACH argument, so
    ``tf(merge) <= min_i tf(term_i)`` — a per-doc upper bound computed
    JVM-side from the scan, before any varbyte decode. Two phases
    mirror ``bm25_topk_pruned``: exactly merge the ``seed_docs``
    highest-bound docs -> θ = k-th exact seed score; any doc beating or
    tying θ has ``bound >= score >= θ``, so the expensive
    ArrowEvalPython merge re-runs only on the ``bound >= θ`` survivors.
    The intermediate (doc_id -> position blobs) frame is persisted for
    the two passes and released before returning — the k-bounded
    result localizes, so no cache escapes to the caller (the
    similarity.py ``_localized`` discipline).

    Scores are the same int tf the exhaustive plan computes (same merge
    kernel, same ``tf > 0`` filter), so rankings are bit-identical; a
    seed phase with fewer than k scoring docs falls back to the
    exhaustive merge over the already-persisted frame. BM25 positional
    queries are NOT pruned here on purpose: the derived op's exposed
    score needs its exact df (count of docs with merged tf>0 —
    QrySopScore semantics), which only the full merge knows.
    """
    from searchengine_spark.operators.positional import positional_merge_udf

    args = list(iop.args)
    n_args = len(args)
    fld = args[0].field
    names = [a.term for a in args]
    cond = (F.col("field") == fld) & F.col("term").isin(names)
    if index.n_buckets:
        cond = cond & F.col("bucket").isin(
            sorted({term_bucket(t, index.n_buckets) for t in names})
        )
    ti = None
    for i, t in enumerate(names):
        m = F.col("term") == t
        ti = F.when(m, F.lit(i)) if ti is None else ti.when(m, F.lit(i))
    rows = index.postings.where(cond).select(
        "doc_id", ti.alias("__ti"), "tf", "positions"
    )
    grouped = (
        rows.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__ti", "positions"))
            ).alias("__pm"),
            F.min("tf").alias("__ub"),
        )
        .where(F.size("__pm") == n_args)  # match-ALL, decode-free
        .persist()
    )

    merge = positional_merge_udf(iop.op, iop.dist, n_args, with_positions=False)
    pcols = [F.element_at(F.col("__pm"), F.lit(i)) for i in range(n_args)]

    def _exact(fr: DataFrame) -> DataFrame:
        return (
            fr.withColumn("__m", merge(*pcols))
            .select("doc_id", F.col("__m.tf").alias("tf"))
            .where(F.col("tf") > 0)
            .select("doc_id", F.col("tf").cast("double").alias("score"))
        )

    spark = index.spark
    schema = "doc_id long, score double"
    seeds = grouped.orderBy(F.desc("__ub"), F.asc("doc_id")).limit(seed_docs)
    seed_top = (
        _exact(seeds).orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    )
    if len(seed_top) < k:
        # tiny/sparse match set: the seed WAS (almost) everything —
        # exhaustive merge over the persisted frame, no second decode
        # of consequence
        out = (
            _exact(grouped).orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        )
        grouped.unpersist()
        return spark.createDataFrame(out, schema)
    theta = float(seed_top[-1]["score"])
    surv = grouped.where(F.col("__ub") >= F.lit(theta))
    out = _exact(surv).orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    grouped.unpersist()
    return spark.createDataFrame(out, schema)
