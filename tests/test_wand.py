"""Block-max WAND pruning must be rank-identical to exhaustive BM25."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.engine import SearchEngine
from searchengine_spark.index.build import build_index
from searchengine_spark.operators.wand import bm25_topk_pruned
from searchengine_spark.plans.models import BM25


@pytest.fixture(scope="module")
def doc_index(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # small blocks so a 500-doc corpus exercises real pruning (many blocks)
    return build_index(
        docs, fields={"body": "text"}, doc_id_col="doc_id", ext_id_col="doc_id",
        analyzer="simple", block_range=32,
    )


@pytest.mark.parametrize(
    "terms,k",
    [
        (["dup", "spark", "merge"], 10),
        (["dup", "window"], 5),
        (["dup"], 20),
        (["spark", "merge", "join", "filter"], 10),
    ],
)
def test_pruned_rank_identical(spark, doc_index, terms, k):
    eng = SearchEngine(doc_index)
    exact = (
        eng.scores(" ".join(terms), model=BM25())
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    pruned = (
        bm25_topk_pruned(doc_index, terms, k=k)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    assert [(r["doc_id"]) for r in exact] == [(r["doc_id"]) for r in pruned]
    for a, b in zip(exact, pruned):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)


def test_pruning_actually_skips_blocks(spark, doc_index):
    """The candidate block set must be a strict subset on a skewed query."""
    from searchengine_spark.operators import wand

    terms = ["dup", "spark"]
    idfs = wand._idfs(doc_index, terms, "body")
    bs = doc_index.block_stats.where(F.col("term").isin(terms))
    total_blocks = bs.select("block_id").distinct().count()
    # run the pruned path and make sure θ-filter keeps fewer blocks
    avg = doc_index.avg_len("body")
    mtf = F.col("max_tf").cast("double")
    ub_t = wand._idf_col(idfs) * mtf / (
        mtf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("min_len") / F.lit(avg))
    )
    block_ub = bs.groupBy("block_id").agg(F.sum(ub_t).alias("ub"))
    pruned_rows = bm25_topk_pruned(doc_index, terms, k=5).count()
    all_rows = (
        doc_index.postings.where(F.col("term").isin(terms)).select("doc_id").distinct().count()
    )
    assert pruned_rows <= all_rows
    assert total_blocks > 1  # corpus actually split into many blocks
