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


def _ranked_rows(df):
    return [(r["doc_id"], r["score"], r["rank"]) for r in df.collect()]


@pytest.mark.parametrize("q", ["#near/3(table value)", "#window/6(scan fast)"])
def test_positional_pruned_rank_identical(spark, doc_index, q):
    """RankedBoolean positional pruning (min-term-tf bound) must return
    the exact same ranked top-k as the exhaustive merge."""
    eng = SearchEngine(doc_index)
    exact = eng.search(q, model="rankedboolean", k=10, with_ext_id=False, prune=False)
    pruned = eng.search(q, model="rankedboolean", k=10, with_ext_id=False, prune=True)
    rows = _ranked_rows(exact)
    assert rows == _ranked_rows(pruned)
    assert rows  # the query actually matches something


def test_positional_pruned_seed_smaller_than_corpus(spark, doc_index):
    """Force a tiny seed so the θ/survivor phase genuinely runs (not
    the <k fallback) and still reproduces the exhaustive ranking."""
    from searchengine_spark.operators.wand import ranked_positional_topk_pruned
    from searchengine_spark.plans.ast import IopNode, TermNode

    iop = IopNode(
        "near",
        (TermNode("table", "body"), TermNode("value", "body")),
        dist=3,
        field="body",
    )
    eng = SearchEngine(doc_index)
    exact = eng.search(
        "#near/3(table value)", model="rankedboolean", k=5, with_ext_id=False,
        prune=False,
    ).select("doc_id", "score").collect()
    got = (
        ranked_positional_topk_pruned(doc_index, iop, k=5, seed_docs=8)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    )
    assert [(r["doc_id"], r["score"]) for r in exact] == [
        (r["doc_id"], r["score"]) for r in got
    ]
    assert got


def test_search_prune_forced_identical_bm25(spark, doc_index):
    eng = SearchEngine(doc_index)
    q = "dup spark merge"
    exact = eng.search(q, model="bm25", k=10, with_ext_id=False, prune=False)
    pruned = eng.search(q, model="bm25", k=10, with_ext_id=False, prune=True)
    assert _ranked_rows(exact) == _ranked_rows(pruned)


def test_auto_threshold_routes_small_queries_exhaustive(spark, doc_index):
    """At sf0.01 posting volumes, prune='auto' must return None from
    _pruned_topk (volume below PRUNE_MIN_POSTINGS) so small corpora
    keep the zero-extra-action exhaustive plan."""
    from searchengine_spark.plans.models import BM25

    eng = SearchEngine(doc_index)
    m = BM25()
    ast = eng.parse("dup spark merge", m)
    assert eng._pruned_topk(m, ast, 10, "auto") is None
    assert eng._pruned_topk(m, ast, 10, False) is None
    assert eng._pruned_topk(m, ast, 10, True) is not None


def test_run_batch_prunes_rest_queries(spark, doc_index):
    """A RankedBoolean positional batch (non-fused 'rest' shape) with
    prune=True matches the prune=False batch exactly."""
    eng = SearchEngine(doc_index)
    batch = [("q1", "#near/3(table value)"), ("q2", "#window/6(scan fast)")]
    a = eng.run_batch(batch, model="rankedboolean", k=5, prune=False).collect()
    b = eng.run_batch(batch, model="rankedboolean", k=5, prune=True).collect()
    key = lambda r: (r["qid"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[4])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[4])
    )
    assert a
