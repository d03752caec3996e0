"""SearchEngine facade — the reference's QryEval loop, Spark-first.

Reference lifecycle (QryEval.java:31-59, 118-195): read params, open
index, per query: wrap with the model's default operator, parse,
optimize, evaluate, sort by (score desc, external id asc), truncate,
write trec lines. Here every step is declarative: parse -> AST ->
DataFrame plan -> TakeOrderedAndProject top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.analyzer import get_analyzer
from searchengine_spark.index.build import InvertedIndex
from searchengine_spark.operators.topk import attach_ext_ids, topk, topk_grouped
from searchengine_spark.plans.ast import SopNode, TermNode
from searchengine_spark.plans.compiler import Compiler
from searchengine_spark.plans.models import make_model
from searchengine_spark.plans.parser import QueryParser


def _flat_sum_leaves(ast) -> list[TermNode] | None:
    """TermNode leaves when ``ast`` is a bag-of-words BM25 shape —
    ``#SUM`` of ``#SCORE(term)`` args or a single ``#SCORE(term)`` —
    else None (the fused batch path only covers this shape)."""
    if not isinstance(ast, SopNode):
        return None
    if ast.op == "score" and isinstance(ast.args[0], TermNode):
        return [ast.args[0]]
    if ast.op == "sum" and all(
        isinstance(a, SopNode)
        and a.op == "score"
        and isinstance(a.args[0], TermNode)
        for a in ast.args
    ):
        return [a.args[0] for a in ast.args]
    return None


class SearchEngine:
    def __init__(self, index: InvertedIndex, fields: tuple | None = None):
        self.index = index
        self.fields = tuple(fields) if fields else tuple(index.fields)
        self.analyzer = get_analyzer(index.analyzer)
        self.parser = QueryParser(
            analyzer=self.analyzer,
            fields=self.fields,
            default_field="body" if "body" in self.fields else self.fields[0],
        )
        self._compilers: dict = {}

    # ------------------------------------------------------------------

    def _model(self, model, **params):
        return make_model(model, **params) if isinstance(model, str) else model

    def compiler(self, model) -> Compiler:
        key = model
        if key not in self._compilers:
            self._compilers[key] = Compiler(self.index, model)
        return self._compilers[key]

    def parse(self, query: str, model) -> object:
        """Wrap with the model default op, parse + optimize -> AST or None."""
        return self.parser.parse(query, default_op=model.default_op)

    def scores(self, query: str, model="bm25", **params) -> DataFrame:
        """Full (doc_id, score) frame for a query (unranked, untruncated)."""
        m = self._model(model, **params)
        ast = self.parse(query, m)
        out = self.compiler(m).compile(ast)
        # derived-operator frames persisted for stats are registered on
        # index._temps; keep only a bounded working set alive
        self.index.trim_temps()
        return out

    def search(
        self, query: str, model="bm25", k: int = 100, with_ext_id: bool = True, **params
    ) -> DataFrame:
        """Top-k (doc_id[, ext_id], score, rank), reference tie-break."""
        ranked = topk(self.scores(query, model, **params), k)
        if with_ext_id:
            ranked = attach_ext_ids(ranked, self.index.docs).select(
                "doc_id", "ext_id", "score", "rank"
            )
        return ranked.orderBy("rank")

    def run_batch(
        self,
        queries: list[tuple[str, str]],
        model="bm25",
        k: int = 100,
        fused: bool | str = "auto",
        **params,
    ) -> DataFrame:
        """Evaluate (qid, query) pairs -> (qid, doc_id, ext_id, score, rank).

        ``fused="auto"`` (default) compiles every bag-of-words BM25
        query in the batch into ONE plan: a broadcast (qid, term, idf)
        table joined against a single term-IN postings scan, one
        groupBy(qid, doc_id) with the order-fixed fold, one per-qid
        top-k window — batch-size-independent scan count, the shape a
        10k-query batch needs. Scores are bit-identical to the
        per-query path (same leaf float ops, same fold), so rankings
        match exactly. Queries outside the shape (structured operators,
        non-BM25 models) fall back to unioned per-query plans;
        ``fused=False`` forces the union path for everything.
        """
        m = self._model(model, **params)
        comp = self.compiler(m)
        parsed = []
        for qid, q in queries:
            ast = self.parse(q, m)
            if ast is None:
                continue  # empty query (QryEval.java:131)
            parsed.append((qid, ast))

        fused_items: list[tuple[str, list[TermNode]]] = []
        rest: list[tuple[str, object]] = []
        if fused and getattr(m, "name", "") == "bm25":
            for qid, ast in parsed:
                leaves = _flat_sum_leaves(ast)
                if leaves is not None:
                    fused_items.append((qid, leaves))
                else:
                    rest.append((qid, ast))
        else:
            rest = parsed

        frames = []
        if fused_items:
            frames.append(self._fused_bm25_batch(comp, fused_items, k))
        for qid, ast in rest:
            frames.append(topk(comp.compile(ast), k).withColumn("qid", F.lit(qid)))
        if not frames:
            return self.index.spark.createDataFrame(
                [], "qid string, doc_id long, ext_id string, score double, rank int"
            )
        u = frames[0]
        for fr in frames[1:]:
            u = u.unionByName(fr)
        out = attach_ext_ids(u, self.index.docs)
        return out.select("qid", "doc_id", "ext_id", "score", "rank").orderBy(
            "qid", "rank"
        )

    def _fused_bm25_batch(
        self, comp: Compiler, items: list[tuple[str, list[TermNode]]], k: int
    ) -> DataFrame:
        """One plan for the whole BM25 bag-of-words batch.

        Per-term idf constants come from ONE driver-side stats collect
        (comp.prefetch_term_stats); the per-(qid, term) rows ship as a
        broadcast table, so the postings scan count is per-FIELD, not
        per-query. Missing terms contribute no row — BM25's absent-term
        score is 0, matching the per-query union of term frames.
        """
        spark = self.index.spark
        m = comp.model
        all_terms = tuple({t for _, leaves in items for t in leaves})
        comp.prefetch_term_stats(SopNode("sum", all_terms))

        n = float(self.index.n_docs)
        by_field: dict[str, list] = {}
        for qid, leaves in items:
            for i, t in enumerate(leaves):
                by_field.setdefault(t.field, []).append((qid, i, t.term))

        frames = []
        for fld, rows in by_field.items():
            avg = self.index.avg_len(fld)
            qt_rows = []
            for qid, i, term in rows:
                df, _ctf = comp.term_stats.get((term, fld), (0, 0))
                idf = (
                    max(0.0, math.log((n - df + 0.5) / (df + 0.5))) if avg > 0 else 0.0
                )
                qt_rows.append((qid, i, term, idf))
            qt = spark.createDataFrame(
                qt_rows, "qid string, __ti int, term string, __idf double"
            )
            terms = sorted({r[2] for r in rows})
            cond = (F.col("field") == fld) & F.col("term").isin(terms)
            if self.index.n_buckets:
                # resolve the terms' bucket dirs with one local-relation
                # microjob -> literal IN prunes the partition listing
                buckets = [
                    int(r[0])
                    for r in spark.createDataFrame([(t,) for t in terms], "t string")
                    .select(
                        F.pmod(F.xxhash64("t"), F.lit(self.index.n_buckets))
                    )
                    .distinct()
                    .collect()
                ]
                cond = cond & F.col("bucket").isin(buckets)
            tf = F.col("tf").cast("double")
            denom = tf + F.lit(m.k1) * (
                F.lit(1.0 - m.b) + F.lit(m.b) * F.col("doc_len") / F.lit(avg)
            )
            frames.append(
                self.index.postings.where(cond)
                .join(F.broadcast(qt), on="term")
                .select(
                    "qid",
                    "doc_id",
                    "__ti",
                    (F.col("__idf") * tf / denom).alias("score"),
                )
            )
        u = frames[0]
        for fr in frames[1:]:
            u = u.unionByName(fr)
        scored = u.groupBy("qid", "doc_id").agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(__ti, score))), "
                "cast(0.0 as double), (acc, x) -> acc + x.score)"
            ).alias("score")
        )
        return topk_grouped(scored, k).select("qid", "doc_id", "score", "rank")
