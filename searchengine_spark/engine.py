"""SearchEngine facade — the reference's QryEval loop, Spark-first.

Reference lifecycle (QryEval.java:31-59, 118-195): read params, open
index, per query: wrap with the model's default operator, parse,
optimize, evaluate, sort by (score desc, external id asc), truncate,
write trec lines. Here every step is declarative: parse -> AST ->
DataFrame plan -> TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.analyzer import get_analyzer
from searchengine_spark.index.build import InvertedIndex
from searchengine_spark.operators.topk import attach_ext_ids, topk
from searchengine_spark.plans.compiler import Compiler
from searchengine_spark.plans.models import make_model
from searchengine_spark.plans.parser import QueryParser


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
        self, queries: list[tuple[str, str]], model="bm25", k: int = 100, **params
    ) -> DataFrame:
        """Evaluate (qid, query) pairs -> (qid, doc_id, ext_id, score, rank).

        Per-query plans are unioned and ranked together; Spark schedules
        the independent subplans concurrently.
        """
        m = self._model(model, **params)
        comp = self.compiler(m)
        frames = []
        for qid, q in queries:
            ast = self.parse(q, m)
            if ast is None:
                continue  # empty query (QryEval.java:131)
            fr = topk(comp.compile(ast), k).withColumn("qid", F.lit(qid))
            frames.append(fr)
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
