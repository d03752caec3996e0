"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 query end-to-end (index build ->
structured query -> ranked results) on sf0.001. ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2
plus the training-data pipeline operators; definitions live in
searchengine_spark/gate.py next to their ANSI-SQL oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from searchengine_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 #SUM over the sf0.001 documents table, top-50."""
    fn, _ = gate.registry()["bm25_sum"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in gate.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in gate.registry().items() if sql is not None
    }
