"""Forward index (reference TermVector, TermVector.java:22-41).

Per (doc, field): the stems present, their frequencies, and positions —
derived from the postings table by one groupBy (no extra state to
maintain); used by expansion/LeToR-style consumers that want doc
vectors rather than term lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from searchengine_spark.index.build import InvertedIndex


def forward_index(index: InvertedIndex, fields: list[str] | None = None) -> DataFrame:
    """(doc_id, field, stems array<string>, tfs array<int>) — stem order
    deterministic (alphabetical), mirroring TermVector's stems[]/stemsFreq[]."""
    p = index.postings
    if fields:
        p = p.where(F.col("field").isin(list(fields)))
    return (
        p.groupBy("doc_id", "field")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("term"), F.col("tf")))
            ).alias("__pairs")
        )
        .select(
            "doc_id",
            "field",
            F.col("__pairs.term").alias("stems"),
            F.col("__pairs.tf").alias("tfs"),
        )
    )


def term_vector(index: InvertedIndex, doc_id: int, field: str) -> dict:
    """Driver-side doc vector for one (doc, field) — inspection helper
    (InspectIndex -list-termvector equivalent)."""
    rows = (
        index.postings.where(
            (F.col("doc_id") == int(doc_id)) & (F.col("field") == field)
        )
        .select("term", "tf")
        .collect()
    )
    return {r["term"]: int(r["tf"]) for r in sorted(rows, key=lambda r: r["term"])}
