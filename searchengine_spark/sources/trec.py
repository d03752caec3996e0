"""trec_eval-format sources and sinks (reference file formats).

- run files: ``qid Q0 externalId rank score runid`` with ``%.18f``
  scores and a dummy row for empty results (QryEval.printResults,
  QryEval.java:212-232).
- qrels: ``qid 0 externalId rel`` (RetrievalModelLeToR.java:285-315).
- query files: ``qid: querystring`` lines (QryEval.java:172-180).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

RUN_SCHEMA = "qid string, q0 string, ext_id string, rank int, score double, run_id string"
QRELS_SCHEMA = "qid string, zero string, ext_id string, rel int"


def read_run_file(spark: SparkSession, path: str) -> DataFrame:
    """Read a trec_eval run file (whitespace-separated columns)."""
    return (
        spark.read.csv(path, sep=" ", schema=RUN_SCHEMA)
        .where(F.col("ext_id").isNotNull())
    )


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, sep=" ", schema=QRELS_SCHEMA)


def read_query_file(path: str) -> list[tuple[str, str]]:
    """Driver-side read of ``qid: query`` lines (files are tiny)."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            qid, _, query = line.partition(":")
            out.append((qid.strip(), query.strip()))
    return out


def format_run_lines(ranked: DataFrame, run_id: str = "reference") -> DataFrame:
    """ranked (qid, ext_id, rank, score) -> single-column trec lines."""
    return ranked.select(
        F.format_string(
            "%s Q0 %s %d %.18f %s",
            F.col("qid"),
            F.col("ext_id"),
            F.col("rank"),
            F.col("score"),
            F.lit(run_id),
        ).alias("value")
    )


def dummy_line(qid: str, run_id: str = "reference") -> str:
    """Empty-result placeholder row (QryEval.java:220-222)."""
    return f"{qid} Q0 dummy 1 0.000000000000000000 {run_id}"


def write_run_file(
    ranked_rows: list, path: str, run_id: str = "reference", all_qids: list | None = None
) -> None:
    """Driver-side run-file writer for collected top-k rows.

    ``ranked_rows``: Row/tuple (qid, ext_id, rank, score), pre-sorted.
    ``all_qids`` lets empty queries still emit their dummy row.
    """
    seen = set()
    with open(path, "w") as fh:
        for r in ranked_rows:
            qid, ext_id, rank, score = r[0], r[1], int(r[2]), float(r[3])
            seen.add(qid)
            fh.write(f"{qid} Q0 {ext_id} {rank} {score:.18f} {run_id}\n")
        for qid in all_qids or []:
            if qid not in seen:
                fh.write(dummy_line(qid, run_id) + "\n")
