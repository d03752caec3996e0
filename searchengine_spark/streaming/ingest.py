"""Incremental index maintenance via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10) and the north rule
asks for a *checkpoint-resumable* build. Batch resume is handled by
``index.build.write_index`` manifests; this module adds the streaming
path: new page files land in a directory, a Structured Streaming job
tokenizes each micro-batch and appends **delta posting segments**; a
compaction merges deltas into the base index. Exactly-once comes from
the streaming checkpoint (file-source offsets) + idempotent per-batch
output paths (overwrite-by-batch-id).

At scale this is the standard base+delta LSM shape for a live index:
queries union base segments with recent deltas; compaction re-buckets
deltas into the base periodically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchengine_spark.analyzer import tokenize_udf
from searchengine_spark.index.build import _encode_positions_udf

PAGE_SCHEMA = "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"


def batch_postings(docs: DataFrame, field: str = "body", src_col: str = "text",
                   analyzer: str = "english") -> DataFrame:
    """Same tokenize->postings transform as the batch build, per batch."""
    tok = tokenize_udf(analyzer)
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tok(F.col(src_col).cast("string")).alias("toks"),
    ).select("doc_id", "toks", F.size("toks").alias("doc_len"))
    return (
        toks.select("doc_id", "doc_len", F.posexplode("toks").alias("pos", "term"))
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.first("doc_len").cast("int").alias("doc_len"),
            F.sort_array(F.collect_list("pos")).alias("pos_arr"),
        )
        .select(
            "term",
            F.lit(field).alias("field"),
            "doc_id",
            "tf",
            "doc_len",
            _encode_positions_udf("pos_arr").alias("positions"),
        )
    )


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    analyzer: str = "english",
    available_now: bool = True,
):
    """Stream page parquet files from ``input_dir`` into delta segments.

    Returns the StreamingQuery. ``available_now=True`` drains what's
    there and stops (the batch-oriented test/ops mode); continuous mode
    just leaves the trigger default.
    """
    stream = spark.readStream.schema(PAGE_SCHEMA).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(index_dir, "delta", f"batch={batch_id}")
        batch_postings(batch_df, analyzer=analyzer).write.mode("overwrite").parquet(out)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_live_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    """Union all delta segments (add the base postings if present)."""
    delta_dir = os.path.join(index_dir, "delta")
    frames = []
    base = os.path.join(index_dir, "postings")
    if os.path.isdir(base):
        frames.append(spark.read.parquet(base).drop("bucket"))
    if os.path.isdir(delta_dir):
        frames.append(
            spark.read.option("basePath", delta_dir).parquet(delta_dir + "/batch=*").drop("batch")
        )
    if not frames:
        raise FileNotFoundError(f"no postings under {index_dir}")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def compact(spark: SparkSession, index_dir: str) -> None:
    """Merge delta segments into the base postings (idempotent)."""
    live = read_live_postings(spark, index_dir)
    tmp = os.path.join(index_dir, "postings.compact")
    live.repartition("term").sortWithinPartitions("term", "field", "doc_id").write.mode(
        "overwrite"
    ).parquet(tmp)
    final = os.path.join(index_dir, "postings")
    import shutil

    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    delta_dir = os.path.join(index_dir, "delta")
    if os.path.isdir(delta_dir):
        shutil.rmtree(delta_dir)
