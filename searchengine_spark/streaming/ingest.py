"""Incremental index maintenance via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10) and the north rule
asks for a *checkpoint-resumable* build. Batch resume is handled by
``index.build.write_index`` manifests; this module adds the streaming
path: new page files land in a directory, a Structured Streaming job
tokenizes each micro-batch and appends **delta posting segments** (plus
delta doc_stats / docs side segments); a compaction merges deltas into
the base index. Exactly-once comes from the streaming checkpoint
(file-source offsets) + idempotent per-batch output paths
(overwrite-by-batch-id).

At scale this is the standard base+delta LSM shape for a live index:
queries union base segments with recent deltas; compaction re-buckets
deltas into the base periodically and refreshes the side tables
(term_stats / doc_stats / block_stats / meta.json) so df/ctf/avg_len
include the delta docs.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchengine_spark.index.build import (
    POSTING_ROW_SCHEMA,
    _bucket_entry,
    _doc_postings_gen,
    _manifest_dir,
)

PAGE_SCHEMA = "doc_id long, url string, warc_ts timestamp, html binary, text string, lang string"


def _batch_rows(docs: DataFrame, field: str = "body", src_col: str = "text",
                analyzer: str = "english") -> DataFrame:
    """Fused tokenize+positions+encode rows (incl. term='' doc_len
    sentinels) — the same shuffle-free kernel as the batch build."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(src_col).cast("string").alias("__src"),
    ).mapInPandas(_doc_postings_gen(analyzer, field, "__src"), POSTING_ROW_SCHEMA)


def batch_postings(docs: DataFrame, field: str = "body", src_col: str = "text",
                   analyzer: str = "english") -> DataFrame:
    """Same tokenize->postings transform as the batch build, per batch."""
    return _batch_rows(docs, field, src_col, analyzer).where(F.col("term") != "")


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    analyzer: str = "english",
    available_now: bool = True,
    field: str = "body",
    reader_options: dict | None = None,
):
    """Stream page parquet files from ``input_dir`` into delta segments.

    Per batch writes three idempotent segments (overwrite-by-batch-id):
    ``delta/batch=N`` postings, ``delta_doc_stats/batch=N`` field
    lengths, ``delta_docs/batch=N`` (doc_id, ext_id) — everything
    ``compact`` needs to fold the docs into the base side tables.

    Returns the StreamingQuery. ``available_now=True`` drains what's
    there and stops (the batch-oriented test/ops mode); continuous mode
    just leaves the trigger default.
    """
    # reader_options: file-source knobs, e.g. maxFilesPerTrigger to
    # bound micro-batch size (availableNow then drains in several
    # batches instead of one giant one — the shape a live crawl has)
    reader = spark.readStream.schema(PAGE_SCHEMA)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = _batch_rows(batch_df, field=field, analyzer=analyzer).persist()
        try:
            out = os.path.join(index_dir, "delta", f"batch={batch_id}")
            rows.where(F.col("term") != "").write.mode("overwrite").parquet(out)
            # doc_len sentinels from the same pass — no second tokenize
            rows.where((F.col("term") == "") & (F.col("doc_len") > 0)).select(
                "doc_id", "field", "doc_len"
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, "delta_doc_stats", f"batch={batch_id}")
            )
            batch_df.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("url").cast("string").alias("ext_id"),
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, "delta_docs", f"batch={batch_id}")
            )
        finally:
            rows.unpersist()

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
        fr = spark.read.parquet(base)
        if "bucket" in fr.columns:
            fr = fr.drop("bucket")
        frames.append(fr)
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


def _delta_union(spark: SparkSession, index_dir: str, name: str) -> DataFrame | None:
    d = os.path.join(index_dir, name)
    if not os.path.isdir(d):
        return None
    return spark.read.option("basePath", d).parquet(d + "/batch=*").drop("batch")


def _swap(tmp: str, final: str) -> None:
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp, final)


def compact(spark: SparkSession, index_dir: str) -> None:
    """Merge delta segments into the base postings (idempotent).

    Two layouts:

    - plain delta-only / unbucketed dir: merged postings are rewritten
      term-partitioned (no side tables to maintain);
    - a persisted ``write_index`` layout (``meta.json`` with buckets):
      the merge re-buckets postings under the ``bucket=`` partition
      column AND rebuilds term_stats / doc_stats / block_stats / docs /
      meta.json from the merged data, refreshing the per-bucket lineage
      manifests with a new fingerprint — so a later ``read_index``
      serves bucket-pruned scans with df/ctf/avg_len that include the
      delta docs.
    """
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        _compact_persisted(spark, index_dir, meta_path)
    else:
        _compact_plain(spark, index_dir)
    for name in ("delta", "delta_doc_stats", "delta_docs"):
        d = os.path.join(index_dir, name)
        if os.path.isdir(d):
            shutil.rmtree(d)


def _compact_plain(spark: SparkSession, index_dir: str) -> None:
    live = read_live_postings(spark, index_dir)
    tmp = os.path.join(index_dir, "postings.compact")
    live.repartition("term").sortWithinPartitions("term", "field", "doc_id").write.mode(
        "overwrite"
    ).parquet(tmp)
    _swap(tmp, os.path.join(index_dir, "postings"))


def _compact_persisted(spark: SparkSession, index_dir: str, meta_path: str) -> None:
    with open(meta_path) as fh:
        meta = json.load(fh)
    buckets = int(meta.get("buckets") or 16)
    block_range = int(meta.get("block_range") or 4096)
    t0 = time.time()

    live = read_live_postings(spark, index_dir)
    salt = int(os.environ.get("SPARK_GRAFT_WRITE_SALT", "8"))
    bucketed = live.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
    )
    post_tmp = os.path.join(index_dir, "postings.compact")
    (
        bucketed.repartition(buckets * salt, "bucket", F.pmod(F.col("doc_id"), F.lit(salt)))
        .sortWithinPartitions("term", "field", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(post_tmp)
    )
    merged = spark.read.parquet(post_tmp)

    ts_tmp = os.path.join(index_dir, "term_stats.compact")
    merged.groupBy("term", "field").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("ctf"),
    ).write.mode("overwrite").parquet(ts_tmp)

    bs_tmp = os.path.join(index_dir, "block_stats.compact")
    merged.groupBy(
        "term", "field", (F.col("doc_id") / block_range).cast("long").alias("block_id")
    ).agg(
        F.max("tf").alias("max_tf"),
        F.min("doc_len").alias("min_len"),
        F.count(F.lit(1)).alias("n"),
    ).write.mode("overwrite").parquet(bs_tmp)

    # doc_stats: base ∪ delta (delta wins nothing — docs are append-only;
    # dedup keeps one row per (doc_id, field))
    ds_frames = []
    base_ds = os.path.join(index_dir, "doc_stats")
    if os.path.isdir(base_ds):
        ds_frames.append(spark.read.parquet(base_ds).select("doc_id", "field", "doc_len"))
    delta_ds = _delta_union(spark, index_dir, "delta_doc_stats")
    if delta_ds is None:
        # legacy deltas without side segments: derive lengths from postings
        delta_post = _delta_union(spark, index_dir, "delta")
        if delta_post is not None:
            delta_ds = delta_post.select("doc_id", "field", "doc_len").distinct()
    if delta_ds is not None:
        ds_frames.append(delta_ds.select("doc_id", "field", "doc_len"))
    doc_stats = ds_frames[0]
    for fr in ds_frames[1:]:
        doc_stats = doc_stats.unionByName(fr)
    doc_stats = doc_stats.dropDuplicates(["doc_id", "field"])
    ds_tmp = os.path.join(index_dir, "doc_stats.compact")
    doc_stats.write.mode("overwrite").parquet(ds_tmp)

    # docs table: base ∪ delta_docs, keeping every base metadata column
    # (n_chars/lang/... — getAttribute reads them); delta rows carry only
    # (doc_id, ext_id) and ext_id falls back to the doc_id string for
    # legacy deltas that carried no docs segment
    docs_frames = []
    base_docs = os.path.join(index_dir, "docs")
    if os.path.isdir(base_docs):
        docs_frames.append(spark.read.parquet(base_docs))
    delta_docs = _delta_union(spark, index_dir, "delta_docs")
    if delta_docs is None:
        delta_post = _delta_union(spark, index_dir, "delta")
        if delta_post is not None:
            delta_docs = delta_post.select("doc_id").distinct().select(
                "doc_id", F.col("doc_id").cast("string").alias("ext_id")
            )
    if delta_docs is not None:
        docs_frames.append(delta_docs.select("doc_id", "ext_id"))
    docs = docs_frames[0]
    for fr in docs_frames[1:]:
        docs = docs.unionByName(fr, allowMissingColumns=True)
    docs = docs.dropDuplicates(["doc_id"])
    docs_tmp = os.path.join(index_dir, "docs.compact")
    docs.write.mode("overwrite").parquet(docs_tmp)

    new_ds = spark.read.parquet(ds_tmp)
    # count from the merged docs table — doc_stats excludes zero-length
    # docs, so counting its distinct ids would undercount N (and skew idf)
    n_docs = max(
        int(meta.get("n_docs") or 0),
        spark.read.parquet(docs_tmp).count(),
    )
    field_stats = {
        r["field"]: {
            "doc_count": int(r["doc_count"]),
            "sum_len": int(r["sum_len"]),
            "avg_len": float(r["sum_len"]) / max(1, int(r["doc_count"])),
        }
        for r in new_ds.groupBy("field")
        .agg(F.count(F.lit(1)).alias("doc_count"), F.sum("doc_len").alias("sum_len"))
        .collect()
    }
    for fld in meta.get("fields", []):
        field_stats.setdefault(fld, {"doc_count": 0, "sum_len": 0, "avg_len": 0.0})

    # swap everything in, then refresh meta + manifests
    _swap(post_tmp, os.path.join(index_dir, "postings"))
    _swap(ts_tmp, os.path.join(index_dir, "term_stats"))
    _swap(bs_tmp, os.path.join(index_dir, "block_stats"))
    _swap(ds_tmp, os.path.join(index_dir, "doc_stats"))
    _swap(docs_tmp, os.path.join(index_dir, "docs"))

    fp = f"compact|ndocs={n_docs}|analyzer={meta.get('analyzer')}|fields={','.join(meta.get('fields', []))}"
    meta.update(
        {"n_docs": n_docs, "field_stats": field_stats, "fingerprint": fp,
         "buckets": buckets, "block_range": block_range}
    )
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, meta_path)

    os.makedirs(_manifest_dir(index_dir), exist_ok=True)
    wall = round(time.time() - t0, 3)
    for b in range(buckets):
        bdir = os.path.join(index_dir, "postings", f"bucket={b}")
        nbytes = (
            sum(
                os.path.getsize(os.path.join(bdir, f))
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
            if os.path.isdir(bdir)
            else 0
        )
        rec = {
            "bucket": b,
            "fingerprint": fp,
            "status": "ok",
            "bytes": nbytes,
            "wall_sec_total_job": wall,
            "compacted": True,
        }
        tmp = _bucket_entry(index_dir, b) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, _bucket_entry(index_dir, b))
