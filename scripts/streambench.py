"""Streaming-ingest scale bench: live-index maintenance at crawl volume.

    STREAMBENCH_PAGES=400000 STREAMBENCH_CPUS=32 python scripts/streambench.py

The batch scale story (scripts/scalebench.py) covers build+query; this
covers the OTHER lifecycle a web-scale index lives in: a base index
exists, new crawl files keep landing, and the engine must (a) ingest
them as micro-batched delta segments with exactly-once checkpointing,
(b) serve base+delta queries live, (c) compact deltas into the
bucket-pruned base with refreshed stats. Writes ``STREAMBENCH.json``:

- base build+persist for the first half of the pages;
- micro-batched ingest of the second half (``maxFilesPerTrigger``
  bounds batch size, so availableNow drains in several real
  micro-batches — the shape a live crawl has) with streaming docs/s;
- live base+delta postings count (pre-compaction serving path);
- compaction wall; post-compaction bucket-pruned BM25 query latency
  and doc-count correctness check.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("STREAMBENCH_PAGES", "400000"))
CPUS = int(os.environ.get("STREAMBENCH_CPUS", "32"))
N_FILES = int(os.environ.get("STREAMBENCH_FILES", "64"))
FILES_PER_TRIGGER = int(os.environ.get("STREAMBENCH_FILES_PER_TRIGGER", "8"))


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.corpus import extract_fields, make_pages
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.index.build import (
        assign_doc_ids,
        build_index,
        read_index,
        write_index,
    )
    from searchengine_spark.session import get_spark
    from searchengine_spark.streaming import ingest

    spark = get_spark("streambench", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    half = N_PAGES // 2
    report: dict = {
        "n_pages_base": half,
        "n_pages_streamed": N_PAGES - half,
        "cpus": CPUS,
        "n_input_files": N_FILES,
        "max_files_per_trigger": FILES_PER_TRIGGER,
    }
    root = tempfile.mkdtemp(prefix="streambench_")
    in_dir = os.path.join(root, "incoming")
    idx_dir = os.path.join(root, "index")
    ckpt = os.path.join(root, "ckpt")
    report["index_dir"] = idx_dir

    # --- base index over the first half ------------------------------------
    pages = make_pages(spark, N_PAGES, seed=42, partitions=4 * CPUS).persist()
    pages.count()
    # doc ids assigned over the FULL corpus so the streamed half lands
    # with ids disjoint from (and consistent with) the base half
    docs_all = assign_doc_ids(extract_fields(pages), ext_id_col="url")
    base_docs = docs_all.where(F.col("doc_id") < half)
    t0 = time.time()
    idx0 = build_index(
        base_docs, fields={"body": "body"}, ext_id_col="url", analyzer="english",
        cache=True,
    )
    idx0.postings.count()
    write_index(idx0, idx_dir, buckets=32)
    report["base_build_write_sec"] = round(time.time() - t0, 3)
    idx0.release()

    # --- stage the second half as N_FILES crawl files ----------------------
    stream_docs = docs_all.where(F.col("doc_id") >= half)
    staged = (
        pages.join(stream_docs.select("doc_id", F.col("url").alias("__u")),
                   on=pages.url == F.col("__u"))
        .select("doc_id", "url", "warc_ts", "html", "text", "lang")
    )
    staged.repartition(N_FILES).write.mode("overwrite").parquet(in_dir)
    pages.unpersist()

    # --- micro-batched ingest ----------------------------------------------
    t0 = time.time()
    q = ingest.start_ingest(
        spark, in_dir, idx_dir, ckpt,
        reader_options={"maxFilesPerTrigger": FILES_PER_TRIGGER},
    )
    q.awaitTermination()
    ingest_sec = time.time() - t0
    report["ingest_sec"] = round(ingest_sec, 3)
    report["streamed_docs_per_sec"] = round((N_PAGES - half) / ingest_sec, 1)
    n_batches = len(os.listdir(os.path.join(idx_dir, "delta")))
    report["n_micro_batches"] = n_batches

    # --- live base+delta serving path --------------------------------------
    t0 = time.time()
    n_live = ingest.read_live_postings(spark, idx_dir).count()
    report["live_postings_count_sec"] = round(time.time() - t0, 3)
    report["n_live_postings"] = int(n_live)

    # --- compaction + post-compaction query --------------------------------
    t0 = time.time()
    ingest.compact(spark, idx_dir)
    report["compact_sec"] = round(time.time() - t0, 3)

    idx = read_index(spark, idx_dir)
    assert idx.n_docs == N_PAGES, (idx.n_docs, N_PAGES)
    eng = SearchEngine(idx)
    fn = lambda: eng.search(  # noqa: E731
        "cerim dirim bavex", model="bm25", k=10, with_ext_id=False
    ).collect()
    fn()
    report["post_compact_q_bm25_sec"] = round(min(
        (lambda t=time.time(): (fn(), time.time() - t)[1])() for _ in range(3)
    ), 3)
    report["n_docs_after_compact"] = int(idx.n_docs)

    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "STREAMBENCH.json"), "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
