"""Compaction lifecycle endurance: N ingest+minor cycles, then MAJOR.

    STREAMBENCH_CYCLES_PAGES=400000 STREAMBENCH_CYCLES_N=8 \
        python scripts/streambench_cycles.py   # -> STREAMBENCH_CYCLES.json

scripts/streambench.py proves ONE minor fold is O(delta); this answers
the endurance questions a live crawl raises (VERDICT r4 item 6): does
segment count stay bounded, does read amplification creep into live
query latency as minor segments accumulate, and does a periodic MAJOR
fold recover the single-segment baseline? Per cycle it stages a
``DELTA_FRACTION`` slice of new pages as crawl files, drains them with
the streaming ingest, runs a minor compaction, and records ingest/fold
walls, segment counts, postings bytes written, and warm BM25 query
latency; after N cycles a MAJOR fold runs and the same query must
return byte-identical top-10 (round-6) before and after.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_PAGES = int(os.environ.get("STREAMBENCH_CYCLES_PAGES", "400000"))
N_CYCLES = int(os.environ.get("STREAMBENCH_CYCLES_N", "8"))
CPUS = int(os.environ.get("STREAMBENCH_CYCLES_CPUS", "32"))
DELTA_FRACTION = float(os.environ.get("STREAMBENCH_CYCLES_DELTA", "0.05"))
OUT = os.environ.get(
    "STREAMBENCH_CYCLES_OUT", os.path.join(REPO, "STREAMBENCH_CYCLES.json")
)
QUERY = "cerim dirim bavex"


def _n_segments(idx_dir: str) -> int:
    segs = set()
    for _root, dirs, _files in os.walk(os.path.join(idx_dir, "postings")):
        segs.update(d for d in dirs if d.startswith("seg="))
    return len(segs)


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.corpus import extract_fields, make_pages
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.index.build import (
        _dir_parquet_bytes,
        assign_doc_ids,
        build_index,
        read_index,
        write_index,
    )
    from searchengine_spark.session import get_spark
    from searchengine_spark.streaming import ingest

    spark = get_spark("streambench-cycles", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    delta_pages = int(BASE_PAGES * DELTA_FRACTION)
    total_pages = BASE_PAGES + N_CYCLES * delta_pages
    report: dict = {
        "n_pages_base": BASE_PAGES,
        "n_cycles": N_CYCLES,
        "delta_pages_per_cycle": delta_pages,
        "delta_fraction": DELTA_FRACTION,
        "cpus": CPUS,
    }
    root = tempfile.mkdtemp(prefix="streambench_cycles_")
    in_dir = os.path.join(root, "incoming")
    idx_dir = os.path.join(root, "index")
    ckpt = os.path.join(root, "ckpt")
    report["index_dir"] = idx_dir

    pages = make_pages(spark, total_pages, seed=42, partitions=4 * CPUS).persist()
    pages.count()
    docs_all = assign_doc_ids(extract_fields(pages), ext_id_col="url")

    t0 = time.time()
    idx0 = build_index(
        docs_all.where(F.col("doc_id") < BASE_PAGES),
        fields={"body": "body"}, ext_id_col="url", analyzer="english", cache=True,
    )
    idx0.postings.count()
    write_index(idx0, idx_dir, buckets=32)
    report["base_build_write_sec"] = round(time.time() - t0, 3)
    idx0.release()
    base_bytes = _dir_parquet_bytes(os.path.join(idx_dir, "postings"))
    report["base_postings_bytes"] = int(base_bytes)

    def _warm_query_sec() -> tuple[float, list]:
        idx = read_index(spark, idx_dir)
        eng = SearchEngine(idx)
        fn = lambda: eng.search(  # noqa: E731
            QUERY, model="bm25", k=10, with_ext_id=False
        ).collect()
        rows = fn()  # warm-up
        best = min(
            (lambda t=time.time(): (fn(), time.time() - t)[1])() for _ in range(3)
        )
        top10 = [(r["doc_id"], round(r["score"], 6)) for r in rows]
        idx.release()
        return best, top10

    q0, _ = _warm_query_sec()
    report["q_bm25_base_sec"] = round(q0, 3)
    report["n_segments_base"] = _n_segments(idx_dir)

    cycles = []
    prev_bytes = base_bytes
    for c in range(N_CYCLES):
        lo = BASE_PAGES + c * delta_pages
        hi = lo + delta_pages
        sel = docs_all.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        staged = pages.join(
            sel.select("doc_id", F.col("url").alias("__u")),
            on=pages.url == F.col("__u"),
        ).select("doc_id", "url", "warc_ts", "html", "text", "lang")
        # append: new part files land beside earlier cycles'; the shared
        # checkpoint makes the availableNow drain pick up only the new ones
        staged.repartition(8).write.mode("append").parquet(in_dir)

        entry: dict = {"cycle": c + 1}
        t0 = time.time()
        q = ingest.start_ingest(
            spark, in_dir, idx_dir, ckpt,
            reader_options={"maxFilesPerTrigger": 4},
        )
        q.awaitTermination()
        entry["ingest_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        info = ingest.compact(spark, idx_dir)
        entry["compact_minor_sec"] = round(time.time() - t0, 3)
        entry["compact_mode"] = info.get("mode")

        cur_bytes = _dir_parquet_bytes(os.path.join(idx_dir, "postings"))
        entry["postings_bytes_written"] = int(cur_bytes - prev_bytes)
        prev_bytes = cur_bytes
        entry["n_segments"] = _n_segments(idx_dir)
        qsec, _ = _warm_query_sec()
        entry["q_bm25_sec"] = round(qsec, 3)
        cycles.append(entry)
        print(json.dumps(entry))
    report["cycles"] = cycles

    # --- MAJOR fold: recover the single-segment baseline --------------------
    _, top_before = _warm_query_sec()
    t0 = time.time()
    info = ingest.compact(spark, idx_dir, full_rewrite=True)
    report["compact_major_sec"] = round(time.time() - t0, 3)
    report["compact_major_mode"] = info.get("mode")
    report["n_segments_after_major"] = _n_segments(idx_dir)
    qsec, top_after = _warm_query_sec()
    report["q_bm25_after_major_sec"] = round(qsec, 3)
    assert top_before == top_after, (top_before, top_after)
    report["major_preserves_top10"] = True

    idx = read_index(spark, idx_dir)
    assert idx.n_docs == total_pages, (idx.n_docs, total_pages)
    report["n_docs_final"] = int(idx.n_docs)
    report["final_postings_bytes"] = int(
        _dir_parquet_bytes(os.path.join(idx_dir, "postings"))
    )
    pages.unpersist()

    print(json.dumps(report, indent=2))
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
