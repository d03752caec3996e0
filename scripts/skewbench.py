"""Skew-proof scale bench (verdict r3 item 3): the dedup/index paths
against a deliberately HOSTILE corpus — boilerplate mega-clusters and
df~0.3n head terms — at scale.

    SKEWBENCH_PAGES=400000 SKEWBENCH_CPUS=32 python scripts/skewbench.py

All prior scale artifacts used the organic synthetic corpus (1% dup
density, natural zipf). Real web crawls are worse: one cookie-banner
template can appear on tens of thousands of pages, and nav boilerplate
makes a handful of terms appear on a third of the corpus. This bench
builds ``corpus.make_pages_skew`` (15% dups, template popularity ~ u^4
so the head template collects ~25% of dups; 30% of pages share a
16-token boilerplate sentence) and measures, with per-stage walls and
candidate counts (written to ``SCALEBENCH_SKEW.json``):

- exact dedup (must NOT collapse near-dups: every copy has a unique
  suffix token);
- MinHash-LSH **pair** path: candidate count + wall. The band join is
  O(m^2) in the hottest bucket — the structural hazard this corpus is
  built to expose (documented, kept as the exact/oracle path);
- MinHash-LSH **star** path + connected components + keep-filter: the
  O(m) production topology — candidate count stays ~n_bands*n, the
  mega-cluster resolves into ONE component, wall stays near the
  organic-corpus cost;
- index build over the skewed postings (head terms -> skewed posting
  lists; the salted bucket write keeps one bucket from funneling one
  writer) + a head-term/regular-term query pair on the persisted index.

AQE (adaptive query execution + skew-join handling) is ON via
session.get_spark defaults.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SKEWBENCH_PAGES", "400000"))
CPUS = int(os.environ.get("SKEWBENCH_CPUS", "32"))
PAIR_CAP = int(os.environ.get("SKEWBENCH_PAIR_CAP_PAGES", "100000"))
OUT = os.environ.get("SKEWBENCH_OUT", os.path.join(REPO, "SCALEBENCH_SKEW.json"))


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.corpus import make_pages_skew
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.index.build import assign_doc_ids, build_index, read_index, write_index
    from searchengine_spark.pipeline import dedup
    from searchengine_spark.session import get_spark

    spark = get_spark("skewbench", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {
        "n_pages": N_PAGES,
        "cpus": CPUS,
        "dup_fraction": 0.15,
        "boiler_fraction": 0.3,
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "skew_join": spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
    }

    # the url encodes the page index -> dense deterministic doc ids
    # (monotonically_increasing_id would leave partition-sized gaps and
    # break the pair-path cap filter below)
    pages = make_pages_skew(spark, N_PAGES).withColumn(
        "doc_id", F.regexp_extract("url", r"p(\d+)$", 1).cast("long")
    )
    docs = pages.select("doc_id", "text", "url").persist()
    report["gen_and_count_sec"] = round(_time(lambda: docs.count()), 3)

    # --- exact dedup: unique-suffix copies must all survive ---------------
    t0 = time.time()
    row = dedup.exact_duplicates(docs).agg(
        F.sum(F.col("n_dups") - 1).alias("extra")
    ).first()
    report["exact_dedup_sec"] = round(time.time() - t0, 3)
    # every near-dup copy carries a unique token -> exact dedup removes 0
    report["exact_dup_rows_removed"] = int(row["extra"] or 0)

    # --- star path: edges -> components -> representatives ----------------
    t0 = time.time()
    star = dedup.minhash_lsh_star_edges(docs, threshold=0.7)
    n_star = star.count()
    report["star_edges_sec"] = round(time.time() - t0, 3)
    report["n_star_edges"] = int(n_star)

    t0 = time.time()
    cc = dedup.connected_components(star).persist()
    n_nodes = cc.count()
    comp_sizes = (
        cc.groupBy("component").agg(F.count(F.lit(1)).alias("m"))
        .agg(F.max("m").alias("mx"), F.count(F.lit(1)).alias("ncomp"))
        .first()
    )
    report["components_sec"] = round(time.time() - t0, 3)
    report["n_clustered_docs"] = int(n_nodes)
    report["n_components"] = int(comp_sizes["ncomp"])
    report["largest_component"] = int(comp_sizes["mx"])

    # --- pair path at capped size: exposes the O(m^2) bucket --------------
    cap = min(PAIR_CAP, N_PAGES)
    small = docs.where(F.col("doc_id") < cap)
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(small, threshold=0.7)
    n_pairs = pairs.count()
    report["pair_cap_pages"] = cap
    report["pair_path_sec"] = round(time.time() - t0, 3)
    report["n_verified_pairs"] = int(n_pairs)

    # --- index build + head-term query on the persisted index -------------
    t0 = time.time()
    with_ids = assign_doc_ids(docs.select(F.col("url"), F.col("text")), ext_id_col="url")
    idx = build_index(
        with_ids, fields={"body": "text"}, ext_id_col="url", analyzer="english"
    )
    idx_dir = os.path.join(tempfile.mkdtemp(prefix="skewbench_"), "index")
    write_index(idx, idx_dir, buckets=32)
    report["index_build_write_sec"] = round(time.time() - t0, 3)
    idx.release()

    eng = SearchEngine(read_index(spark, idx_dir))
    # head term: 'cookie' sits on ~30% of pages (idf clamps toward 0 —
    # the SCAN is the point: one skewed posting list, salted writers)
    for name, q in (
        ("q_head_term_sec", "cookie consent newsletter"),
        ("q_regular_sec", "cerim dirim bavex"),
        ("q_near_head_sec", "#near/3(cookie consent)"),
    ):
        fn = lambda: eng.search(q, model="bm25", k=10, with_ext_id=False).collect()  # noqa: E731
        fn()
        report[name] = round(min(_time(fn) for _ in range(3)), 3)

    print(json.dumps(report, indent=2))
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
