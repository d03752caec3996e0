"""Measure the exact pruned top-k operators against the exhaustive
plans on persisted indexes (VERDICT r4 item 4 follow-up).

    PRUNEBENCH_INDEXES=/tmp/idx400k:/tmp/idx4m python scripts/prunebench.py

Writes ``PRUNEBENCH.json``: per index, best-of-3 wall clock for the
headline 3-term and 7-term BM25 queries and the #NEAR/#WINDOW
positionals, exhaustive (prune=False) vs forced-pruned (prune=True),
plus the theta candidate-block fraction for each BM25 query.

This artifact is WHY engine.AUTO_PRUNE is False: on a term-bucketed
postings layout the block filter (an expression over doc_id) cannot
reduce parquet I/O, so the pruned path re-reads the same postings the
exhaustive plan reads once — and for multi-term queries the summed
per-term block upper bound never drops below theta (candidate fraction
1.0). Pruning only pays once the filter can reach the scan, i.e. a
doc-partitioned layout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INDEXES = os.environ.get("PRUNEBENCH_INDEXES", "").split(":")
CPUS = int(os.environ.get("PRUNEBENCH_CPUS", "32"))
OUT = os.environ.get("PRUNEBENCH_OUT", "PRUNEBENCH.json")

QUERIES = {
    "bm25_3term": ("cerim dirim bavex", "bm25"),
    "bm25_7term": ("cerim dirim bavex gorim fulan baser ditok", "bm25"),
    "near_2term": ("#near/4(cerim dirim)", "rankedboolean"),
    "window_2term": ("#window/8(bavex gorim)", "rankedboolean"),
}


def _best_of(fn, k: int = 3) -> float:
    best = float("inf")
    for _ in range(k):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _cand_fraction(idx, terms: list[str], k: int = 10) -> float:
    """Fraction of blocks whose summed per-term upper bound survives
    theta (the k-th exact seed score) — 1.0 means the theta filter
    excludes nothing."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.wand import (
        _exact_scores,
        _idf_col,
        _idfs,
        _term_scans,
    )

    field, k1, b = "body", 1.2, 0.75
    avg = idx.avg_len(field)
    idfs = _idfs(idx, terms, field)
    bs = idx.block_stats.where(
        (F.col("field") == field) & F.col("term").isin(terms)
    )
    mtf = F.col("max_tf").cast("double")
    ub_t = _idf_col(idfs) * mtf / (
        mtf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("min_len") / F.lit(avg))
    )
    block_ub = bs.groupBy("block_id").agg(
        F.sum(ub_t).alias("ub"), F.sum("n").alias("n_post")
    ).persist()
    n_blocks = block_ub.count()
    seed_rows = block_ub.orderBy(F.desc("ub")).limit(256).collect()
    seed_ids, cum = [], 0
    for r in seed_rows:
        seed_ids.append(int(r["block_id"]))
        cum += int(r["n_post"])
        if cum >= 2 * k:
            break
    base = _term_scans(idx, terms, field)
    blk = (F.col("doc_id") / idx.block_range).cast("long")
    kth = (
        _exact_scores(base.where(blk.isin(seed_ids)), terms, idfs, k1, b, avg)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    if len(kth) < k:
        block_ub.unpersist()
        return 1.0
    theta = float(kth[-1]["score"])
    frac = block_ub.where(F.col("ub") >= F.lit(theta)).count() / max(n_blocks, 1)
    block_ub.unpersist()
    return round(frac, 4)


def main() -> None:
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.index.build import read_index
    from searchengine_spark.session import get_spark

    spark = get_spark("prunebench", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"cpus": CPUS, "indexes": []}
    for pdir in [p for p in INDEXES if p]:
        idx = read_index(spark, pdir)
        eng = SearchEngine(idx)
        n_docs = idx.docs.count()
        entry: dict = {"index_dir": pdir, "n_docs": int(n_docs), "queries": {}}
        # warm the session / scan caches once
        eng.search("cerim", model="bm25", k=10, with_ext_id=False,
                   prune=False).collect()
        for name, (q, model) in QUERIES.items():
            ex = _best_of(
                lambda: eng.search(q, model=model, k=10, with_ext_id=False,
                                   prune=False).collect()
            )
            pr = _best_of(
                lambda: eng.search(q, model=model, k=10, with_ext_id=False,
                                   prune=True).collect()
            )
            entry["queries"][name] = {
                "exhaustive_sec": ex,
                "pruned_sec": pr,
                "pruned_over_exhaustive": round(pr / ex, 2) if ex else None,
            }
            if model == "bm25":
                entry["queries"][name]["cand_block_fraction"] = _cand_fraction(
                    idx, q.split()
                )
        report["indexes"].append(entry)
        print(json.dumps(entry), flush=True)

    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
