"""Dump formatted physical plans for the headline operators -> PLANS.md.

    python scripts/plans.py [sf_dir]

Each section shows the `explain("formatted")` output the design claims
rest on: pushed term filters + constant bucket partition pruning on a
persisted index, the single-scan flat strategies (BM25 fold, Indri map
reassembly, positional co-location), and the block-max WAND candidate
plan. Regenerate after compiler changes so the committed evidence
matches the code.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from searchengine_spark.engine import SearchEngine  # noqa: E402
from searchengine_spark.index.build import (  # noqa: E402
    assign_doc_ids,
    build_index,
    read_index,
    write_index,
)
from searchengine_spark.corpus import extract_fields, make_pages  # noqa: E402
from searchengine_spark.session import get_spark  # noqa: E402


def formatted(df, max_lines: int = 200) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    lines = buf.getvalue().splitlines()
    # materialized intermediates (persist + AQE) embed their full
    # final/initial plans recursively — cap the dump, the shape evidence
    # is in the head
    if len(lines) > max_lines:
        lines = (
            lines[: max_lines - 40]
            + [f"... [{len(lines) - max_lines} plan lines truncated] ..."]
            + lines[-39:]
        )
    return "\n".join(lines)


def _stats_prefetch_frame(idx):
    """The exact frame Compiler.prefetch_term_stats collects."""
    from pyspark.sql import functions as F

    from searchengine_spark.functions.xxh64 import term_bucket

    terms = ["cerim", "dirim"]
    cond = F.col("term").isin(terms) & F.col("field").isin(["body"])
    if "bucket" in idx.term_stats.columns and idx.n_buckets:
        ids = sorted({term_bucket(t, idx.n_buckets) for t in terms})
        cond = F.col("bucket").isin(ids) & cond
    return idx.term_stats.where(cond).select("term", "field", "df", "ctf")


def _ivf_plan_frame(spark):
    """Persisted IVF index + probe-pruned query (tests/test_ivf.py pins
    the PartitionFilters; this records the shape)."""
    from searchengine_spark.corpus import make_embeddings
    from searchengine_spark.pipeline import similarity

    emb = make_embeddings(spark, 400, dim=16)
    ivf_dir = os.path.join(tempfile.mkdtemp(prefix="plans_ivf_"), "ivf")
    similarity.write_ivf_index(emb, ivf_dir, n_cells=8, cell_udf=True)
    idx = similarity.read_ivf_index(spark, ivf_dir)
    return similarity.ivf_topk(
        emb, [0, 1, 2], k=10, n_probe=2, cell_udf=True, prebuilt=idx
    )


def main() -> None:
    spark = get_spark("plans", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = assign_doc_ids(extract_fields(make_pages(spark, 400, seed=9)), ext_id_col="url")
    # PLANS_INDEX_DIR: reuse a pre-persisted index (e.g. scalebench's 400k-page
    # one) so the committed plan evidence is from the scale it claims to cover;
    # default builds a small local one. Plan SHAPES are size-independent —
    # regenerating at scale proves it.
    pdir = os.environ.get("PLANS_INDEX_DIR", "")
    src = f"persisted index at {pdir}" if pdir else "a fresh 8-bucket index over 400 synthetic pages"
    if not pdir:
        idx_mem = build_index(docs, fields={"body": "body"}, ext_id_col="url", analyzer="english")
        pdir = os.path.join(tempfile.mkdtemp(prefix="plans_"), "index")
        write_index(idx_mem, pdir, buckets=8)
    idx = read_index(spark, pdir)
    eng = SearchEngine(idx)

    from searchengine_spark.operators.wand import bm25_topk_pruned
    from searchengine_spark.pipeline import dedup

    sections = [
        (
            "Persisted TERM scan (pushdown + bucket partition pruning)",
            "`eng.scores('cerim', model='bm25')` — expect `PushedFilters: [..term..]` and a constant `bucket#N = c` in PartitionFilters.",
            eng.scores("cerim", model="bm25"),
        ),
        (
            "Flat BM25 #SUM (single term-IN scan + in-order fold)",
            "5 terms, ONE FileScan, bucket pruning to the union of the terms' buckets, `aggregate(array_sort(collect_list(...)))` fold.",
            eng.scores("cerim dirim barim batok balan", model="bm25"),
        ),
        (
            "Flat Indri #WAND (single scan + map reassembly with defaults)",
            "No joins; `map_from_entries(collect_list(...))`, per-term `element_at` with coalesce-to-default expressions.",
            eng.scores("#wand(0.4 cerim 0.3 dirim 0.3 batok)", model="indri", mu=1500.0, lam=0.3),
        ),
        (
            "#NEAR/2 (single scan, position co-location, Arrow merge)",
            "One scan, one groupBy; match-ALL via `size(map) = k`; the positional kernel is the only Python stage.",
            eng.scores("#near/2(barim batok)", model="rankedboolean"),
        ),
        (
            "Block-max WAND top-k (candidate-block scoring)",
            "Single term-IN scan; candidate blocks broadcast; exact re-score only inside `ub >= theta` blocks.",
            bm25_topk_pruned(idx, ["cerim", "dirim"], k=10),
        ),
        (
            "Fused 3-query BM25 batch (broadcast query-terms table, one scan)",
            "ONE term-IN FileScan for the whole batch, BroadcastHashJoin on term, groupBy(qid, doc_id) fold, per-qid row_number window — scan count independent of batch size.",
            eng.run_batch(
                [("q1", "cerim dirim"), ("q2", "barim cerim"), ("q3", "dirim batok")],
                model="bm25", k=10,
            ),
        ),
        (
            "Stats prefetch (bucket-pruned term_stats segment fold)",
            "The compiler's one-collect-per-batch stats prefetch: literal bucket-IN prunes the term_stats partition dirs (the segment-fold groupBy keeps `bucket` in its keys so the filter pushes through the aggregate); term/field filters push to the parquet scan.",
            _stats_prefetch_frame(idx),
        ),
        (
            "IVF-flat ANN over the persisted cell-partitioned index",
            "`ivf_topk(prebuilt=read_ivf_index(...))` with driver-side probes — expect `PartitionFilters: [cell#N IN (..)]` on the FileScan: only the n_probe probed cells' directories are read, the embedding analogue of the postings bucket pruning.",
            _ivf_plan_frame(spark),
        ),
        (
            "MinHash-LSH near-dup pairs (band equi-join, hashed verify)",
            "Band keys only in the self-join; shingle payloads stay out of the candidate shuffle (semi-join + 8-byte hashes).",
            dedup.minhash_lsh_pairs(
                docs.select("doc_id", docs["body"].alias("text")), threshold=0.8
            ),
        ),
    ]

    out = ["# PLANS — formatted physical plans for the headline operators",
           "",
           f"Generated by `python scripts/plans.py` on {src}",
           "(the plan SHAPES, not the sizes, are the evidence — they are what",
           "survives a 1000-executor scale-up).",
           ""]
    for title, caption, df in sections:
        out.append(f"## {title}\n")
        out.append(caption + "\n")
        out.append("```\n" + formatted(df).strip() + "\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {os.path.join(REPO, 'PLANS.md')}")


if __name__ == "__main__":
    main()
