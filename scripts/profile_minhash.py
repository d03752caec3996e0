"""Substage profile of minhash_lsh_pairs at SCALE pages (default 100k).

Times each materialization boundary separately so the 400k-page cost
(SCALEBENCH p_minhash_lsh_sec) can be attributed: shingle+signature
aggregation, banding self-join candidates, semi-join + shingle-hash of
candidate docs, and the exact-Jaccard verify join.

    PROFILE_PAGES=100000 PROFILE_CPUS=32 python scripts/profile_minhash.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("PROFILE_PAGES", "100000"))
CPUS = int(os.environ.get("PROFILE_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.corpus import extract_fields, make_pages
    from searchengine_spark.index.build import assign_doc_ids
    from searchengine_spark.pipeline.dedup import (
        _hashed_sig,
        _jaccard,
        _with_shingles,
    )
    from searchengine_spark.functions.hashing import band_key
    from searchengine_spark.session import get_spark

    spark = get_spark("profile-minhash", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    docs = assign_doc_ids(extract_fields(make_pages(spark, N_PAGES)), ext_id_col="url")
    df = docs.select("doc_id", F.col("body").alias("text")).persist()
    df.count()

    from searchengine_spark.pipeline.dedup import DEFAULT_BANDS, DEFAULT_HASHES

    n_hashes, n_bands = DEFAULT_HASHES, DEFAULT_BANDS
    rows_per_band = n_hashes // n_bands

    # Since the _hashed_sig one-pass restructure the tokenize/shingle
    # work happens inside the signature job (shingle strings are never
    # persisted), so shingle_sec is 0 and signatures_sec carries the
    # fused tokenize+shingle+md5+groupBy pass.
    t_shingle = 0.0
    t0 = time.time()
    sh = _with_shingles(df, "doc_id", "text", 3)
    sig = _hashed_sig(sh, n_hashes).persist()
    n_docs = sig.count()
    t_sig = time.time() - t0

    t0 = time.time()
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        bands.append(sig.select("id", F.lit(b).alias("band"), band_key(cols).alias("bkey")))
    banded = bands[0]
    for fr in bands[1:]:
        banded = banded.unionByName(fr)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bkey"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
        .persist()
    )
    n_cand = cand.count()
    t_cand = time.time() - t0

    t0 = time.time()
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    shh = sig.join(cand_ids, on="id", how="leftsemi").select("id", "__hh").persist()
    n_cand_docs = shh.count()
    t_hash = time.time() - t0

    t0 = time.time()
    a = shh.select(F.col("id").alias("id_a"), F.col("__hh").alias("__hh_a"))
    b_ = shh.select(F.col("id").alias("id_b"), F.col("__hh").alias("__hh_b"))
    verified = (
        cand.join(a, "id_a")
        .join(b_, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_jaccard(F.col("__hh_a"), F.col("__hh_b")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
    )
    n_pairs = verified.count()
    t_verify = time.time() - t0

    print(
        f"pages={N_PAGES} docs={n_docs} cand_pairs={n_cand} "
        f"cand_docs={n_cand_docs} dup_pairs={n_pairs}"
    )
    print(
        f"shingle={t_shingle:.1f}s signatures={t_sig:.1f}s candidates={t_cand:.1f}s "
        f"cand_hash={t_hash:.1f}s verify={t_verify:.1f}s "
        f"total={t_shingle + t_sig + t_cand + t_hash + t_verify:.1f}s"
    )
    out = os.environ.get("PROFILE_OUT")
    if out:
        import json

        row = {
            "pages": N_PAGES, "docs": int(n_docs),
            "cand_pairs": int(n_cand), "cand_docs": int(n_cand_docs),
            "dup_pairs": int(n_pairs),
            "shingle_sec": round(t_shingle, 1), "signatures_sec": round(t_sig, 1),
            "candidates_sec": round(t_cand, 1), "cand_hash_sec": round(t_hash, 1),
            "verify_sec": round(t_verify, 1),
            "total_sec": round(t_shingle + t_sig + t_cand + t_hash + t_verify, 1),
        }
        with open(out, "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
