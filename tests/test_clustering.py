"""Connected-components clustering vs an exact union-find oracle."""

import pytest

from searchengine_spark.pipeline import dedup


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (10, 11)],                     # chain + pair
        [(1, 2), (3, 4), (4, 5), (5, 1)],               # cycle merging two comps
        [(7, 8)],                                       # single pair
        [(1, 9), (2, 9), (3, 9), (4, 9)],               # star
        [(5, 6), (1, 2), (2, 6), (3, 4), (4, 100), (100, 1)],  # everything merges
    ],
)
def test_components_match_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        int(r["id"]): int(r["component"])
        for r in dedup.connected_components(df).collect()
    }
    expected = _union_find(pairs)
    assert got == expected


def test_long_chain_converges_within_log_rounds(spark):
    """A 1k-long path graph (the boilerplate-chain near-dup shape) must
    fully converge — pure min-propagation needs 1000 rounds and silently
    hit max_iter=20; pointer doubling does it in ~log2(1000)+1 rounds
    (verdict r3 #4)."""
    n = 1000
    pairs = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        int(r["id"]): int(r["component"])
        for r in dedup.connected_components(df, max_iter=15).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_near_dup_clusters_end_to_end(spark):
    ddf = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = dedup.near_dup_clusters(ddf, threshold=0.8).collect()
    assert rows
    comps = {}
    for r in rows:
        comps.setdefault(int(r["component"]), []).append(int(r["doc_id"]))
    # component id is the min member; every cluster has >= 2 members
    for c, members in comps.items():
        assert c == min(members)
        assert len(members) >= 2


def test_star_edges_reproduce_pair_components(spark):
    """The O(bucket) star-edge candidate path must produce the SAME
    connected components as the exact O(bucket^2) pair path — on the
    organic testdata corpus AND on a hostile mega-cluster (200 copies
    of one template), where the pair path's candidate count goes
    quadratic and the star path stays linear."""
    ddf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def comps(frame):
        out = {}
        for r in frame.collect():
            out.setdefault(int(r["component"]), set()).add(int(r["doc_id"]))
        return {min(v): frozenset(v) for v in out.values()}

    assert comps(dedup.near_dup_clusters(ddf, threshold=0.8)) == comps(
        dedup.near_dup_clusters(ddf, threshold=0.8, edges="star")
    )

    # hostile: one 200-copy boilerplate cluster + unrelated docs
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill nearby")
    rows = [(i, f"{base} uniq{i}") for i in range(200)]
    rows += [(1000 + i, f"totally different document number {i} about "
                        f"topic{i} with words w{i}a w{i}b w{i}c w{i}d w{i}e "
                        f"w{i}f w{i}g w{i}h w{i}i w{i}j w{i}k w{i}l")
             for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    star = comps(dedup.near_dup_clusters(df, threshold=0.5, edges="star"))
    assert star == comps(dedup.near_dup_clusters(df, threshold=0.5))
    assert frozenset(range(200)) in star.values()  # the mega-cluster, whole

    # and the candidate volumes differ structurally: star edges are
    # bounded by bucket SIZE, pairs by bucket size squared
    n_star = dedup.minhash_lsh_star_edges(df, threshold=0.0).count()
    n_pairs = dedup.minhash_lsh_pairs(df, threshold=0.0).count()
    # quadratic in the cluster (LSH false negatives shave a few percent)
    assert n_pairs >= 0.9 * 199 * 200 / 2
    assert n_star <= 8 * 220  # <= n_bands * n_docs


def test_simhash_banding_matches_bruteforce(spark):
    """4x16-bit banding must find EXACTLY the hamming<=3 pairs a full
    cross product finds (pigeonhole over 4 disjoint 16-bit groups), and
    the band keyspace must be 16-bit (not the old 8-bit ceiling)."""
    docs = spark.range(80).selectExpr(
        "id AS doc_id",
        # clusters of 4 share a base text with tiny per-doc noise
        "concat('alpha beta gamma delta epsilon zeta eta theta doc ', "
        "cast(id DIV 4 as string), ' tail ', cast(id % 4 as string)) AS text",
    )
    sig = {
        int(r["id"]): (int(r["simhash_hi"]), int(r["simhash_lo"]))
        for r in dedup.simhash_values(docs).collect()
    }
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in sig.values())
    assert any(hi >> 16 for hi, _ in sig.values())  # all 64 bits in use

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    ids = sorted(sig)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(sig[a], sig[b]) <= 3
    }
    got = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert got == expected and expected  # non-vacuous: some pairs exist


def test_shingle_hash_prefix_identity(spark):
    """The 40-bit MinHash base (MH_H, 10 hex chars of md5) must equal
    the 60-bit verify hash (SHINGLE_HASH_SCALAR, 15 hex chars) shifted
    right 20 bits — the identity _hashed_sig relies on to md5 each
    shingle once. Checked JVM-side over a varied shingle sample."""
    from pyspark.sql import functions as F

    rows = [(f"tok{i} tok{i+1} tok{i+2}",) for i in range(200)]
    rows += [("a b c",), ("zz yy xx",), ("1 2 3",)]
    df = spark.createDataFrame(rows, "s string")
    bad = (
        df.withColumn("hh", F.expr(dedup.SHINGLE_HASH_SCALAR.format(s="s")))
        .withColumn("h40", F.expr(dedup.MH_H))
        .where(F.shiftright("hh", 20) != F.col("h40"))
        .count()
    )
    assert bad == 0


def test_pairs_path_unchanged_by_hashed_sig(spark):
    """minhash_lsh_pairs output (ids AND jaccard values) recomputed
    against exact shingle-hash-set Jaccard — pins that the one-pass
    _hashed_sig restructure changed no exposed value (jaccard is
    set/size-based, so the collect_list order is immaterial)."""
    from pyspark.sql import functions as F

    from searchengine_spark.functions.hashing import shingles, tokens

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = sorted(
        (int(r["id_a"]), int(r["id_b"]), float(r["jaccard"]))
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.8).collect()
    )
    assert got, "no near-dup pairs found on the test corpus"
    sh = {
        int(r["id"]): set(r["hh"])
        for r in docs.select(
            F.col("doc_id").alias("id"), tokens("text").alias("__toks")
        )
        .select("id", shingles("__toks").alias("__sh"))
        .select(
            "id",
            F.expr(dedup.SHINGLE_HASH.format(col="__sh")).alias("hh"),
        )
        .collect()
    }
    for a, b, j in got:
        inter = len(sh[a] & sh[b])
        exact = inter / (len(sh[a]) + len(sh[b]) - inter)
        assert abs(j - round(exact, 6)) < 1e-9, (a, b, j, exact)
