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
