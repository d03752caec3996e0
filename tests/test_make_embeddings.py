"""make_embeddings: deterministic codegen embedding corpus for the
ANN scale bench (scripts/scalebench.py)."""

import math

from searchengine_spark.corpus import make_embeddings
from searchengine_spark.pipeline import similarity


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_schema_matches_testdata(spark):
    df = make_embeddings(spark, 10, dim=8)
    assert [f.name for f in df.schema.fields] == ["vec_id", "embedding", "label"]
    assert df.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = df.collect()
    assert len(rows) == 10
    assert all(len(r["embedding"]) == 8 for r in rows)
    assert all(0 <= r["label"] < 16 for r in rows)


def test_partitioning_invariant(spark):
    a = make_embeddings(spark, 300, dim=16, partitions=1).collect()
    b = make_embeddings(spark, 300, dim=16, partitions=13).collect()
    am = {r["vec_id"]: (r["embedding"], r["label"]) for r in a}
    bm = {r["vec_id"]: (r["embedding"], r["label"]) for r in b}
    assert am == bm


def test_planted_near_dups_separate_from_noise(spark):
    rows = {r["vec_id"]: r["embedding"] for r in make_embeddings(spark, 400, dim=64).collect()}
    # planted: every 100th vector is vector i-99 plus eps-noise
    for i in (99, 199, 299, 399):
        assert _cos(rows[i - 99], rows[i]) > 0.99, i
    # unrelated pairs stay far below any sane near-dup threshold
    assert abs(_cos(rows[0], rows[1])) < 0.6
    assert abs(_cos(rows[5], rows[250])) < 0.6


def test_near_dup_pairs_recover_planted(spark):
    emb = make_embeddings(spark, 2000, dim=64)
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup_pairs(
            emb, threshold=0.9, n_tables=8, bits=16, dim=64
        ).collect()
    }
    planted = {(i - 99, i) for i in range(99, 2000, 100)}
    assert planted <= got
    # no false positives beyond the planted family at this threshold
    assert got == planted


def test_clustered_mode_cosine_structure(spark):
    rows = {
        r["vec_id"]: (r["embedding"], r["label"])
        for r in make_embeddings(spark, 300, dim=64, n_clusters=10).collect()
    }
    by_cluster = {}
    for vid, (v, lab) in rows.items():
        by_cluster.setdefault(lab, []).append(v)
    assert len(by_cluster) == 10
    some_cluster = next(vs for vs in by_cluster.values() if len(vs) >= 2)
    assert _cos(some_cluster[0], some_cluster[1]) > 0.8
    a = next(iter(by_cluster[min(by_cluster)]))
    b = next(iter(by_cluster[max(by_cluster)]))
    assert _cos(a, b) < 0.6


def test_clustered_lsh_topk_recall(spark):
    """In the clustered regime LSH recall@10 is high (the isotropic
    regime pinned elsewhere is its worst case)."""
    emb = make_embeddings(spark, 4000, dim=64, n_clusters=40)
    qids = [0, 1, 2]
    truth = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in similarity.lsh_bucket_topk(
            emb, qids, k=10, n_tables=16, bits=8, dim=64, plane_udf=True
        ).collect()
    }
    assert len(truth & got) / len(truth) >= 0.8


def test_plane_udf_buckets_match_literal(spark):
    """The forced-UDF matmul path (the row-count scale path) produces the
    same bucket keys as the oracle-replayable literal path."""
    from pyspark.sql import functions as F

    emb = make_embeddings(spark, 500, dim=64)
    planes = similarity._hyperplanes(64, 8, 16, 13)
    base = similarity.with_norm(emb, "embedding").select("vec_id", "__v")
    lit = {
        r["vec_id"]: r["k"]
        for r in base.withColumn(
            "k", similarity._bucket_array_col(planes, plane_udf=False)
        ).select("vec_id", "k").collect()
    }
    udf = {
        r["vec_id"]: r["k"]
        for r in base.withColumn(
            "k", similarity._bucket_array_col(planes, plane_udf=True)
        ).select("vec_id", "k").collect()
    }
    assert lit == udf


def test_near_dup_pairs_plane_udf_same_result(spark):
    emb = make_embeddings(spark, 1000, dim=64)
    kw = dict(threshold=0.9, n_tables=8, bits=16, dim=64)
    a = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in similarity.embedding_near_dup_pairs(emb, **kw).collect()
    }
    b = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in similarity.embedding_near_dup_pairs(
            emb, plane_udf=True, **kw
        ).collect()
    }
    assert a == b and a


def test_multiprobe_improves_isotropic_recall(spark):
    """Multi-probe (Lv et al. '07) buys recall on the isotropic worst
    case by probing the query's lowest-margin bit-flip buckets —
    without touching the corpus side of the plan."""
    emb = make_embeddings(spark, 4000, dim=32)
    qids = [0, 1, 2]
    truth = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    kw = dict(k=10, n_tables=8, bits=10, dim=32, plane_udf=True)
    one_rows = similarity.lsh_bucket_topk(emb, qids, n_probes=1, **kw).collect()
    multi_rows = similarity.lsh_bucket_topk(emb, qids, n_probes=16, **kw).collect()
    one = {(r["query_id"], r["vec_id"]) for r in one_rows}
    multi = {(r["query_id"], r["vec_id"]) for r in multi_rows}
    r1 = len(truth & one) / len(truth)
    rm = len(truth & multi) / len(truth)
    assert rm > r1, (r1, rm)
    assert rm >= 0.5, (r1, rm)
    # more probes -> a candidate superset -> the kth-best cosine can only
    # improve (the top-k SETS need not nest: better candidates displace)
    for qid in qids:
        worst_one = min(r["cos"] for r in one_rows if r["query_id"] == qid)
        worst_multi = min(r["cos"] for r in multi_rows if r["query_id"] == qid)
        assert worst_multi >= worst_one - 1e-6, (qid, worst_one, worst_multi)


def test_multiprobe_default_unchanged(spark):
    """n_probes=1 must stay byte-identical to the pre-multiprobe path
    (it is the oracle-gated configuration)."""
    emb = make_embeddings(spark, 1200, dim=16)
    qids = [5, 7]
    a = similarity.lsh_bucket_topk(emb, qids, k=5, n_tables=6, bits=6, dim=16).collect()
    b = similarity.lsh_bucket_topk(
        emb, qids, k=5, n_tables=6, bits=6, dim=16, n_probes=1
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_prebuilt_buckets_identical_to_one_call(spark):
    """lsh_bucket_topk(prebuilt=build_lsh_buckets(...)) must match the
    one-call path exactly (same planes seed), for both n_probes=1 and
    multi-probe, and must NOT unpersist the caller's bucket frame."""
    emb = make_embeddings(spark, 1200, dim=16)
    qids = [5, 7]
    kw = dict(k=5, n_tables=6, bits=6, dim=16)
    # one-call results first: its internal unpersist() removes the cache
    # entry for the (identical) hashed plan, so interleaving it after
    # build_lsh_buckets would clobber the prebuilt frame's cache
    one = {
        p: similarity.lsh_bucket_topk(emb, qids, n_probes=p, **kw).collect()
        for p in (1, 8)
    }
    idx = similarity.build_lsh_buckets(emb, n_tables=6, bits=6, dim=16)
    for probes in (1, 8):
        b = similarity.lsh_bucket_topk(
            emb, qids, n_probes=probes, prebuilt=idx, **kw
        ).collect()
        assert [tuple(r) for r in one[probes]] == [tuple(r) for r in b], probes
    assert idx[0].storageLevel.useMemory  # still cached: caller releases
    idx[0].unpersist()


def test_multiprobe_keys_ordering():
    """Probe enumeration: base key first, then flips in increasing
    total-margin order; all keys distinct; n_probes respected."""
    import numpy as np

    planes = similarity._hyperplanes(dim=8, n_tables=3, bits=6, seed=13)
    rng = np.random.default_rng(7)
    v = rng.standard_normal(8)
    per_table = similarity._multiprobe_keys(planes, v, n_probes=8)
    assert len(per_table) == 3
    for t, keys in enumerate(per_table):
        assert len(keys) == 8
        assert len(set(keys)) == 8
        proj = planes[t] @ v
        base = "".join("1" if x >= 0 else "0" for x in proj)
        assert keys[0] == base
        # each probe's flip cost is nondecreasing
        margins = np.abs(proj)
        costs = [
            sum(m for m, (a, b) in zip(margins, zip(base, key)) if a != b)
            for key in keys
        ]
        assert costs == sorted(costs)
