"""xQuAD / PM2 diversification tests: hand-computed goldens +
properties + Spark grouped-map plumbing."""

import pandas as pd
import pytest

from searchengine_spark.operators import diversity as dv


def _tiny_frame(spark):
    rows = [
        # main ranking
        ("q1", "", 1, 1.0), ("q1", "", 2, 0.9), ("q1", "", 3, 0.8),
        # intent 1 covers d1, d2 ; intent 2 covers d3
        ("q1", "q1.1", 1, 1.0), ("q1", "q1.1", 2, 0.9),
        ("q1", "q1.2", 3, 1.0),
    ]
    return spark.createDataFrame(rows, "qid string, intent string, doc_id long, score double")


def test_xquad_hand_computed(spark):
    out = dv.diversify(_tiny_frame(spark), "xquad", lam=1.0, max_input=10, max_result=3)
    rows = {r["rank"]: (r["doc_id"], r["score"]) for r in out.collect()}
    base = 1.0 + 0.9 + 0.8  # main mass is the max
    s = lambda x: x / base
    # iter1: d1 and d3 tie at 0.5*s(1.0); first-in-orthodox wins -> d1
    e1 = 0.5 * s(1.0)
    e3 = 0.5 * s(1.0)  # intent2 untouched by d1
    e2 = 0.5 * s(0.9) * (1 - s(1.0))
    # final sort: score desc, doc asc -> d1, d3, d2
    assert rows[1][0] == 1 and rows[1][1] == pytest.approx(e1, rel=1e-12)
    assert rows[2][0] == 3 and rows[2][1] == pytest.approx(e3, rel=1e-12)
    assert rows[3][0] == 2 and rows[3][1] == pytest.approx(e2, rel=1e-12)


def test_xquad_lambda_zero_is_relevance_order(spark):
    out = dv.diversify(_tiny_frame(spark), "xquad", lam=0.0, max_input=10, max_result=3)
    docs = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert docs == [1, 2, 3]


def test_pm2_alternates_disjoint_intents(spark):
    rows = [
        ("q1", "", 1, 1.0), ("q1", "", 2, 0.9), ("q1", "", 3, 0.85), ("q1", "", 4, 0.8),
        ("q1", "q1.1", 1, 1.0), ("q1", "q1.1", 2, 0.9),
        ("q1", "q1.2", 3, 1.0), ("q1", "q1.2", 4, 0.9),
    ]
    fr = spark.createDataFrame(rows, "qid string, intent string, doc_id long, score double")
    out = dv.diversify(fr, "pm2", lam=0.9, max_input=10, max_result=4)
    got = [r["doc_id"] for r in out.orderBy("rank").collect()]
    # proportional slots: the two intents' docs interleave at the top
    first_two = set(got[:2])
    assert 1 in first_two and 3 in first_two
    assert set(got) == {1, 2, 3, 4}


def test_spark_grouped_matches_direct_python(spark):
    fr = _tiny_frame(spark)
    out = {
        (r["qid"], r["rank"]): (r["doc_id"], r["score"])
        for r in dv.diversify(fr, "xquad", lam=0.6, max_input=10, max_result=3).collect()
    }
    pdf = fr.toPandas()
    orthodox, subqids, d2s = dv._normalized(pdf, "q1", 10)
    direct = dv.xquad_rerank(orthodox, subqids, d2s, "q1", 0.6, 3)
    for i, (d, s) in enumerate(direct, start=1):
        assert out[("q1", i)] == (d, pytest.approx(s, rel=1e-12))


def test_multiple_queries_parallel_groups(spark):
    rows = []
    for q in ["qa", "qb", "qc"]:
        rows += [
            (q, "", 1, 1.0), (q, "", 2, 0.5),
            (q, f"{q}.1", 1, 1.0), (q, f"{q}.1", 2, 0.7),
        ]
    fr = spark.createDataFrame(rows, "qid string, intent string, doc_id long, score double")
    out = dv.diversify(fr, "pm2", lam=0.5, max_input=10, max_result=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {"qa", "qb", "qc"}
    assert all(len(v) == 2 for v in by_q.values())


def test_scale_base_floor_one(spark):
    """Scores below mass 1.0 are NOT scaled up (floor, QryDiversity.java:121)."""
    rows = [("q1", "", 1, 0.2), ("q1", "", 2, 0.1), ("q1", "q1.1", 1, 0.2)]
    fr = spark.createDataFrame(rows, "qid string, intent string, doc_id long, score double")
    pdf = fr.toPandas()
    orthodox, subqids, d2s = dv._normalized(pdf, "q1", 10)
    assert d2s[1]["q1"] == pytest.approx(0.2)  # divided by 1.0, not 0.3
