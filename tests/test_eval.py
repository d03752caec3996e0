"""ir_metrics vs a brute-force pure-Python reference (trec_eval math)."""

import math
import random

import pytest

from searchengine_spark.eval import ir_metrics, mean_metrics


def _py_metrics(run, qrels, k):
    """run: {qid: [ext_id in rank order]}, qrels: {(qid, ext_id): rel}."""
    out = {}
    for qid, docs in run.items():
        rels = [qrels.get((qid, d), 0) for d in docs]
        n_rel = sum(1 for (q, _), r in qrels.items() if q == qid and r > 0)
        n_rel_ret = sum(1 for r in rels if r > 0)
        relk = sum(1 for r in rels[:k] if r > 0)
        rr = 0.0
        for i, r in enumerate(rels, 1):
            if r > 0:
                rr = 1.0 / i
                break
        cum, apsum = 0, 0.0
        for i, r in enumerate(rels, 1):
            if r > 0:
                cum += 1
                apsum += cum / i
        ap = apsum / n_rel if n_rel else 0.0
        dcg = sum(r / math.log2(i + 1) for i, r in enumerate(rels[:k], 1))
        ideal = sorted(
            (r for (q, _), r in qrels.items() if q == qid and r > 0), reverse=True
        )[:k]
        idcg = sum(r / math.log2(i + 1) for i, r in enumerate(ideal, 1))
        out[qid] = {
            "n_ret": len(docs),
            "n_rel": n_rel,
            "n_rel_ret": n_rel_ret,
            "p_at_k": relk / k,
            "recall_at_k": relk / n_rel if n_rel else 0.0,
            "rr": rr,
            "ap": ap,
            "ndcg_at_k": dcg / idcg if idcg > 0 else 0.0,
        }
    return out


def _frames(spark, run, qrels):
    run_rows = [
        (qid, d, i + 1) for qid, docs in run.items() for i, d in enumerate(docs)
    ]
    qrel_rows = [(q, d, r) for (q, d), r in qrels.items()]
    return (
        spark.createDataFrame(run_rows, "qid string, ext_id string, rank int"),
        spark.createDataFrame(qrel_rows, "qid string, ext_id string, rel int"),
    )


def test_hand_worked_example(spark):
    # q1: rel docs at ranks 1 and 3 (rel 2 and 1), one unretrieved rel
    run = {"q1": ["a", "b", "c", "d"], "q2": ["x", "y"]}
    qrels = {
        ("q1", "a"): 2,
        ("q1", "c"): 1,
        ("q1", "zz"): 1,  # relevant, never retrieved
        ("q2", "x"): 0,  # rel 0 rows are NOT relevant
    }
    got = {
        r["qid"]: r.asDict()
        for r in ir_metrics(*_frames(spark, run, qrels), k=3).collect()
    }
    q1 = got["q1"]
    assert q1["n_ret"] == 4 and q1["n_rel"] == 3 and q1["n_rel_ret"] == 2
    assert q1["p_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["rr"] == 1.0
    # AP = (1/1 + 2/3) / 3
    assert q1["ap"] == pytest.approx((1 + 2 / 3) / 3, abs=1e-6)
    # DCG = 2/log2(2) + 1/log2(4); IDCG = 2/log2(2) + 1/log2(3) + (1/log2(4) beyond k? k=3 keeps 3 ideal)
    dcg = 2 / math.log2(2) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)
    q2 = got["q2"]
    assert q2["n_rel"] == 0
    assert (q2["ap"], q2["rr"], q2["ndcg_at_k"]) == (0.0, 0.0, 0.0)


def test_random_runs_match_python_reference(spark):
    rng = random.Random(7)
    run = {
        f"q{q}": [f"d{j}" for j in rng.sample(range(40), rng.randint(1, 25))]
        for q in range(6)
    }
    qrels = {
        (f"q{q}", f"d{j}"): rng.choice([0, 0, 1, 1, 2])
        for q in range(6)
        for j in rng.sample(range(40), 20)
    }
    k = 10
    want = _py_metrics(run, qrels, k)
    got = {
        r["qid"]: r.asDict()
        for r in ir_metrics(*_frames(spark, run, qrels), k=k).collect()
    }
    assert set(got) == set(want)
    for qid, w in want.items():
        g = got[qid]
        for m, v in w.items():
            assert g[m] == pytest.approx(v, abs=1e-6), (qid, m)


def test_mean_metrics(spark):
    run = {"q1": ["a", "b"], "q2": ["a"]}
    qrels = {("q1", "a"): 1, ("q2", "zz"): 1}
    per = ir_metrics(*_frames(spark, run, qrels), k=2)
    m = mean_metrics(per).collect()[0]
    assert m["n_queries"] == 2
    assert m["map"] == pytest.approx(0.5, abs=1e-6)  # (1.0 + 0.0) / 2
    assert m["mrr"] == pytest.approx(0.5, abs=1e-6)
