"""LeToR featurization tests vs hand-computed values on the pages corpus."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.engine import SearchEngine
from searchengine_spark.operators import letor
from searchengine_spark.plans.models import BM25, Indri
from tests import oracle as orc


@pytest.fixture(scope="module")
def eng(pages_index):
    return SearchEngine(pages_index)


@pytest.fixture(scope="module")
def feats(spark, eng):
    cand = eng.scores("cerim dirim", model=BM25()).select("doc_id").limit(30)
    return letor.featurize(eng, "q1", "cerim dirim", cand).persist()


def test_feature_frame_shape(feats):
    rows = feats.collect()
    assert rows
    assert set(feats.columns) == {"qid", "doc_id"} | set(letor.FEATURE_COLS)


def test_bm25_overlap_match_oracle(feats, py_index, eng):
    terms = eng.analyzer.terms("cerim dirim")
    m = BM25()
    rows = feats.collect()
    n = float(py_index.n_docs)
    avg = py_index.avg_len("body")
    for r in rows[:10]:
        d = int(r["doc_id"])
        toks = py_index.doc_tokens[d]["body"]
        expected_bm25 = 0.0
        overlap = 0
        for t in terms:
            tf = float(len(py_index.postings.get((t, "body"), {}).get(d, [])))
            if tf > 0:
                df = len(py_index.postings[(t, "body")])
                idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
                dl = py_index.get_doc_len(d, "body")
                expected_bm25 += idf * tf / (tf + m.k1 * (1 - m.b + m.b * dl / avg))
                overlap += 1
        assert r["f5"] == pytest.approx(expected_bm25, rel=1e-9)
        assert r["f7"] == pytest.approx(overlap / len(terms), rel=1e-12)
        assert 0 <= r["f7"] <= 1
        _ = toks


def test_indri_feature_matches_oracle_formula(feats, py_index, eng):
    terms = eng.analyzer.terms("cerim dirim")
    mi = Indri()
    collen = float(py_index.sum_len["body"])
    for r in feats.collect()[:10]:
        d = int(r["doc_id"])
        dl = py_index.get_doc_len(d, "body")
        score, found = 1.0, False
        for t in terms:
            tf = float(len(py_index.postings.get((t, "body"), {}).get(d, [])))
            found = found or tf > 0
            ctf = sum(len(ps) for ps in py_index.postings.get((t, "body"), {}).values())
            ctf = ctf if ctf >= 1 else 0.5
            p = ctf / collen
            score *= ((1 - mi.lam) * (tf + mi.mu * p) / (dl + mi.mu) + mi.lam * p) ** (
                1.0 / len(terms)
            )
        expected = score if found else 0.0
        assert r["f6"] == pytest.approx(expected, rel=1e-9)


def test_url_depth_feature(feats, eng):
    r = feats.first()
    ext = (
        eng.index.docs.where(F.col("doc_id") == r["doc_id"]).first()["ext_id"]
    )
    assert r["f2"] == ext.count("/")
    assert r["f3"] == 0.0  # no wikipedia urls in the synthetic corpus


def test_normalize_bounds(feats):
    norm = letor.normalize_per_query(feats)
    rows = norm.collect()
    for c in letor.FEATURE_COLS:
        vals = [r[c] for r in rows if r[c] is not None]
        if not vals:
            continue
        if min(vals) == max(vals):
            continue  # constant feature stays unscaled (reference :238-241)
        assert all(-1e-9 <= v <= 1 + 1e-9 for v in vals), c


def test_svm_light_format(feats, spark):
    lines = [r["value"] for r in letor.svm_light_lines(feats).collect()]
    assert all(line.startswith("0 qid:q1 ") for line in lines)
    assert all("#" in line for line in lines)


def test_train_and_rerank_end_to_end(spark, eng, feats):
    # synthetic qrels: mark a few candidate docs relevant
    docs = [int(r["doc_id"]) for r in feats.select("doc_id").collect()]
    qrels = spark.createDataFrame(
        [("q1", d, 1 if i % 3 == 0 else 0) for i, d in enumerate(docs)],
        "qid string, doc_id long, rel int",
    )
    norm = letor.normalize_per_query(feats)
    ranked = letor.train_and_rerank(norm, qrels, norm, k=10).collect()
    assert len(ranked) == 10
    assert [r["rank"] for r in sorted(ranked, key=lambda x: x["rank"])] == list(range(1, 11))
