"""DRMM re-ranker tests: histogram semantics, softmax gating, MLP
training, end-to-end re-rank."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.engine import SearchEngine
from searchengine_spark.operators import drmm
from searchengine_spark.plans.models import BM25


@pytest.fixture(scope="module")
def eng(pages_index):
    return SearchEngine(pages_index)


@pytest.fixture(scope="module")
def setup(spark, eng):
    terms = eng.analyzer.terms("cerim dirim")
    cand = eng.scores("cerim dirim", model=BM25()).select("doc_id").limit(25)
    feats = drmm.histogram_features(eng, terms, cand).persist()
    return terms, cand, feats


def test_bin_index_semantics():
    assert drmm._bin_index(1.0, 10) == 9
    assert drmm._bin_index(0.999999, 10) == 9   # >= 0.99999 -> last bin
    assert drmm._bin_index(-1.0, 10) == 0
    assert drmm._bin_index(0.0, 10) == 5


def test_term_vectors_normalized_and_deterministic():
    v1, v2 = drmm.term_vector("spark"), drmm.term_vector("spark")
    assert np.allclose(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-12
    assert not np.allclose(v1, drmm.term_vector("flink"))


def test_histogram_shape_and_self_similarity(setup, py_index):
    terms, _, feats = setup
    rows = feats.collect()
    assert rows
    for r in rows:
        assert len(r["hist"]) == len(terms) * drmm.N_BINS
    # a doc containing query term t puts mass in t's last bin (sim=1)
    by_doc = {int(r["doc_id"]): np.asarray(r["hist"]).reshape(len(terms), drmm.N_BINS)
              for r in rows}
    t0 = terms[0]
    for d, h in by_doc.items():
        tf = len(py_index.postings.get((t0, "body"), {}).get(d, []))
        if tf > 0:
            assert h[0, -1] == pytest.approx(math.log1p(tf), rel=1e-6)


def test_idf_softmax_sums_to_one(eng, setup):
    terms, _, _ = setup
    w = drmm.idf_softmax(eng, terms)
    assert w.shape == (len(terms),)
    assert w.sum() == pytest.approx(1.0)
    assert (w > 0).all()


def test_mlp_save_load_roundtrip(tmp_path):
    m = drmm.MLP(seed=3)
    x = np.random.default_rng(0).standard_normal(drmm.N_BINS)
    path = str(tmp_path / "mlp.npz")
    m.save(path)
    m2 = drmm.MLP.load(path)
    assert m.score(x[None, :]) == pytest.approx(m2.score(x[None, :]))


def test_training_reduces_pairwise_loss(eng, setup, py_index):
    terms, _, feats = setup
    docs = [int(r["doc_id"]) for r in feats.select("doc_id").collect()]
    # learnable signal: relevant iff the doc actually contains term 0
    # (puts mass in the exact-match bin the MLP can latch onto)
    t0 = terms[0]
    qrels = {
        d: 1 if len(py_index.postings.get((t0, "body"), {}).get(d, [])) > 0 else 0
        for d in docs
    }
    if len({v for v in qrels.values()}) < 2:
        pytest.skip("degenerate candidate set")
    mlp = drmm.train(eng, terms, feats, qrels, epochs=3)
    # trained model ranks a relevant doc above a non-relevant one on avg
    rows = {int(r["doc_id"]): np.asarray(r["hist"]).reshape(len(terms), drmm.N_BINS)
            for r in feats.collect()}
    w = drmm.idf_softmax(eng, terms)
    scores = {d: float(np.dot(mlp.score(h), w)) for d, h in rows.items()}
    pos = np.mean([scores[d] for d in docs if qrels[d] > 0])
    neg = np.mean([scores[d] for d in docs if qrels[d] == 0])
    assert pos > neg


def test_rerank_end_to_end(eng, setup):
    terms, _, feats = setup
    mlp = drmm.MLP(seed=5)
    out = drmm.rerank(eng, terms, feats, mlp, k=10).collect()
    assert len(out) == 10
    keys = [(-r["score"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert keys == sorted(keys)
