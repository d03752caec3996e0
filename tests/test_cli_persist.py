"""End-to-end: persist index -> param file -> CLI run -> trec output.

Also covers write_index resume (per-bucket lineage manifests) and the
forward index.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark import cli
from searchengine_spark.corpus import extract_fields, make_pages
from searchengine_spark.index.build import assign_doc_ids, build_index, read_index, write_index
from searchengine_spark.index.forward import forward_index, term_vector


@pytest.fixture(scope="module")
def persisted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("idx")
    docs = assign_doc_ids(extract_fields(make_pages(spark, 120, seed=3)), ext_id_col="url")
    idx = build_index(
        docs, fields={"body": "body", "title": "title"}, ext_id_col="url",
        analyzer="english",
    )
    path = str(tmp / "index")
    res = write_index(idx, path, buckets=4)
    return path, res


def test_write_resume_skips_done_buckets(spark, persisted):
    path, first = persisted
    assert first["written"] == [0, 1, 2, 3] and first["skipped"] == []
    idx = read_index(spark, path)
    second = write_index(idx, path, buckets=4, fingerprint=first["fingerprint"])
    assert second["written"] == [] and second["skipped"] == [0, 1, 2, 3]
    # manifest carries lineage
    rec = json.load(open(os.path.join(path, "_manifest", "bucket-00000.json")))
    assert rec["status"] == "ok" and rec["bytes"] > 0


def test_read_index_roundtrip_queries(spark, persisted):
    path, _ = persisted
    idx = read_index(spark, path)
    from searchengine_spark.engine import SearchEngine

    eng = SearchEngine(idx)
    rows = eng.search("cerim dirim", model="bm25", k=5).collect()
    assert rows and rows[0]["ext_id"].startswith("http://")


def test_forward_index_matches_postings(spark, persisted):
    path, _ = persisted
    idx = read_index(spark, path)
    fwd = forward_index(idx, fields=["body"])
    row = fwd.where(F.col("doc_id") == 0).first()
    tv = term_vector(idx, 0, "body")
    assert list(row["stems"]) == sorted(tv)
    assert dict(zip(row["stems"], row["tfs"])) == tv


def test_cli_end_to_end(spark, persisted, tmp_path):
    path, _ = persisted
    qf = tmp_path / "q.qry"
    qf.write_text("1: cerim dirim\n2: #near/2(barim batok)\n3: of the\n")
    out = tmp_path / "run.teIn"
    pf = tmp_path / "run.param"
    pf.write_text(
        f"indexPath={path}\nqueryFilePath={qf}\ntrecEvalOutputPath={out}\n"
        "retrievalAlgorithm=bm25\nBM25:k_1=1.2\nBM25:b=0.75\nBM25:k_3=0\n"
        "trecEvalOutputLength=10\n"
    )
    cli.run(str(pf), spark=spark)
    lines = out.read_text().strip().splitlines()
    assert any(line.startswith("1 Q0 http://") for line in lines)
    assert any(line.startswith("3 Q0 dummy 1") for line in lines)  # empty query
    parts = lines[0].split()
    assert parts[1] == "Q0" and parts[3] == "1" and len(parts) == 6


def test_cli_with_expansion_and_diversity(spark, persisted, tmp_path):
    path, _ = persisted
    qf = tmp_path / "q.qry"
    qf.write_text("7: cerim dirim\n")
    intents = tmp_path / "q.intents"
    intents.write_text("7.1: barim\n7.2: batok\n")
    out = tmp_path / "run2.teIn"
    exp = tmp_path / "exp.qry"
    pf = tmp_path / "run2.param"
    pf.write_text(
        f"indexPath={path}\nqueryFilePath={qf}\ntrecEvalOutputPath={out}\n"
        "retrievalAlgorithm=indri\nIndri:mu=1500\nIndri:lambda=0.4\n"
        "fb=indri\nfbDocs=5\nfbTerms=5\nfbMu=0\nfbOrigWeight=0.5\n"
        f"fbExpansionQueryFile={exp}\n"
        "diversity=true\ndiversity:algorithm=xquad\ndiversity:lambda=0.5\n"
        "diversity:maxInputRankingsLength=20\ndiversity:maxResultRankingLength=10\n"
        f"diversity:intentsFile={intents}\ntrecEvalOutputLength=10\n"
    )
    cli.run(str(pf), spark=spark)
    lines = out.read_text().strip().splitlines()
    assert lines and lines[0].startswith("7 Q0 http://")
    assert exp.read_text().startswith("7: #wand(")
