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


def test_partial_resume_preserves_other_buckets(spark, persisted):
    """Deleting one bucket's manifest and resuming must rewrite ONLY that
    bucket — the other buckets' parquet files must survive (dynamic
    partition overwrite; static mode truncated the whole postings dir)."""
    path, first = persisted

    def bucket_files(b):
        # layout v3 nests seg= generation dirs inside each bucket dir
        d = os.path.join(path, "postings", f"bucket={b}")
        return sorted(
            os.path.relpath(os.path.join(dirpath, f), d)
            for dirpath, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    before = {b: bucket_files(b) for b in range(4)}
    assert all(before.values())
    os.remove(os.path.join(path, "_manifest", "bucket-00002.json"))

    # resume from a rebuilt index (same deterministic source), as a
    # restarted job would — not from the path being overwritten
    docs = assign_doc_ids(extract_fields(make_pages(spark, 120, seed=3)), ext_id_col="url")
    idx = build_index(
        docs, fields={"body": "body", "title": "title"}, ext_id_col="url",
        analyzer="english",
    )
    res = write_index(idx, path, buckets=4, fingerprint=first["fingerprint"])
    assert res["written"] == [2] and res["skipped"] == [0, 1, 3]
    for b in (0, 1, 3):
        assert bucket_files(b) == before[b], f"bucket {b} clobbered by resume"
    assert bucket_files(2)  # rewritten
    # the index still serves terms from every bucket
    total = read_index(spark, path).postings.count()
    idx2 = read_index(spark, path)
    assert total > 0 and idx2.term_stats.count() > 0


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


def test_cli_fb_initial_ranking_file_with_url_ext_ids(spark, persisted, tmp_path):
    """fbInitialRankingFile rows carry URL external ids (as produced by
    this CLI); they must resolve to internal doc ids via the docs table,
    not int(ext_id)."""
    path, _ = persisted
    qf = tmp_path / "q.qry"
    qf.write_text("9: cerim dirim\n")
    # produce a genuine run file (URL ext ids) with a plain BM25 pass
    run1 = tmp_path / "initial.teIn"
    pf1 = tmp_path / "first.param"
    pf1.write_text(
        f"indexPath={path}\nqueryFilePath={qf}\ntrecEvalOutputPath={run1}\n"
        "retrievalAlgorithm=bm25\ntrecEvalOutputLength=10\n"
    )
    cli.run(str(pf1), spark=spark)
    assert "http://" in run1.read_text()

    out = tmp_path / "fb.teIn"
    exp = tmp_path / "fb_exp.qry"
    pf2 = tmp_path / "second.param"
    pf2.write_text(
        f"indexPath={path}\nqueryFilePath={qf}\ntrecEvalOutputPath={out}\n"
        "retrievalAlgorithm=indri\nIndri:mu=1500\nIndri:lambda=0.4\n"
        "fb=indri\nfbDocs=5\nfbTerms=5\nfbMu=0\nfbOrigWeight=0.5\n"
        f"fbInitialRankingFile={run1}\nfbExpansionQueryFile={exp}\n"
        "trecEvalOutputLength=10\n"
    )
    cli.run(str(pf2), spark=spark)
    lines = out.read_text().strip().splitlines()
    assert lines and lines[0].startswith("9 Q0 http://")
    assert exp.read_text().startswith("9: #wand(")


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


def test_cli_eval_metrics_output(spark, persisted, tmp_path):
    """evalQrelsFile + evalMetricsPath score the run engine-side
    (trec_eval -q style metric<tab>qid<tab>value lines)."""
    path, _ = persisted
    qf = tmp_path / "q.qry"
    qf.write_text("1: cerim dirim\n2: fulan gorim\n")
    out = tmp_path / "run.teIn"
    pf = tmp_path / "run.param"
    pf.write_text(
        f"indexPath={path}\nqueryFilePath={qf}\ntrecEvalOutputPath={out}\n"
        "retrievalAlgorithm=bm25\ntrecEvalOutputLength=10\n"
        f"evalQrelsFile={tmp_path / 'q.qrels'}\n"
        f"evalMetricsPath={tmp_path / 'metrics.txt'}\nevalK=5\n"
    )
    (tmp_path / "q.qrels").write_text("1 0 http://placeholder.example/x 0\n")
    cli.run(str(pf), spark=spark)
    # qrels: the top result of query 1 is relevant, plus one unknown doc
    top1 = out.read_text().strip().splitlines()[0].split()[2]
    (tmp_path / "q.qrels").write_text(f"1 0 {top1} 2\n1 0 http://no.example/x 1\n")
    cli.run(str(pf), spark=spark)
    metrics = {}
    for line in (tmp_path / "metrics.txt").read_text().strip().splitlines():
        m, qid, v = line.split("\t")
        metrics[(m, qid)] = float(v)
    assert metrics[("rr", "1")] == 1.0
    assert metrics[("p_at_k", "1")] == 0.2  # 1 relevant in top 5
    assert metrics[("recall_at_k", "1")] == 0.5  # 1 of 2 relevant found
    assert metrics[("ap", "2")] == 0.0  # no qrels for query 2
    assert metrics[("num_q", "all")] == 2.0
    assert metrics[("map", "all")] == metrics[("ap", "1")] / 2
