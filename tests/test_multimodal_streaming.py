"""Multimodal plumbing + streaming incremental index tests."""

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.pipeline import multimodal as mm
from searchengine_spark.streaming import ingest


def test_media_table_deterministic(spark):
    a = mm.make_media(spark, 30).collect()
    b = mm.make_media(spark, 30).collect()
    assert [(r["media_id"], bytes(r["payload"])) for r in a] == [
        (r["media_id"], bytes(r["payload"])) for r in b
    ]
    assert {r["kind"] for r in a} == {"image", "audio", "video"}


def test_extract_features_shapes(spark):
    feats = mm.extract_features(mm.make_media(spark, 30)).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert r["width"] >= 16 and r["height"] >= 16
        if r["kind"] == "image":
            assert r["n_frames"] == 1


def test_decode_stub_raises_without_codecs(spark):
    with pytest.raises(Exception) as exc:
        mm.extract_features(mm.make_media(spark, 3), decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decoding" in str(exc.value)


def test_resize_and_frame_sample_plans(spark):
    media = mm.make_media(spark, 30)
    for r in mm.resize_plan(media, max_side=64).collect():
        assert max(r["target_w"], r["target_h"]) <= 65
    fs = mm.frame_sample_plan(media, every_n=4).collect()
    assert all(r["frame_index"] % 4 == 0 for r in fs)


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {
        "in": str(tmp_path / "incoming"),
        "idx": str(tmp_path / "index"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def _write_pages(spark, path, start, n):
    from searchengine_spark.corpus import make_pages

    pages = make_pages(spark, n, seed=start)  # distinct seeds -> distinct text
    df = pages.withColumn("doc_id", F.monotonically_increasing_id() + start)
    df.select("doc_id", "url", "warc_ts", "html", "text", "lang").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    """Structured Streaming watermarked windows == batch aggregation."""
    from searchengine_spark.pipeline import events as ev

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    src.coalesce(1).write.parquet(in_dir)

    q = ev.streaming_windowed_counts(spark, in_dir, ckpt, out, watermark="0 seconds")
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in ev.windowed_event_counts(src).collect()
    }
    # append mode emits only windows the watermark closed; with
    # availableNow + 0s watermark that is all but the final window(s)
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_streaming_ingest_and_resume(spark, stream_dirs):
    _write_pages(spark, stream_dirs["in"], 0, 40)
    q = ingest.start_ingest(spark, stream_dirs["in"], stream_dirs["idx"], stream_dirs["ckpt"])
    q.awaitTermination(120)
    live1 = ingest.read_live_postings(spark, stream_dirs["idx"])
    n1 = live1.count()
    docs1 = live1.select("doc_id").distinct().count()
    assert n1 > 0 and docs1 == 40

    # second drop of files -> only the new batch is processed (checkpoint)
    _write_pages(spark, stream_dirs["in"], 1000, 20)
    q2 = ingest.start_ingest(spark, stream_dirs["in"], stream_dirs["idx"], stream_dirs["ckpt"])
    q2.awaitTermination(120)
    live2 = ingest.read_live_postings(spark, stream_dirs["idx"])
    assert live2.select("doc_id").distinct().count() == 60

    # compaction folds deltas into the base and stays queryable
    ingest.compact(spark, stream_dirs["idx"])
    live3 = ingest.read_live_postings(spark, stream_dirs["idx"])
    assert live3.select("doc_id").distinct().count() == 60
    assert live3.where(F.col("term") == "barim").count() > 0


def test_compact_persisted_layout_rebuilds_side_tables(spark, stream_dirs, tmp_path):
    """Compacting a write_index layout must re-bucket the merged postings
    and refresh term_stats/doc_stats/meta.json so read_index serves the
    delta docs (previously it dropped the bucket column and left stale
    stats — AnalysisException + wrong df/ctf)."""
    from searchengine_spark.corpus import extract_fields, make_pages
    from searchengine_spark.index.build import assign_doc_ids, build_index, read_index, write_index

    base_docs = assign_doc_ids(extract_fields(make_pages(spark, 40, seed=9)), ext_id_col="url")
    idx0 = build_index(base_docs, fields={"body": "body"}, ext_id_col="url", analyzer="english")
    write_index(idx0, stream_dirs["idx"], buckets=4)
    old_n = idx0.n_docs
    old_sum = idx0.field_stats["body"]["sum_len"]

    _write_pages(spark, stream_dirs["in"], 5000, 25)
    q = ingest.start_ingest(spark, stream_dirs["in"], stream_dirs["idx"], stream_dirs["ckpt"])
    q.awaitTermination(120)

    ingest.compact(spark, stream_dirs["idx"])
    idx = read_index(spark, stream_dirs["idx"])
    # bucket column survives -> pruned term scans still work
    assert idx.n_buckets == 4 and "bucket" in idx.postings.columns
    assert idx.postings.select("doc_id").distinct().count() == 65
    # stats include delta docs
    assert idx.n_docs == 65
    assert idx.field_stats["body"]["sum_len"] > old_sum and old_n == 40
    # a pruned engine query over base+delta docs
    from searchengine_spark.engine import SearchEngine

    eng = SearchEngine(idx)
    rows = eng.search("barim batok", model="bm25", k=70).collect()
    assert rows and any(int(r["doc_id"]) >= 5000 for r in rows)
    # delta docs resolve real ext ids (delta_docs segment)
    assert all(r["ext_id"].startswith("http://") for r in rows)
