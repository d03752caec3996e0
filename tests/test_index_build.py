import os

from pyspark.sql import functions as F

from searchengine_spark.codec import decode_positions
from searchengine_spark.corpus import extract_fields, make_pages
from searchengine_spark.index import build_index, read_index, write_index
from searchengine_spark.index.build import assign_doc_ids


def _tiny_docs(spark):
    rows = [
        (0, "the cat sat on the mat", "cat story"),
        (1, "a cat and a dog", "animals"),
        (2, "dogs dogs dogs", "dog dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, title string")


def test_build_postings_simple(spark):
    idx = build_index(_tiny_docs(spark), {"body": "text"}, analyzer="simple")
    rows = {(r.term, r.doc_id): r for r in idx.postings.collect()}
    assert rows[("cat", 0)].tf == 1
    assert rows[("the", 0)].tf == 2
    assert decode_positions(rows[("the", 0)].positions).tolist() == [0, 4]
    assert rows[("dogs", 2)].tf == 3
    assert rows[("cat", 0)].doc_len == 6
    ts = {(r.term): (r.df, r.ctf) for r in idx.term_stats.collect()}
    assert ts["cat"] == (2, 2)
    assert ts["dogs"] == (1, 3)
    assert idx.n_docs == 3
    assert idx.field_stats["body"]["sum_len"] == 6 + 5 + 3


def test_build_english_stopwords_keep_positions(spark):
    idx = build_index(_tiny_docs(spark), {"body": "text"}, analyzer="english")
    rows = {(r.term, r.doc_id): r for r in idx.postings.collect()}
    # 'the' is a stopword → no posting; 'cat' at position 1 (slot preserved)
    assert ("the", 0) not in rows
    assert decode_positions(rows[("cat", 0)].positions).tolist() == [1]
    # doc_len counts stopword slots (Idx.java:97 semantics)
    assert rows[("cat", 0)].doc_len == 6
    # stemming: dogs → dog merges docs 1,2
    assert rows[("dog", 2)].tf == 3


def test_multifield_build(spark):
    idx = build_index(_tiny_docs(spark), {"body": "text", "title": "title"}, analyzer="simple")
    fields = {r.field for r in idx.postings.select("field").distinct().collect()}
    assert fields == {"body", "title"}
    ts = {(r.term, r.field): r.df for r in idx.term_stats.collect()}
    assert ts[("cat", "title")] == 1
    assert idx.field_stats["title"]["doc_count"] == 3


def test_write_read_resume(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx = build_index(_tiny_docs(spark), {"body": "text"}, analyzer="simple")
    res1 = write_index(idx, path, buckets=4)
    assert sorted(res1["written"]) == [0, 1, 2, 3]
    # resume: everything skipped
    res2 = write_index(idx, path, buckets=4)
    assert res2["written"] == []
    assert sorted(res2["skipped"]) == [0, 1, 2, 3]
    # manifest entries exist and carry lineage
    assert len(os.listdir(os.path.join(path, "_manifest"))) == 4
    idx2 = read_index(spark, path)
    assert idx2.n_docs == 3
    assert idx2.postings.count() == idx.postings.count()
    got = idx2.postings.where("term='cat' and doc_id=0").collect()[0]
    assert decode_positions(got.positions).tolist() == [1]


def test_corpus_deterministic_and_invariant(spark):
    a = make_pages(spark, 120, seed=42, partitions=3).orderBy("url").collect()
    b = make_pages(spark, 120, seed=42, partitions=7).orderBy("url").collect()
    # byte-identical text per url across partitionings (per-row invariant)
    assert [(r.url, r.text) for r in a] == [(r.url, r.text) for r in b]
    assert all(r.html.decode("utf-8").count("<title>") == 1 for r in a[:5])
    # near-duplicate marker present ~1%
    dups = [r for r in a if r.text.endswith("nearduplicate")]
    assert len(dups) == 1


def test_extract_fields_and_doc_ids(spark):
    pages = make_pages(spark, 50, seed=42)
    fields = extract_fields(pages)
    docs = assign_doc_ids(fields, "url")
    row = docs.where(F.col("doc_id") == 0).collect()[0]
    assert row.title != "" and row.keywords != ""
    assert row.url_text.startswith("http site")
    n_ids = docs.select("doc_id").distinct().count()
    assert n_ids == 50
    idx = build_index(
        docs, {"body": "body", "title": "title", "keywords": "keywords",
               "url": "url_text", "inlink": "inlink"},
        ext_id_col="url", analyzer="english",
    )
    assert set(idx.field_stats) == {"body", "title", "keywords", "url", "inlink"}
    assert idx.postings.where("field='url'").count() > 0


def test_read_index_rejects_stale_analyzer_version(spark, tmp_path):
    """meta.json records an analyzer rule-table hash; read_index must
    fail loudly when the code's rules drifted since the index was
    written (silent index/query tokenize mismatch otherwise)."""
    import json

    import pytest

    docs = _tiny_docs(spark)
    idx = build_index(docs, fields={"body": "text"}, analyzer="english")
    path = str(tmp_path / "veridx")
    write_index(idx, path, buckets=2)

    # round-trips fine with matching rules
    assert read_index(spark, path).n_docs == idx.n_docs

    meta_path = path + "/meta.json"
    with open(meta_path) as fh:
        meta = json.load(fh)
    assert meta["analyzer_version"]
    meta["analyzer_version"] = "deadbeefdeadbeef"
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="analyzer"):
        read_index(spark, path)

    # legacy manifests without the key still load (pre-r4 indexes)
    del meta["analyzer_version"]
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    assert read_index(spark, path).n_docs == idx.n_docs


def test_xxh64_matches_spark(spark):
    """The driver-side XXH64 (functions/xxh64.py) must be bit-equal to
    Spark's F.xxhash64 on UTF-8 strings — every bucket-pruning literal
    in the compiler/engine/WAND paths depends on it. A divergence would
    silently prune the WRONG bucket dir (missing postings, no error)."""
    from pyspark.sql import functions as F

    from searchengine_spark.functions.xxh64 import term_bucket, xxh64

    samples = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "the", "retrieval", "0123456789abcdef",
        "0123456789abcdef0",  # 17: word tail + 4-byte + byte tail
        "0123456789abcdef0123456789abcdef",  # exactly 32 (stripe)
        "0123456789abcdef0123456789abcdefX",  # 33
        "x" * 31, "x" * 63, "x" * 64, "x" * 100,
        "naïve", "東京スカイツリー", "emoji 🎉 tail", "Ω" * 40,
    ]
    rows = (
        spark.createDataFrame([(s,) for s in samples], "s string")
        .select("s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(32)).alias("b"))
        .collect()
    )
    for r in rows:
        got = xxh64(r["s"].encode("utf-8"))
        signed = got - (1 << 64) if got >= 1 << 63 else got
        assert signed == r["h"], f"xxh64 mismatch on {r['s']!r}"
        assert term_bucket(r["s"], 32) == r["b"], f"bucket mismatch on {r['s']!r}"
