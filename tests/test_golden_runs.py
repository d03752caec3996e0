"""Byte-identical golden run files (SURVEY.md §5: end-to-end
.qry -> .teIn byte-comparisons).

The fixtures under tests/fixtures/ were produced by this exact
pipeline; any change to analysis, scoring, tie-breaks, %.18f
formatting, or the dummy-row convention shows up as a byte diff.
"""

import pytest

from searchengine_spark.corpus import extract_fields, make_pages
from searchengine_spark.engine import SearchEngine
from searchengine_spark.index.build import assign_doc_ids, build_index
from searchengine_spark.sources.trec import write_run_file

BASE = [
    ("g1", "cerim dirim"),
    ("g2", "#near/2(barim batok)"),
    ("g4", "#wsum(0.3 cerim.title 0.7 cerim)"),
    ("g5", "of the"),  # degenerate -> dummy row
]
WAND = ("g3", "#wand(0.6 cerim 0.4 #syn(barim batok))")

CASES = [
    ("bm25", {}, BASE, "golden_bm25.teIn"),
    ("indri", {"mu": 1500.0, "lam": 0.3}, BASE + [WAND], "golden_indri.teIn"),
    ("rankedboolean", {}, BASE + [WAND], "golden_rankedbool.teIn"),
]


@pytest.fixture(scope="module")
def golden_engine(spark):
    docs = assign_doc_ids(
        extract_fields(make_pages(spark, 250, seed=21)), ext_id_col="url"
    )
    idx = build_index(
        docs,
        fields={"body": "body", "title": "title", "keywords": "keywords",
                "url": "url_text", "inlink": "inlink"},
        ext_id_col="url",
        analyzer="english",
    )
    return SearchEngine(idx)


@pytest.mark.parametrize("model,params,qs,fname", CASES, ids=[c[3] for c in CASES])
def test_run_file_byte_identical(golden_engine, tmp_path, model, params, qs, fname):
    rows = golden_engine.run_batch(qs, model=model, k=10, **params).collect()
    out = tmp_path / fname
    write_run_file(
        [(r["qid"], r["ext_id"], r["rank"], r["score"]) for r in rows],
        str(out),
        all_qids=[q for q, _ in qs],
    )
    import os

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", fname)
    assert out.read_bytes() == open(fixture, "rb").read()
