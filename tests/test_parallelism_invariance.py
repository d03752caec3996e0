"""Same-result check across parallelism levels (SURVEY.md §5e):
byte-identical run files from local[2] and local[5] sessions."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from searchengine_spark.session import get_spark
from searchengine_spark.corpus import make_pages, extract_fields
from searchengine_spark.index.build import assign_doc_ids, build_index
from searchengine_spark.engine import SearchEngine
from searchengine_spark.sources.trec import write_run_file

spark = get_spark("par-{cores}", cores={cores}, shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
docs = assign_doc_ids(extract_fields(make_pages(spark, 150, seed=33)), ext_id_col="url")
idx = build_index(docs, fields={{"body": "body"}}, ext_id_col="url", analyzer="english")
eng = SearchEngine(idx)
qs = [("p1", "cerim dirim"), ("p2", "#near/2(barim batok)"), ("p3", "#wand(0.7 cerim 0.3 batok)")]
rows = eng.run_batch(qs, model="indri", k=10, mu=1500.0, lam=0.3).collect()
# 6-term BM25 exercises the union+agg physical path (threshold 4), which
# must stay %.18f-reproducible across parallelism (term-order fold)
qb = [("p4", "barim batok balan cerim cetok dirim")]
rows += eng.run_batch(qb, model="bm25", k=10).collect()
write_run_file([(r["qid"], r["ext_id"], r["rank"], r["score"]) for r in rows],
               {out!r}, all_qids=[q for q, _ in qs + qb])
"""


def _run(cores: int, parts: int, out: str) -> None:
    code = SCRIPT.format(repo=REPO, cores=cores, parts=parts, out=out)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=420
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_run_files_identical_across_parallelism(tmp_path):
    a, b = str(tmp_path / "a.teIn"), str(tmp_path / "b.teIn")
    _run(2, 5, a)
    _run(5, 13, b)
    ta, tb = open(a, "rb").read(), open(b, "rb").read()
    assert ta and ta == tb
