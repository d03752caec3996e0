"""Scaling-efficiency evidence for the north rule (N vs 4N parallelism).

No real cluster exists in this sandbox, so the same job runs at two
``local[N]`` levels (fresh JVM each) on the same input:

  python scripts/scaling.py            # parent: runs child at 8 and 32
  python scripts/scaling.py --child 8  # one measured run

Measured job: full inverted-index build (tokenize -> postings ->
varbyte encode -> stats) over a deterministic synthetic page corpus,
plus a BM25 query batch. Reports docs/sec at each level and
efficiency = (thr_4N / thr_N) / 4; the north rule wants >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SCALING_PAGES", "60000"))


def child(cores: int) -> None:
    from searchengine_spark.corpus import extract_fields, make_pages
    from searchengine_spark.engine import SearchEngine
    from searchengine_spark.index.build import assign_doc_ids, build_index
    from searchengine_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    pages = make_pages(spark, N_PAGES, seed=42, partitions=4 * cores).persist()
    pages.count()  # generation excluded from the measured window

    t0 = time.time()
    docs = assign_doc_ids(extract_fields(pages), ext_id_col="url")
    idx = build_index(
        docs, fields={"body": "body", "title": "title"}, ext_id_col="url",
        analyzer="english", with_blocks=True,
    )
    n_post = idx.postings.count()
    build_sec = time.time() - t0

    eng = SearchEngine(idx)
    q0 = time.time()
    for q in ["cerim dirim", "#near/2(barim batok)", "#and(cerim bavex)"]:
        eng.search(q, model="bm25", k=10, with_ext_id=False).collect()
    query_sec = time.time() - q0

    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "n_pages": N_PAGES,
                "build_sec": round(build_sec, 3),
                "docs_per_sec": round(N_PAGES / build_sec, 1),
                "n_postings": int(n_post),
                "query_batch_sec": round(query_sec, 3),
            }
        )
    )


def parent() -> None:
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores)],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("CHILD_RESULT ")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"child {cores} failed")
        results[cores] = json.loads(line[-1][len("CHILD_RESULT "):])

    thr8 = results[8]["docs_per_sec"]
    thr32 = results[32]["docs_per_sec"]
    eff = (thr32 / thr8) / 4.0
    report = {
        "n_pages": N_PAGES,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(thr32 / thr8, 3),
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "SCALING.json"), "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        parent()
