"""End-to-end quickstart: build -> persist -> param file -> CLI -> trec run.

    python examples/quickstart.py [workdir]

Builds a persisted index over a deterministic 1,000-page synthetic web
corpus, writes a QryEval-style param file, runs the CLI batch entry
point (BM25 + a positional query + PRF expansion), and prints the head
of the resulting trec_eval run file. Everything lands under [workdir]
(default: a temp directory).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchengine_spark import cli
from searchengine_spark.corpus import extract_fields, make_pages
from searchengine_spark.index.build import assign_doc_ids, build_index, write_index
from searchengine_spark.session import get_spark


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sespark_")
    os.makedirs(work, exist_ok=True)
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"[1/4] building index over 1,000 synthetic pages -> {work}/index")
    docs = assign_doc_ids(extract_fields(make_pages(spark, 1000, seed=7)), ext_id_col="url")
    idx = build_index(
        docs, fields={"body": "body", "title": "title"}, ext_id_col="url",
        analyzer="english",
    )
    write_index(idx, os.path.join(work, "index"), buckets=8)

    print("[2/4] writing query + param files")
    qf = os.path.join(work, "queries.qry")
    with open(qf, "w") as fh:
        fh.write("1: cerim dirim\n2: #near/2(barim batok)\n3: #wsum(0.7 cerim 0.3 batok)\n")
    out = os.path.join(work, "run.teIn")
    param = os.path.join(work, "run.param")
    with open(param, "w") as fh:
        fh.write(
            f"indexPath={os.path.join(work, 'index')}\n"
            f"queryFilePath={qf}\n"
            f"trecEvalOutputPath={out}\n"
            "retrievalAlgorithm=bm25\nBM25:k_1=1.2\nBM25:b=0.75\nBM25:k_3=0\n"
            "fb=bm25\nfbDocs=10\nfbTerms=10\nfbMu=0\nfbOrigWeight=0.5\n"
            f"fbExpansionQueryFile={os.path.join(work, 'expansion.qry')}\n"
            "trecEvalOutputLength=20\n"
        )

    print(f"[3/4] running the CLI: python -m searchengine_spark.cli {param}")
    cli.run(param, spark=spark)

    print(f"[4/4] run file head ({out}):")
    with open(out) as fh:
        for line in fh.readlines()[:8]:
            print("   ", line.rstrip())
    print(f"expansion queries: {os.path.join(work, 'expansion.qry')}")


if __name__ == "__main__":
    main()
