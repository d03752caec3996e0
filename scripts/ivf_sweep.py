"""IVF recall/latency frontier at scale (VERDICT r4 item 8).

    IVF_SWEEP_PAGES=4000000 python scripts/ivf_sweep.py   # -> IVF_SWEEP.json

Sweeps (n_cells, lloyd_iters) index builds x n_probe query depths on
the isotropic embedding corpus (the worst case for any space
partitioner — clustered corpora sit near recall 1.0 already, see
SCALEBENCH) and records build wall, per-query wall (best-of-2, 10
anchors), and recall@10 vs brute force, so the 4M operating point is a
measured choice instead of the single (2000 cells, 32 probes) row the
round-4 verdict flagged.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("IVF_SWEEP_PAGES", "4000000"))
CPUS = int(os.environ.get("IVF_SWEEP_CPUS", "32"))
DIM = int(os.environ.get("IVF_SWEEP_DIM", "64"))
OUT = os.environ.get("IVF_SWEEP_OUT", os.path.join(REPO, "IVF_SWEEP.json"))

CELLS = [int(x) for x in os.environ.get("IVF_SWEEP_CELLS", "1000,2000,4000").split(",")]
LLOYD = [int(x) for x in os.environ.get("IVF_SWEEP_LLOYD", "0,2").split(",")]
PROBES = [int(x) for x in os.environ.get("IVF_SWEEP_PROBES", "8,16,32,64").split(",")]


def main() -> None:
    from searchengine_spark.corpus import make_embeddings
    from searchengine_spark.pipeline import similarity
    from searchengine_spark.session import get_spark

    spark = get_spark("ivf-sweep", cores=CPUS, shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"n_vectors": N_PAGES, "dim": DIM, "cpus": CPUS, "rows": []}
    emb = make_embeddings(spark, N_PAGES, dim=DIM, partitions=4 * CPUS).persist()
    emb.count()
    qids = [i * 100 for i in range(10)]  # 10 anchors -> 100 truth pairs

    brute_fn = lambda: similarity.cosine_topk(emb, qids, k=10).collect()  # noqa: E731
    brute_rows = brute_fn()
    report["brute_sec"] = round(
        min((lambda t=time.time(): (brute_fn(), time.time() - t)[1])() for _ in range(2)),
        3,
    )
    truth = {(r["query_id"], r["vec_id"]) for r in brute_rows}

    for n_cells in CELLS:
        for lloyd in LLOYD:
            t0 = time.time()
            ivf_idx = similarity.ivf_assign(
                emb, n_cells=n_cells, cell_udf=True, lloyd_iters=lloyd
            )
            ivf_idx[0].persist().count()
            build_sec = round(time.time() - t0, 3)
            for n_probe in PROBES:
                fn = lambda: similarity.ivf_topk(  # noqa: E731
                    emb, qids, k=10, n_probe=n_probe, cell_udf=True,
                    prebuilt=ivf_idx,
                ).collect()
                rows = fn()
                qsec = round(
                    min(
                        (lambda t=time.time(): (fn(), time.time() - t)[1])()
                        for _ in range(2)
                    ),
                    3,
                )
                got = {(r["query_id"], r["vec_id"]) for r in rows}
                row = {
                    "n_cells": n_cells,
                    "lloyd_iters": lloyd,
                    "n_probe": n_probe,
                    "build_sec": build_sec,
                    "query_sec": qsec,
                    "recall_at10": round(len(truth & got) / max(1, len(truth)), 3),
                    "scan_fraction": round(n_probe / n_cells, 4),
                }
                report["rows"].append(row)
                print(json.dumps(row))
            ivf_idx[0].unpersist()

    emb.unpersist()
    # sqrt(n) reference point the docs recommend
    report["sqrt_n_cells"] = int(round(math.sqrt(N_PAGES)))
    print(json.dumps(report, indent=2))
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
